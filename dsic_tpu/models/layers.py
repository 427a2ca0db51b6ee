"""Model transforms as Flax modules, NHWC, TPU-native.

Architecture matches the reference exactly in kernel sizes / strides / channel
counts / GDN placement (/root/reference/code/modelv2/layers.py):

* AnalysisTransform g_a (layers.py:46-76): conv3 s1 -> [conv5 s2 -> conv3 s1] x3
  -> conv5 s2, GDN after every conv except the last; 3 -> N -> ... -> M,
  total stride 16.
* SynthesisTransform g_s (layers.py:78-101): 4x convT5 s2 interleaved with
  conv3 s1, IGDN after each except the final convT; M -> N -> ... -> 3.
* HyperAnalysis h_a (layers.py:104-116): conv3 s1 ReLU x2 -> conv5 s2 ReLU ->
  conv5 s2; M -> N, stride 4.
* HyperSynthesis h_s (layers.py:118-152): convT5 s2 ReLU x2 trunk, then either
  spatial conv3 heads (spatial_params=True) or global-average-pool + two 1x1
  MLPs expanded spatially (default).

Convs use explicit symmetric padding (k-1)//2 (torch Conv2d semantics);
transposed convs use lax.conv_transpose padding ((2,3),(2,3)) which reproduces
torch ConvTranspose2d(5, stride=2, padding=2, output_padding=1) output shapes
(H -> 2H).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsic_tpu.ops.gdn import REPARAM_OFFSET, gdn as gdn_op


class GDN(nn.Module):
    """Generalized Divisive Normalization layer (layers.py:6-27 semantics).

    Stores raw reparameterized (C,) vectors: beta_param init sqrt(1 + offset),
    gamma_param init sqrt(gamma_init + offset); effective values are
    param**2 - offset, computed inside the fused op.
    """

    inverse: bool = False
    gamma_init: float = 0.1
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        off = REPARAM_OFFSET
        beta_param = self.param(
            "beta", lambda _k: jnp.full((c,), jnp.sqrt(1.0 + off), jnp.float32))
        gamma_param = self.param(
            "gamma", lambda _k: jnp.full((c,), jnp.sqrt(self.gamma_init + off),
                                         jnp.float32))
        return gdn_op(x, beta_param.astype(x.dtype),
                      gamma_param.astype(x.dtype),
                      inverse=self.inverse, use_pallas=self.use_pallas)


def conv(features: int, k: int, stride: int = 1, dtype=None, name=None):
    p = (k - 1) // 2
    return nn.Conv(features, (k, k), strides=(stride, stride),
                   padding=((p, p), (p, p)), dtype=dtype, name=name)


def conv_t(features: int, dtype=None, name=None):
    """ConvTranspose2d(5, stride 2, padding 2, output_padding 1) equivalent."""
    return nn.ConvTranspose(features, (5, 5), strides=(2, 2),
                            padding=((2, 3), (2, 3)), dtype=dtype, name=name)


class AnalysisTransform(nn.Module):
    N: int = 128
    M: int = 192
    dtype: jnp.dtype | None = None
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gdn_kw = dict(use_pallas=self.use_pallas)
        specs: Sequence[tuple[int, int, int, bool]] = (
            # (features, kernel, stride, gdn_after)
            (self.N, 3, 1, True),
            (self.N, 5, 2, True),
            (self.N, 3, 1, True),
            (self.N, 5, 2, True),
            (self.N, 3, 1, True),
            (self.N, 5, 2, True),
            (self.N, 3, 1, True),
            (self.M, 5, 2, False),
        )
        for i, (f, k, s, use_gdn) in enumerate(specs):
            x = conv(f, k, s, dtype=self.dtype, name=f"conv_{i}")(x)
            if use_gdn:
                x = GDN(name=f"gdn_{i}", **gdn_kw)(x)
        return x


class SynthesisTransform(nn.Module):
    N: int = 128
    M: int = 192
    out_channels: int = 3
    dtype: jnp.dtype | None = None
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, y_hat: jax.Array) -> jax.Array:
        gdn_kw = dict(inverse=True, use_pallas=self.use_pallas)
        x = y_hat
        for i in range(3):
            x = conv_t(self.N, dtype=self.dtype, name=f"deconv_{i}")(x)
            x = GDN(name=f"igdn_{2 * i}", **gdn_kw)(x)
            x = conv(self.N, 3, 1, dtype=self.dtype, name=f"conv_{i}")(x)
            x = GDN(name=f"igdn_{2 * i + 1}", **gdn_kw)(x)
        x = conv_t(self.out_channels, dtype=self.dtype, name="deconv_3")(x)
        return x


class HyperAnalysis(nn.Module):
    N: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        x = nn.relu(conv(self.N, 3, 1, dtype=self.dtype, name="conv_0")(y))
        x = nn.relu(conv(self.N, 3, 1, dtype=self.dtype, name="conv_1")(x))
        x = nn.relu(conv(self.N, 5, 2, dtype=self.dtype, name="conv_2")(x))
        x = conv(self.N, 5, 2, dtype=self.dtype, name="conv_3")(x)
        return x


class HyperSynthesis(nn.Module):
    N: int = 128
    M: int = 192
    spatial_params: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jax.Array):
        t = nn.relu(conv_t(self.N, dtype=self.dtype, name="deconv_0")(z))
        t = nn.relu(conv_t(self.N, dtype=self.dtype, name="deconv_1")(t))
        if self.spatial_params:
            log_sigma = conv(self.M, 3, 1, dtype=self.dtype, name="to_sigma")(t)
            log_nu = conv(self.M, 3, 1, dtype=self.dtype, name="to_nu")(t)
        else:
            p = jnp.mean(t, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
            h_s = nn.relu(conv(self.N, 1, 1, dtype=self.dtype, name="mlp_sigma_0")(p))
            log_sigma = conv(self.M, 1, 1, dtype=self.dtype, name="mlp_sigma_1")(h_s)
            h_n = nn.relu(conv(self.N, 1, 1, dtype=self.dtype, name="mlp_nu_0")(p))
            log_nu = conv(self.M, 1, 1, dtype=self.dtype, name="mlp_nu_1")(h_n)
            hh, ww = t.shape[1], t.shape[2]
            log_sigma = jnp.broadcast_to(
                log_sigma, (log_sigma.shape[0], hh, ww, self.M))
            log_nu = jnp.broadcast_to(log_nu, (log_nu.shape[0], hh, ww, self.M))
        return log_sigma, log_nu
