"""Channel-conditional (CHARM) entropy model — a beyond-reference zoo family.

Minnen & Singh, "Channel-wise Autoregressive Entropy Models for Learned
Image Compression" (ICIP 2020, arXiv:2007.08739 — PAPERS.md): the latent
tensor splits into K channel slices; slice k's Gaussian (mean, scale) are
predicted from the hyper-decoder features plus the already-decoded slices
0..k-1, and a latent-residual-prediction (LRP) net reduces the rounding
error of each decoded slice. Unlike spatial autoregression (mbt2018's
context model, cheng2020's), the per-slice conditioning is a SEQUENCE OF K
DENSE CONVOLUTIONS over full spatial maps — exactly the shape of work the
MXU wants — instead of h*w serial steps, which is why this is the
channel-conditional design this TPU framework adopts for its
context-modeling family (round-1 VERDICT next-step #9).

Transforms are the mbt2018 conv stacks (models/zoo.py ZooAnalysis /
ZooSynthesis); the hyper decoder splits into mean and scale feature nets as
in the paper. K = M // 32 (the paper's 32-channel slices: M=320 -> 10).

Codec (codec/api.py ChannelCodec): K rANS streams per image; slice k's
tables build from the SAME jitted slice functions on both sides, fused so
decode costs K+1 device round trips per batch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsic_tpu.models.layers import conv
from dsic_tpu.models.zoo import ZooAnalysis, ZooSynthesis, ZooHyperAnalysis
from dsic_tpu.ops.entropy_bottleneck import (
    FactorizedDensity, gaussian_bin_neg_log2_prob)
from dsic_tpu.ops.quantize import quantize, ste_round


class HyperFeatureNet(nn.Module):
    """One hyper-decoder branch: z_hat -> (B, h_y, w_y, M) feature map
    (the paper keeps separate mean / scale branches)."""
    N: int
    M: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        d = self.dtype
        t = nn.leaky_relu(nn.ConvTranspose(
            self.N, (5, 5), strides=(2, 2), padding=((2, 3), (2, 3)),
            dtype=d, name="deconv_0")(z_hat))
        t = nn.leaky_relu(nn.ConvTranspose(
            self.N * 3 // 2, (5, 5), strides=(2, 2), padding=((2, 3), (2, 3)),
            dtype=d, name="deconv_1")(t))
        return conv(self.M, 3, 1, dtype=d, name="conv_out")(t)


class SliceNet(nn.Module):
    """Per-slice conditioning net: concat features -> slice_size channels
    (the paper's 3-conv channel-context transform)."""
    out_channels: int
    hidden: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t):
        d = self.dtype
        t = nn.leaky_relu(conv(self.hidden, 3, 1, dtype=d, name="conv_0")(t))
        t = nn.leaky_relu(conv(self.hidden * 2 // 3, 3, 1, dtype=d,
                               name="conv_1")(t))
        return conv(self.out_channels, 3, 1, dtype=d, name="conv_2")(t)


class ChannelARHyperprior(nn.Module):
    """mbt2018 transforms + channel-conditional entropy model + LRP."""

    pad_multiple = 64  # hyper branches upsample z by 4: y must be 4-divisible

    N: int = 128
    M: int = 192
    slice_size: int = 32
    out_channels: int = 3
    dtype: jnp.dtype | None = None

    @property
    def num_slices(self) -> int:
        return self.M // self.slice_size

    def setup(self):
        if self.M % self.slice_size:
            raise ValueError(f"M={self.M} not divisible by "
                             f"slice_size={self.slice_size}")
        self.g_a = ZooAnalysis(self.N, self.M, dtype=self.dtype)
        self.g_s = ZooSynthesis(self.N, self.out_channels, dtype=self.dtype)
        self.h_a = ZooHyperAnalysis(self.N, act="leaky_relu",
                                    dtype=self.dtype)
        self.h_mean = HyperFeatureNet(self.N, self.M, dtype=self.dtype)
        self.h_scale = HyperFeatureNet(self.N, self.M, dtype=self.dtype)
        self.z_prior = FactorizedDensity(self.N)
        k, s = self.num_slices, self.slice_size
        self.cc_mean = [SliceNet(s, self.M, dtype=self.dtype,
                                 name=f"cc_mean_{i}") for i in range(k)]
        self.cc_scale = [SliceNet(s, self.M, dtype=self.dtype,
                                  name=f"cc_scale_{i}") for i in range(k)]
        self.lrp = [SliceNet(s, self.M, dtype=self.dtype,
                             name=f"lrp_{i}") for i in range(k)]

    # --- per-slice pieces -----------------------------------------------------

    def _features(self, z_hat: jax.Array):
        z_hat = z_hat.astype(jnp.float32)
        return self.h_mean(z_hat), self.h_scale(z_hat)

    def _slice_params(self, mf, sf, y_hat_prefix, k: int):
        ctx = jnp.concatenate([mf] + ([y_hat_prefix]
                                      if y_hat_prefix.shape[-1] else []),
                              axis=-1)
        ctx_s = jnp.concatenate([sf] + ([y_hat_prefix]
                                        if y_hat_prefix.shape[-1] else []),
                                axis=-1)
        mu = self.cc_mean[k](ctx).astype(jnp.float32)
        sigma = self.cc_scale[k](ctx_s).astype(jnp.float32)
        return sigma, mu

    def _lrp(self, mf, y_hat_prefix, y_k_hat, k: int):
        t = jnp.concatenate([mf, y_hat_prefix, y_k_hat], axis=-1) \
            if y_hat_prefix.shape[-1] else \
            jnp.concatenate([mf, y_k_hat], axis=-1)
        return 0.5 * jnp.tanh(self.lrp[k](t).astype(jnp.float32))

    # --- codec protocol (K-pass; codec/api.py ChannelCodec) --------------------

    def z_cdf(self, t: jax.Array) -> jax.Array:
        return self.z_prior.cdf(t)

    def slice_pmf_params(self, z_hat: jax.Array, y_hat_prefix: jax.Array):
        """(sigma, mu) of slice k = prefix_width / slice_size. The codec
        calls this through the same jit on both sides (bitwise tables)."""
        k = y_hat_prefix.shape[-1] // self.slice_size
        mf, sf = self._features(z_hat)
        return self._slice_params(mf, sf, y_hat_prefix, k)

    def slice_dequant(self, z_hat: jax.Array, y_hat_prefix: jax.Array,
                      y_sym_k: jax.Array) -> jax.Array:
        """Decoded slice-k residual symbols -> extended y_hat prefix
        (adds mean-recentering + LRP)."""
        k = y_hat_prefix.shape[-1] // self.slice_size
        mf, sf = self._features(z_hat)
        _, mu = self._slice_params(mf, sf, y_hat_prefix, k)
        y_k_hat = y_sym_k.astype(jnp.float32) + mu
        y_k_hat = y_k_hat + self._lrp(mf, y_hat_prefix, y_k_hat, k)
        return jnp.concatenate([y_hat_prefix, y_k_hat], axis=-1) \
            if y_hat_prefix.shape[-1] else y_k_hat

    def encode_latents_i16(self, x: jax.Array):
        """Full residual symbol tensor: slice k's symbols are
        round(y_k - mu_k) with mu_k from the SAME decoded-prefix recursion
        the decoder runs."""
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        y = self.g_a(x).astype(jnp.float32)
        z = self.h_a(y)
        z_q = jnp.round(z)
        mf, sf = self._features(z_q)
        s = self.slice_size
        prefix = jnp.zeros(y.shape[:3] + (0,), jnp.float32)
        syms = []
        for k in range(self.num_slices):
            y_k = y[..., k * s:(k + 1) * s]
            _, mu = self._slice_params(mf, sf, prefix, k)
            s_k = jnp.round(y_k - mu)
            syms.append(s_k)
            y_k_hat = s_k + mu
            y_k_hat = y_k_hat + self._lrp(mf, prefix, y_k_hat, k)
            prefix = jnp.concatenate([prefix, y_k_hat], axis=-1) \
                if prefix.shape[-1] else y_k_hat
        lim = 30000.0
        sym = jnp.clip(jnp.concatenate(syms, axis=-1), -lim, lim)
        return sym.astype(jnp.int16), jnp.clip(z_q, -lim, lim).astype(jnp.int16)

    def decode_y(self, y_sym: jax.Array, z_hat: jax.Array) -> jax.Array:
        """Full symbol tensor -> y_hat (the synthesis input): the same
        K-slice recursion in one call."""
        z_hat = z_hat.astype(jnp.float32)
        s = self.slice_size
        prefix = jnp.zeros(y_sym.shape[:3] + (0,), jnp.float32)
        for k in range(self.num_slices):
            prefix = self.slice_dequant(z_hat, prefix,
                                        y_sym[..., k * s:(k + 1) * s])
        return prefix

    def synthesize(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)

    # --- training forward -------------------------------------------------------

    def __call__(self, x: jax.Array, quant_mode: str = "noise",
                 train: bool = True) -> dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(y.astype(jnp.float32))
        if quant_mode == "noise":
            key_y, key_z = jax.random.split(self.make_rng("noise"))
            z_tilde = quantize(z, "noise", key_z)
        else:
            key_y = None
            z_tilde = quantize(z, quant_mode)
        nll_z = self.z_prior(z_tilde.astype(jnp.float32))

        mf, sf = self._features(z_tilde)
        s = self.slice_size
        yf = y.astype(jnp.float32)
        prefix = jnp.zeros(y.shape[:3] + (0,), jnp.float32)
        nlls, sigmas, mus = [], [], []
        for k in range(self.num_slices):
            y_k = yf[..., k * s:(k + 1) * s]
            sigma_k, mu_k = self._slice_params(mf, sf, prefix, k)
            if quant_mode == "noise":
                key_y, kk = jax.random.split(key_y)
                y_k_tilde = quantize(y_k, "noise", kk)
            else:
                y_k_tilde = quantize(y_k, quant_mode)
            nlls.append(gaussian_bin_neg_log2_prob(y_k_tilde, sigma_k,
                                                   mean=mu_k))
            # decoder-path slice (context for later slices + synthesis):
            # STE-rounded residual + mean + LRP, as decoded (paper section 4)
            y_k_hat = ste_round(y_k - mu_k) + mu_k
            y_k_hat = y_k_hat + self._lrp(mf, prefix, y_k_hat, k)
            prefix = jnp.concatenate([prefix, y_k_hat], axis=-1) \
                if prefix.shape[-1] else y_k_hat
            sigmas.append(sigma_k)
            mus.append(mu_k)

        x_hat = self.g_s(prefix.astype(y.dtype))
        return {"x_hat": x_hat,
                "nll_y": jnp.concatenate(nlls, axis=-1), "nll_z": nll_z,
                "y": y, "y_tilde": prefix, "z": z, "z_tilde": z_tilde,
                "sigma": jnp.concatenate(sigmas, axis=-1),
                "mu": jnp.concatenate(mus, axis=-1)}
