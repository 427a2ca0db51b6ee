"""Fully-factorized learned entropy model (the Balle et al. 2018 "univariate
non-parametric density", scale-hyperprior paper appendix 6.1) — the z-prior of
the bmshj2018/mbt2018 baseline families (models/zoo.py).

The reference consumes this through the compressai pip binary
(writeupbdcurvesballeALL.py:385-435 runs bmshj2018_hyperprior forwards whose
z-rate comes from compressai's EntropyBottleneck); here it is a small flax
module evaluated as one batched einsum chain over all channels — fully
jit/MXU-friendly, no per-channel Python loops.

Model: per channel c, a monotone CDF c_c(x) = sigmoid(L_K(...L_1(x))) with
L_k(x) = x @ softplus(H_k) + b_k followed (k < K) by x + tanh(a_k) * tanh(x).
Monotonicity comes from the softplus/tanh reparameterizations, so
p(y) = c(y + 1/2) - c(y - 1/2) is a valid bin probability for the
noise-relaxed latent.

Unlike compressai there is no quantile/aux-loss machinery: entropy-coding
tables are built by evaluating the SAME jitted CDF on the per-image integer
support the codec already derives (codec/api.py), which keeps the
encoder/decoder bitwise-identical-tables invariant this framework uses
everywhere.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

LOG2E = 1.0 / math.log(2.0)
LIKELIHOOD_FLOOR = 1e-9  # compressai's LowerBound default


class FactorizedDensity(nn.Module):
    """Per-channel monotone CDF stack. Input/output logical shape: any
    (..., C); internally evaluated as (C, n, 1) batched matmuls."""

    features: int  # C
    filters: tuple = (3, 3, 3)
    init_scale: float = 10.0

    def setup(self):
        c = self.features
        dims = (1,) + tuple(self.filters) + (1,)
        k_layers = len(dims) - 1
        scale = self.init_scale ** (1.0 / k_layers)
        mats, biases, factors = [], [], []
        for k in range(k_layers):
            d_in, d_out = dims[k], dims[k + 1]
            init_h = math.log(math.expm1(1.0 / scale / d_out))
            mats.append(self.param(
                f"matrix_{k}",
                lambda _k, s=(c, d_in, d_out), v=init_h:
                jnp.full(s, v, jnp.float32)))
            biases.append(self.param(
                f"bias_{k}",
                lambda key, s=(c, 1, d_out):
                jax.random.uniform(key, s, jnp.float32, -0.5, 0.5)))
            if k < k_layers - 1:
                factors.append(self.param(
                    f"factor_{k}",
                    lambda _k, s=(c, 1, d_out): jnp.zeros(s, jnp.float32)))
        self.matrices, self.biases, self.factors = mats, biases, factors

    def logits(self, x: jax.Array) -> jax.Array:
        """Pre-sigmoid CDF logits. x: (..., C) -> (..., C)."""
        shape = x.shape
        # (C, n, 1): channel-major so each layer is one batched (C,n,i)@(C,i,o)
        t = jnp.moveaxis(x.reshape(-1, self.features), 0, 1)[..., None]
        for k, (h, b) in enumerate(zip(self.matrices, self.biases)):
            t = jnp.einsum("cni,cio->cno", t, jax.nn.softplus(h)) + b
            if k < len(self.factors):
                t = t + jnp.tanh(self.factors[k]) * jnp.tanh(t)
        return jnp.moveaxis(t[..., 0], 1, 0).reshape(shape)

    def cdf(self, x: jax.Array) -> jax.Array:
        """CDF values in [0, 1] — used by the codec to build integer tables
        on the decoder-identical jitted path."""
        return jax.nn.sigmoid(self.logits(x))

    def __call__(self, x: jax.Array) -> jax.Array:
        """-log2 p(x) of the unit bin around x (the noise-relaxed likelihood
        c(x+1/2) - c(x-1/2)), sign-folded for numerical stability in the
        tails (sigmoid differences near 0/1 cancel catastrophically)."""
        lower = self.logits(x - 0.5)
        upper = self.logits(x + 0.5)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        p = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return -jnp.log(jnp.maximum(p, LIKELIHOOD_FLOOR)) * LOG2E


@jax.custom_vjp
def _lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    # compressai's LowerBound gradient: where x is clamped, still pass the
    # cotangent if it pushes x TOWARD the valid region (g < 0 means the
    # descent step increases x). A hard max() would zero the gradient and
    # permanently freeze any scale initialized below the floor.
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return jnp.where(pass_through, g, 0.0), None


_lower_bound.defvjp(_lb_fwd, _lb_bwd)


def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    """max(x, bound) with compressai's toward-the-bound gradient."""
    return _lower_bound(x, jnp.asarray(bound, x.dtype))


def gmm_bin_neg_log2_prob(x: jax.Array, w_logits: jax.Array, mu: jax.Array,
                          sigma: jax.Array,
                          sigma_min: float = 0.11) -> jax.Array:
    """-log2 of the unit-bin probability of a K-component Gaussian mixture
    (cheng2020's entropy model; K=3 there). x: (..., M); w_logits/mu/sigma:
    (..., K, M). Per component the bin mass uses the same folded-erfc form
    as the single Gaussian (each component is symmetric around its mean)."""
    w = jax.nn.softmax(w_logits, axis=-2)
    sigma = lower_bound(sigma, sigma_min)
    v = jnp.abs(x[..., None, :] - mu)
    inv = 1.0 / (sigma * np.sqrt(2.0))
    p_k = (0.5 * jax.lax.erfc((v - 0.5) * inv)
           - 0.5 * jax.lax.erfc((v + 0.5) * inv))
    p = jnp.sum(w * p_k, axis=-2)
    return -jnp.log(jnp.maximum(p, LIKELIHOOD_FLOOR)) * LOG2E


def gaussian_bin_neg_log2_prob(x: jax.Array, sigma: jax.Array,
                               mean: jax.Array | None = None,
                               sigma_min: float = 0.11) -> jax.Array:
    """-log2 of the unit-bin probability of a Gaussian: the y-likelihood of
    the bmshj2018 Gaussian conditional, Phi((x-mu+.5)/sigma) -
    Phi((x-mu-.5)/sigma), evaluated via erfc on the folded |x| for tail
    stability. ``sigma_min`` = compressai's SCALES_MIN lower bound, applied
    with its LowerBound gradient so sub-floor scales can still learn."""
    if mean is not None:
        x = x - mean
    sigma = lower_bound(sigma, sigma_min)
    inv = 1.0 / (sigma * np.sqrt(2.0))
    v = jnp.abs(x)
    # p = Phi((0.5 - v)/s) - Phi((-0.5 - v)/s), Phi(t) = erfc(-t/sqrt2)/2
    upper = 0.5 * jax.lax.erfc((v - 0.5) * inv)
    lower = 0.5 * jax.lax.erfc((v + 0.5) * inv)
    p = upper - lower
    return -jnp.log(jnp.maximum(p, LIKELIHOOD_FLOOR)) * LOG2E
