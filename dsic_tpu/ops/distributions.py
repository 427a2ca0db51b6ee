"""Prior distributions: Student-t (conditional latent prior) and factorized
zero-mean Gaussian (hyperlatent prior). Pure jitted functions returning bits.

Reference semantics: /root/reference/code/modelv2/distributions.py:11-46
(clamps sigma to [1e-3, 1e3] and nu to [2, 100], natural-log pdf scaled by
1/ln 2). CDFs (for entropy-coding tables) live here too: the Student-t CDF is
built from the regularized incomplete beta function
(torch exposes StudentT.cdf; JAX needs it explicit — SURVEY.md section 7).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc

LOG2E = 1.0 / math.log(2.0)

SIGMA_MIN, SIGMA_MAX = 1e-3, 1e3
NU_MIN, NU_MAX = 2.0, 100.0


def student_t_neg_log2_prob(x: jax.Array, sigma: jax.Array, nu: jax.Array,
                            sigma_min: float = SIGMA_MIN, sigma_max: float = SIGMA_MAX,
                            nu_min: float = NU_MIN, nu_max: float = NU_MAX) -> jax.Array:
    """-log2 p(x) of a zero-mean Student-t with scale sigma, dof nu
    (distributions.py:20-31). Broadcasts sigma/nu against x."""
    sigma = jnp.clip(sigma, sigma_min, sigma_max)
    nu = jnp.clip(nu, nu_min, nu_max)
    log_c = (jax.lax.lgamma((nu + 1.0) / 2.0) - jax.lax.lgamma(nu / 2.0)
             - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(sigma))
    quad = jnp.square(x / sigma)
    logp = log_c - ((nu + 1.0) / 2.0) * jnp.log1p(quad / nu)
    return -logp * LOG2E


LIKELIHOOD_FLOOR = 1e-9  # matches ops/entropy_bottleneck.py


def student_t_bin_neg_log2_prob(x: jax.Array, sigma: jax.Array,
                                nu: jax.Array,
                                sigma_min: float = SIGMA_MIN,
                                sigma_max: float = SIGMA_MAX,
                                nu_min: float = NU_MIN,
                                nu_max: float = NU_MAX) -> jax.Array:
    """-log2 of the UNIT-BIN probability F(x+1/2) - F(x-1/2) of a zero-mean
    Student-t — the discrete probability the rANS coder actually charges
    (codec tables are built from the same CDF), for use when latents are
    discretely quantized (round / STE modes).

    The reference evaluates the continuous density at the rounded point
    even in round mode (model.py:57-59). That estimate goes NEGATIVE when
    sigma collapses (density > 1), which (a) lets pure-STE training park in
    a degenerate sigma->0 regime where the R>=0 clamp zeroes the rate
    gradient and the estimated rate is free, and (b) reports impossible
    negative bpp in eval (observed live: -0.38 bpp at lambda=10). The bin
    integral is >= 0 bits by construction and equals what the entropy coder
    pays, so est-vs-real bpp agreement is structural.

    Numerics: folded survival-function form — for v=|x|, p = S(v-1/2) -
    S(v+1/2) when v >= 1/2 (no 1-F cancellation in the tail) and
    p = 1 - S(1/2-v) - S(1/2+v) for the center bin. nu is stop-gradiented
    inside betainc's a-parameter (JAX defines no derivative there); nu
    still receives gradients through the beta argument, and full nu
    gradients flow in the noise/mix stages via the density path."""
    sigma = jnp.clip(sigma, sigma_min, sigma_max)
    nu = jnp.clip(nu, nu_min, nu_max)
    a = jax.lax.stop_gradient(nu) / 2.0

    def sf(t):  # survival function at t >= 0
        s = t / sigma
        return 0.5 * betainc(a, 0.5, nu / (nu + jnp.square(s)))

    v = jnp.abs(x)
    is_tail = v >= 0.5
    # Double-where: betainc's x-derivative is singular at t=0 (xb=1), and
    # jnp.where back-propagates NaN from the UNTAKEN branch. For integer
    # symbols the taken branch's sf arguments are always >= 0.5; feed the
    # untaken branch a safe placeholder instead of its near-zero argument.
    lo_tail = jnp.where(is_tail, v - 0.5, 1.0)
    lo_center = jnp.where(is_tail, 1.0, 0.5 - v)
    upper = sf(v + 0.5)
    tail = sf(lo_tail) - upper
    center = 1.0 - sf(lo_center) - upper
    p = jnp.where(is_tail, tail, center)
    return -jnp.log(jnp.maximum(p, LIKELIHOOD_FLOOR)) * LOG2E


def gaussian_bin_neg_log2_prob_z(x: jax.Array, log_sigma: jax.Array,
                                 sigma_min: float = SIGMA_MIN,
                                 sigma_max: float = SIGMA_MAX) -> jax.Array:
    """-log2 unit-bin probability of the factorized zero-mean Gaussian
    z-prior (same clamp semantics as :func:`gaussian_neg_log2_prob`),
    evaluated via erfc on the folded |x| for tail stability. Discrete
    counterpart of the density estimate, for round-mode rate."""
    sigma = jnp.clip(jnp.exp(log_sigma), sigma_min, sigma_max)
    inv = 1.0 / (sigma * jnp.sqrt(jnp.asarray(2.0, jnp.float32)))
    v = jnp.abs(x)
    upper = 0.5 * jax.lax.erfc((v - 0.5) * inv)
    lower = 0.5 * jax.lax.erfc((v + 0.5) * inv)
    p = upper - lower
    return -jnp.log(jnp.maximum(p, LIKELIHOOD_FLOOR)) * LOG2E


def gaussian_neg_log2_prob(x: jax.Array, log_sigma: jax.Array,
                           sigma_min: float = SIGMA_MIN,
                           sigma_max: float = SIGMA_MAX) -> jax.Array:
    """-log2 p(x) of a zero-mean Gaussian with learnable per-channel log_sigma
    (distributions.py:39-46). ``log_sigma`` is (C,) and x is (..., C)."""
    sigma = jnp.clip(jnp.exp(log_sigma), sigma_min, sigma_max)
    var = jnp.square(sigma)
    logp = -0.5 * jnp.log(2.0 * jnp.pi * var) - 0.5 * jnp.square(x) / var
    return -logp * LOG2E


def std_gaussian_cdf(t: jax.Array) -> jax.Array:
    """Phi(t) = 0.5 (1 + erf(t / sqrt 2)) — matches the reference's z-coding CDF
    (eval_selfcontained_entropy.py:14-15)."""
    return 0.5 * (1.0 + jax.lax.erf(t / jnp.sqrt(jnp.asarray(2.0, t.dtype))))


def student_t_cdf(t: jax.Array, sigma: jax.Array, nu: jax.Array) -> jax.Array:
    """CDF of a zero-mean Student-t with scale sigma, dof nu.

    F(t) = 1 - I_{nu/(nu+s^2)}(nu/2, 1/2) / 2  for s = t/sigma >= 0,
           I_{nu/(nu+s^2)}(nu/2, 1/2) / 2      for s < 0,
    with I the regularized incomplete beta function.
    """
    s = t / sigma
    s2 = jnp.square(s)
    xb = nu / (nu + s2)
    ib = betainc(nu / 2.0, 0.5, xb)
    return jnp.where(s >= 0, 1.0 - 0.5 * ib, 0.5 * ib)
