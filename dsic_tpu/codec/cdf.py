"""CDF table construction: TPU-computed symbol probabilities -> integer CDF
rows for the rANS coder.

Mirrors the reference's table semantics (eval_selfcontained_entropy.py:14-23,
38-61): integrate the prior over integer bins [i-1/2, i+1/2] on a per-image
support [min - tail, max + tail], normalize, cumsum. Differences by design:

* tables are integer CDFs summing exactly to 2^16 with every symbol frequency
  >= 1 (guaranteed decodability — torchac does the equivalent renormalization
  internally),
* the support length is padded to a bucket multiple so the jitted PMF builders
  compile for a few static shapes only (XLA static-shape rule; SURVEY.md
  section 7 "hard parts"),
* one CDF row per channel (global-parameter mode) instead of per-element
  float CDFs — the coder indexes rows per symbol.
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.ops.distributions import student_t_cdf

PRECISION = 16
TOTAL = 1 << PRECISION
PMF_FLOOR = 1e-12


def quantize_pmf_to_cdf(pmf: np.ndarray, precision: int = PRECISION
                        ) -> np.ndarray:
    """(R, L) float pmf rows -> (R, L+1) uint32 CDF rows summing to 2^precision
    with min frequency 1. Deficit after flooring goes to the bins with the
    largest fractional remainders (largest-remainder apportionment)."""
    pmf = np.asarray(pmf, dtype=np.float64)
    if pmf.ndim == 1:
        pmf = pmf[None]
    r, L = pmf.shape
    total = 1 << precision
    if L >= total:
        raise ValueError(f"support too large for precision: {L} >= {total}")
    pmf = np.maximum(pmf, PMF_FLOOR)
    pmf = pmf / pmf.sum(axis=1, keepdims=True)
    scaled = pmf * (total - L)
    base = np.floor(scaled).astype(np.int64)
    rem = scaled - base
    freq = base + 1  # every bin >= 1
    deficit = total - freq.sum(axis=1)
    order = np.argsort(-rem, axis=1, kind="stable")
    rank = np.empty_like(order)
    np.put_along_axis(rank, order, np.broadcast_to(np.arange(L), (r, L)), axis=1)
    freq += rank < deficit[:, None]
    cdf = np.zeros((r, L + 1), dtype=np.uint32)
    cdf[:, 1:] = np.cumsum(freq, axis=1).astype(np.uint32)
    assert (cdf[:, -1] == total).all()
    return cdf


def pad_support(length: int, bucket: int = 64) -> int:
    return ((length + bucket - 1) // bucket) * bucket


def student_t_bin_probs(sigma: jax.Array, nu: jax.Array, lo: jax.Array,
                        L_pad: int) -> jax.Array:
    """Traceable core: (G, R) sigma & nu + (G,) lo -> (G, R, L_pad) Student-t
    bin probabilities (composable into fused jitted pipelines — e.g. the
    codec fuses hyper-decode -> pmf into one device call)."""
    support = (lo[:, None].astype(jnp.float32)
               + jnp.arange(L_pad, dtype=jnp.float32)[None, :])
    upper = support[:, None, :] + 0.5
    lower = support[:, None, :] - 0.5
    fu = student_t_cdf(upper, sigma[:, :, None], nu[:, :, None])
    fl = student_t_cdf(lower, sigma[:, :, None], nu[:, :, None])
    return jnp.clip(fu - fl, PMF_FLOOR, 1.0)


_student_t_pmf = jax.jit(student_t_bin_probs, static_argnums=(3,))


def gaussian_bin_probs(sigma: jax.Array, lo: jax.Array,
                       L_pad: int) -> jax.Array:
    """Traceable zero-mean Gaussian analogue of :func:`student_t_bin_probs`:
    (G, R) sigma + (G,) lo -> (G, R, L_pad) unit-bin probabilities. Used by
    the zoo codec's Gaussian-conditional y tables (fused with hyper-decode on
    device)."""
    from dsic_tpu.ops.distributions import std_gaussian_cdf
    support = (lo[:, None].astype(jnp.float32)
               + jnp.arange(L_pad, dtype=jnp.float32)[None, :])
    inv = 1.0 / sigma[:, :, None]
    fu = std_gaussian_cdf((support[:, None, :] + 0.5) * inv)
    fl = std_gaussian_cdf((support[:, None, :] - 0.5) * inv)
    return jnp.clip(fu - fl, PMF_FLOOR, 1.0)


def gmm_bin_probs(w_logits: jax.Array, mu: jax.Array, sigma: jax.Array,
                  lo: jax.Array, L_pad: int) -> jax.Array:
    """Traceable K-component Gaussian-mixture bin probabilities for the
    cheng2020 GMM head: (G, K, R) per-row component params + (G,) lo ->
    (G, R, L_pad). Symbols are round(y) coded directly (no mean-residual:
    a mixture has no single recentering mean)."""
    from dsic_tpu.ops.distributions import std_gaussian_cdf
    w = jax.nn.softmax(w_logits, axis=1)
    support = (lo[:, None].astype(jnp.float32)
               + jnp.arange(L_pad, dtype=jnp.float32)[None, :])
    # (G, K, R, L)
    x = support[:, None, None, :] - mu[:, :, :, None]
    inv = 1.0 / sigma[:, :, :, None]
    p_k = (std_gaussian_cdf((x + 0.5) * inv)
           - std_gaussian_cdf((x - 0.5) * inv))
    p = jnp.einsum("gkrl,gkr->grl", p_k, w)
    return jnp.clip(p, PMF_FLOOR, 1.0)


def gaussian_cdf_rows_batch(sigma: np.ndarray, lo: np.ndarray, L: int,
                            bucket: int = 64) -> np.ndarray:
    """Batched integer CDF rows: (G, R) sigma, (G,) per-group lo, shared
    support length L. Returns (G, R, L+1) uint32.

    Computed on HOST (scipy erf): the hyperlatent plane is tiny (~256k bin
    integrals per batch) and a host build removes one device round trip from
    both codec directions; identical host math on encoder and decoder makes
    the bitwise-table invariant trivial for this plane."""
    from scipy.special import erf as _erf
    sigma = np.asarray(sigma, np.float64)
    if sigma.ndim == 1:
        sigma = sigma[None]
    lo = np.asarray(lo, np.float64)
    support = lo[:, None] + np.arange(L, dtype=np.float64)[None, :]  # (G, L)
    inv = 1.0 / (np.sqrt(2.0) * sigma)  # (G, R)
    upper = (support[:, None, :] + 0.5) * inv[:, :, None]
    lower = (support[:, None, :] - 0.5) * inv[:, :, None]
    pmf = np.clip(0.5 * (_erf(upper) - _erf(lower)), PMF_FLOOR, 1.0)
    g, r, _ = pmf.shape
    return quantize_pmf_to_cdf(pmf.reshape(g * r, L)).reshape(g, r, L + 1)


def student_t_cdf_rows_batch(sigma: np.ndarray, nu: np.ndarray,
                             lo: np.ndarray, L: int,
                             bucket: int = 64) -> np.ndarray:
    """Batched Student-t integer CDF rows, same layout as the Gaussian."""
    L_pad = pad_support(L, bucket)
    pmf = _student_t_pmf(jnp.asarray(sigma, jnp.float32),
                         jnp.asarray(nu, jnp.float32),
                         jnp.asarray(lo, jnp.int32), L_pad)
    pmf_np = np.asarray(pmf)[:, :, :L]
    g, r, _ = pmf_np.shape
    return quantize_pmf_to_cdf(pmf_np.reshape(g * r, L)).reshape(g, r, L + 1)


def gaussian_cdf_rows(sigma: np.ndarray, lo: int, hi: int,
                      bucket: int = 64) -> np.ndarray:
    """Single-group convenience: (R,) sigma -> (R, L+1) uint32 rows for
    symbols lo..hi."""
    return gaussian_cdf_rows_batch(np.asarray(sigma)[None], np.asarray([lo]),
                                   hi - lo + 1, bucket)[0]


def student_t_cdf_rows(sigma: np.ndarray, nu: np.ndarray, lo: int, hi: int,
                       bucket: int = 64) -> np.ndarray:
    """Single-group convenience for Student-t rows."""
    return student_t_cdf_rows_batch(np.asarray(sigma)[None],
                                    np.asarray(nu)[None], np.asarray([lo]),
                                    hi - lo + 1, bucket)[0]
