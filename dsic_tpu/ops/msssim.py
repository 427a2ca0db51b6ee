"""SSIM / MS-SSIM / PSNR as jitted NHWC ops.

MS-SSIM follows Wang et al. (2003) with the reference's configuration:
3 scales with weights (0.3, 0.5, 0.2) — the loss uses piq.multi_scale_ssim
(/root/reference/code/modelv2/model.py:93-102) and the eval metric uses
pytorch_msssim with the same weights (modelseval.py:34,78-88); both reduce to
the standard formula with an 11x11 Gaussian window (sigma 1.5), K=(0.01, 0.03),
VALID filtering, and 2x average-pool downsampling between scales.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_WEIGHTS = (0.3, 0.5, 0.2)
K1, K2 = 0.01, 0.03


def _gaussian_1d(size: int, sigma: float):
    # No caching: the window is 11 values built at trace time, and caching a
    # trace-created array would leak it across traces.
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(x: jax.Array, win_size: int, sigma: float) -> jax.Array:
    """Separable depthwise Gaussian filter, VALID padding. x: NHWC.

    precision=HIGHEST is load-bearing: TPU convs default to bfloat16 inputs,
    and the SSIM variance terms blur(x*x) - mu*mu cancel catastrophically in
    bf16 (observed cs ~ 50 instead of ~0.74 on real pairs)."""
    c = x.shape[-1]
    g = _gaussian_1d(win_size, sigma).astype(x.dtype)
    kh = jnp.tile(g.reshape(win_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, win_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_parts(x: jax.Array, y: jax.Array, data_range: float,
                win_size: int, sigma: float):
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    mu_x = _blur(x, win_size, sigma)
    mu_y = _blur(y, win_size, sigma)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = _blur(x * x, win_size, sigma) - mu_xx
    sigma_yy = _blur(y * y, win_size, sigma) - mu_yy
    sigma_xy = _blur(x * y, win_size, sigma) - mu_xy
    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    # By Cauchy-Schwarz the true maps never exceed 1; values above 1 are pure
    # float32 cancellation noise in blur(x*x) - mu*mu (visible on TPU for
    # near-identical pairs). Clamp the upper bound only — negative SSIM is a
    # real signal and stays.
    cs_map = jnp.minimum(cs_map, 1.0)
    ssim_map = jnp.minimum(ssim_map, 1.0)
    reduce_axes = tuple(range(1, x.ndim))
    return jnp.mean(ssim_map, axis=reduce_axes), jnp.mean(cs_map, axis=reduce_axes)


def ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-image SSIM. x, y: NHWC in [0, data_range]. Returns (B,)."""
    s, _ = _ssim_parts(x, y, data_range, win_size, sigma)
    return s


def _downsample2(x: jax.Array) -> jax.Array:
    """2x average pool, padding odd spatial dims by edge replication first."""
    _, h, w, _ = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
            weights=DEFAULT_WEIGHTS, win_size: int = 11,
            sigma: float = 1.5) -> jax.Array:
    """Per-image MS-SSIM with the reference's 3-scale weights. Returns (B,).

    Requires min(H, W) > (win_size - 1) * 2**(len(weights) - 1); use
    :func:`ssim` as the small-image fallback (modelseval.py:79-88 behavior).
    """
    w = jnp.asarray(weights, dtype=x.dtype)
    levels = len(weights)
    mcs = []
    for i in range(levels):
        s, cs = _ssim_parts(x, y, data_range, win_size, sigma)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x, y = _downsample2(x), _downsample2(y)
    vals = jnp.stack(mcs + [jax.nn.relu(s)], axis=0)  # (levels, B)
    return jnp.prod(vals ** w[:, None], axis=0)


def psnr(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB (eval_selfcontained.py:11-16 semantics)."""
    reduce_axes = tuple(range(1, x.ndim))
    mse = jnp.mean(jnp.square(x - y), axis=reduce_axes)
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
