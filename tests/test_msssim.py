"""MS-SSIM/SSIM vs an independent numpy oracle implementing the standard
Wang et al. formulation used by piq / pytorch_msssim (3 scales,
weights (0.3, 0.5, 0.2), 11x11 Gaussian sigma 1.5, VALID filtering)."""

import numpy as np
import scipy.ndimage
import jax.numpy as jnp

from dsic_tpu.ops.msssim import ssim, ms_ssim, psnr


def _np_gauss1d(size=11, sigma=1.5):
    c = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-c ** 2 / (2 * sigma ** 2))
    return g / g.sum()


def _np_blur(img, g):
    # img: HWC; valid separable filter
    out = scipy.ndimage.convolve1d(img, g, axis=0, mode="constant")
    out = scipy.ndimage.convolve1d(out, g, axis=1, mode="constant")
    k = len(g) // 2
    return out[k:-k, k:-k]


def _np_ssim_parts(x, y, data_range=1.0):
    g = _np_gauss1d()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu_x, mu_y = _np_blur(x, g), _np_blur(y, g)
    sxx = _np_blur(x * x, g) - mu_x ** 2
    syy = _np_blur(y * y, g) - mu_y ** 2
    sxy = _np_blur(x * y, g) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    s = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return s.mean(), cs.mean()


def _np_down2(x):
    h, w = x.shape[:2]
    x = x[: h - h % 2, : w - w % 2]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def _np_ms_ssim(x, y, weights=(0.3, 0.5, 0.2)):
    vals = []
    for i in range(len(weights)):
        s, cs = _np_ssim_parts(x, y)
        vals.append(max(s, 0.0) if i == len(weights) - 1 else max(cs, 0.0))
        if i < len(weights) - 1:
            x, y = _np_down2(x), _np_down2(y)
    return float(np.prod([v ** w for v, w in zip(vals, weights)]))


def _pair(seed=0, hw=(96, 96)):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(*hw, 3)).astype(np.float64)
    x = scipy.ndimage.gaussian_filter(x, sigma=(2, 2, 0))  # natural-ish image
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1)
    return x.astype(np.float32), y.astype(np.float32)


def test_ssim_vs_oracle():
    x, y = _pair(0)
    got = float(ssim(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    want, _ = _np_ssim_parts(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_ssim_vs_oracle():
    x, y = _pair(1, hw=(120, 120))  # BigEarthNet patch size
    got = float(ms_ssim(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    want = _np_ms_ssim(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_ssim_identity_is_one():
    x, _ = _pair(2)
    got = float(ms_ssim(jnp.asarray(x)[None], jnp.asarray(x)[None])[0])
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_ms_ssim_batched_and_monotone():
    x, y = _pair(3)
    z = np.clip(x + np.random.default_rng(4).normal(0, 0.15, x.shape), 0, 1)
    batch_x = jnp.stack([jnp.asarray(x)] * 2)
    batch_y = jnp.stack([jnp.asarray(y), jnp.asarray(z.astype(np.float32))])
    vals = np.asarray(ms_ssim(batch_x, batch_y))
    assert vals.shape == (2,)
    assert vals[0] > vals[1]  # more noise, lower similarity


def test_psnr():
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = np.full_like(x, 0.1)
    got = float(psnr(jnp.asarray(x), jnp.asarray(y))[0])
    np.testing.assert_allclose(got, 20.0, atol=1e-4)
