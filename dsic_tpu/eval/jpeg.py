"""JPEG baseline: quality sweeps and bpp-matched quality search.

Reference: writeupbdcurvesjpegALL.py:31,63-66,110,208 (PIL in-memory encode,
bpp from byte length, qualities 10..100 step 10) and
resultsanalysis.py:43-46,77-107 (bisection on quality for a target bpp,
1% tolerance, <= 12 iterations).
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image

import jax.numpy as jnp

from dsic_tpu.ops.msssim import ms_ssim, ssim, psnr

JPEG_QUALITIES = tuple(range(10, 101, 10))


def _to_pil(img: np.ndarray) -> Image.Image:
    arr = (np.clip(np.asarray(img), 0, 1) * 255.0 + 0.5).astype(np.uint8)
    return Image.fromarray(arr)


def jpeg_encode_decode(img: np.ndarray, quality: int):
    """HWC float [0,1] -> (decoded HWC float, num_bytes)."""
    buf = io.BytesIO()
    _to_pil(img).save(buf, format="JPEG", quality=int(quality))
    n_bytes = buf.tell()
    buf.seek(0)
    dec = np.asarray(Image.open(buf).convert("RGB"), np.float32) / 255.0
    return dec, n_bytes


def _metrics(x: np.ndarray, x_hat: np.ndarray) -> dict:
    xb = jnp.asarray(x)[None]
    hb = jnp.asarray(x_hat)[None]
    h, w = x.shape[:2]
    if min(h, w) > 40:  # 3-scale MS-SSIM needs > (11-1)*4 pixels
        mss = float(ms_ssim(hb, xb)[0])
    else:  # small-image ssim fallback (modelseval.py:79-88)
        mss = float(ssim(hb, xb)[0])
    mse = float(np.mean((x - x_hat) ** 2))
    return {"mse": mse, "psnr": float(psnr(hb, xb)[0]), "msssim": mss}


def jpeg_rd_point(img: np.ndarray, quality: int) -> dict:
    dec, n_bytes = jpeg_encode_decode(img, quality)
    h, w = img.shape[:2]
    m = _metrics(img, dec)
    m.update({"quality": quality, "bpp": 8.0 * n_bytes / (h * w),
              "bytes": n_bytes})
    return m


def jpeg_rd_curve(images, qualities=JPEG_QUALITIES) -> dict:
    """Mean RD over a set of HWC images per quality. Returns dict with arrays
    quality/bpp/psnr/msssim + count (agg_jpeg_rd.csv schema)."""
    rows = {q: [] for q in qualities}
    for img in images:
        for q in qualities:
            rows[q].append(jpeg_rd_point(img, q))
    return {
        "quality": np.asarray(qualities),
        "count": len(images),
        "bpp": np.asarray([np.mean([r["bpp"] for r in rows[q]])
                           for q in qualities]),
        "psnr": np.asarray([np.mean([r["psnr"] for r in rows[q]])
                            for q in qualities]),
        "msssim": np.asarray([np.mean([r["msssim"] for r in rows[q]])
                              for q in qualities]),
    }


def find_jpeg_quality_for_target_bpp(img: np.ndarray, target_bpp: float,
                                     tol: float = 0.01, max_iter: int = 12):
    """Bisection over integer quality 1..100 for bpp closest to target
    (resultsanalysis.py:77-107 semantics). Returns the best rd-point dict."""
    lo_q, hi_q = 1, 100
    best = None
    for _ in range(max_iter):
        q = (lo_q + hi_q) // 2
        point = jpeg_rd_point(img, q)
        if best is None or (abs(point["bpp"] - target_bpp)
                            < abs(best["bpp"] - target_bpp)):
            best = point
        if abs(point["bpp"] - target_bpp) / max(target_bpp, 1e-9) <= tol:
            return point
        if point["bpp"] < target_bpp:
            lo_q = q + 1
        else:
            hi_q = q - 1
        if lo_q > hi_q:
            break
    return best
