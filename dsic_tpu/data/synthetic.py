"""Synthetic satellite-like patches for tests and benchmarks.

Generates smooth multi-scale fields with field/parcel-like edges, giving
images with realistic low-frequency energy (random noise would be incompressible
and make RD numbers meaningless).
"""

from __future__ import annotations

import os

import numpy as np

from dsic_tpu.utils.image_io import save_image


def _smooth_noise(rng: np.random.Generator, hw, scale: int, channels: int = 3):
    h, w = hw
    lh, lw = max(1, h // scale), max(1, w // scale)
    low = rng.standard_normal((lh, lw, channels)).astype(np.float32)
    # bilinear upsample via np (avoid jax dependency for data gen)
    ys = np.linspace(0, lh - 1, h)
    xs = np.linspace(0, lw - 1, w)
    y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, lh - 1); x1 = np.minimum(x0 + 1, lw - 1)
    wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
    a = low[y0][:, x0]; b = low[y0][:, x1]
    c = low[y1][:, x0]; d = low[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def synthetic_patches(n: int, hw=(256, 256), seed: int = 0) -> np.ndarray:
    """(n, H, W, 3) float32 in [0, 1]."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, hw[0], hw[1], 3), np.float32)
    for i in range(n):
        base = rng.uniform(0.25, 0.6, size=3).astype(np.float32)
        img = base[None, None, :] + 0.18 * _smooth_noise(rng, hw, 16)
        img += 0.08 * _smooth_noise(rng, hw, 4)
        # parcel-like boundaries: threshold a very smooth field
        mask = (_smooth_noise(rng, hw, 32, 1) > 0.0).astype(np.float32)
        tint = rng.uniform(-0.12, 0.12, size=3).astype(np.float32)
        img += mask * tint[None, None, :]
        img += 0.01 * rng.standard_normal((*hw, 3)).astype(np.float32)
        out[i] = np.clip(img, 0.0, 1.0)
    return out


def write_synthetic_dataset(root: str, n: int = 32, hw=(120, 120),
                            seed: int = 0) -> list[str]:
    """Write PNG patches (BigEarthNet-like 120x120 by default); returns paths."""
    patches = synthetic_patches(n, hw, seed)
    paths = []
    for i, img in enumerate(patches):
        p = os.path.join(root, f"patch_{i:04d}.png")
        save_image(p, img)
        paths.append(p)
    return paths
