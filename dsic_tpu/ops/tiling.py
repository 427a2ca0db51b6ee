"""Full-scene tiling: patchify with overlap and overlap-stitch with linear
feathering. TPU equivalent of the reference's upstream scene->patch tiling
(SURVEY.md section 5, "long-context" row; BASELINE.json config 5): big
Sentinel-2 scenes are cut into fixed-size tiles (static shapes for XLA),
processed batched, and blended back.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def tile_grid(size: int, tile: int, overlap: int):
    """Static list of tile start offsets covering [0, size) with >= ``overlap``
    overlap between neighbors; the final tile is clamped to end at ``size``."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] + tile < size:
        starts.append(size - tile)
    return starts


def patchify(image: jax.Array, tile: int = 256, overlap: int = 16):
    """HWC image -> (T, tile, tile, C) tiles + list of (row, col) offsets.
    The image must be at least tile x tile (pad first if needed)."""
    h, w, _ = image.shape
    rows = tile_grid(h, tile, overlap)
    cols = tile_grid(w, tile, overlap)
    tiles = [jax.lax.dynamic_slice(image, (r, c, 0), (tile, tile, image.shape[2]))
             for r in rows for c in cols]
    offsets = [(r, c) for r in rows for c in cols]
    return jnp.stack(tiles, axis=0), offsets


def _feather_1d(tile: int, overlap: int, at_start: bool, at_end: bool):
    wgt = np.ones(tile, dtype=np.float32)
    ramp = (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0)
    if not at_start and overlap > 0:
        wgt[:overlap] = ramp
    if not at_end and overlap > 0:
        wgt[-overlap:] = ramp[::-1]
    return wgt


def stitch(tiles: jax.Array, offsets, out_hw, overlap: int = 16) -> jax.Array:
    """Inverse of :func:`patchify`: blend (T, t, t, C) tiles into (H, W, C)
    with linear feathering over the overlap regions."""
    t = tiles.shape[1]
    c = tiles.shape[3]
    h, w = out_hw
    acc = jnp.zeros((h, w, c), dtype=tiles.dtype)
    norm = jnp.zeros((h, w, 1), dtype=tiles.dtype)
    for i, (r, col) in enumerate(offsets):
        wr = _feather_1d(t, overlap, r == 0, r + t >= h)
        wc = _feather_1d(t, overlap, col == 0, col + t >= w)
        wgt = jnp.asarray(np.outer(wr, wc), dtype=tiles.dtype)[..., None]
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (r, col, 0), (t, t, c)) + tiles[i] * wgt,
            (r, col, 0))
        norm = jax.lax.dynamic_update_slice(
            norm, jax.lax.dynamic_slice(norm, (r, col, 0), (t, t, 1)) + wgt,
            (r, col, 0))
    return acc / jnp.maximum(norm, 1e-8)
