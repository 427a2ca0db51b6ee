"""Multispectral scene pipeline: band merge -> patchify -> compress
(BASELINE.json config 3). Chains the jitted band merge (data/bands.py) with
the tiled scene codec (eval/scene.py) so a raw Sentinel-2 band stack goes to
a real bitstream in one call.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dsic_tpu.data.bands import merge_bands


def merge_scene_bands(band_stack: np.ndarray,
                      band_indices=(2, 1, 0)) -> np.ndarray:
    """(H, W, K) multispectral stack -> (H, W, 3) RGB float in [0, 1] with
    per-band min-max normalization (combinebandsall.py:7-12 semantics)."""
    rgb = merge_bands(jnp.asarray(band_stack[None], jnp.float32),
                      tuple(band_indices))[0]
    return np.asarray(rgb)


def compress_multispectral_scene(codec, band_stack: np.ndarray,
                                 band_indices=(2, 1, 0), tile: int = 256,
                                 overlap: int = 16, batch: int = 16):
    """Full config-3 chain: merge -> tile -> real-bitstream compress ->
    decode -> stitch. Returns (SceneResult, merged_rgb)."""
    from dsic_tpu.eval.scene import roundtrip_scene
    rgb = merge_scene_bands(band_stack, band_indices)
    result = roundtrip_scene(codec, rgb, tile=tile, overlap=overlap,
                             batch=batch)
    return result, rgb
