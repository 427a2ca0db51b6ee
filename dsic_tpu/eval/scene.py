"""Full-scene tiled encode/decode: pad -> overlap-patchify -> batched codec ->
overlap-stitch (BASELINE.json config 5; the TPU equivalent of the reference's
upstream scene->patch tiling, SURVEY.md section 5 "long-context" row).

Tiles run through the real entropy codec in fixed-size batches (static shapes
for XLA); reconstruction blends tile overlaps with linear feathering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from dsic_tpu.codec.api import Codec
from dsic_tpu.ops.tiling import patchify, stitch
from dsic_tpu.ops.pad import pad_to_multiple, crop_to


@dataclass
class SceneResult:
    x_hat: np.ndarray  # (H, W, C) reconstruction
    bpp: float  # payload bits over original scene pixels
    num_bytes: int
    num_tiles: int


def encode_scene(codec: Codec, scene: np.ndarray, tile: int = 256,
                 overlap: int = 16, batch: int = 16):
    """HWC scene -> (list of bitstreams, meta). Tiles are compressed in
    batches of identical shape."""
    padded, box = pad_to_multiple(jnp.asarray(scene),
                                  getattr(codec.model, "pad_multiple", 16))
    h, w = padded.shape[0], padded.shape[1]
    tile = min(tile, h, w)
    tiles, offsets = patchify(padded, tile=tile, overlap=overlap)
    tiles_np = np.asarray(tiles)
    streams = []
    for start in range(0, tiles_np.shape[0], batch):
        chunk = tiles_np[start:start + batch]
        streams.append(codec.compress(chunk))
    meta = {"box": box, "padded_hw": (h, w), "offsets": offsets,
            "tile": tile, "overlap": overlap,
            "scene_hw": scene.shape[:2], "channels": scene.shape[2]}
    return streams, meta


def decode_scene(codec: Codec, streams, meta) -> np.ndarray:
    tiles = np.concatenate([codec.decompress(s.data) for s in streams], axis=0)
    out = stitch(jnp.asarray(tiles), meta["offsets"], meta["padded_hw"],
                 overlap=meta["overlap"])
    return np.asarray(crop_to(out[None], meta["box"])[0])


def roundtrip_scene(codec: Codec, scene: np.ndarray, tile: int = 256,
                    overlap: int = 16, batch: int = 16) -> SceneResult:
    streams, meta = encode_scene(codec, scene, tile, overlap, batch)
    x_hat = decode_scene(codec, streams, meta)
    payload_bits = sum(sum(s.per_image_bits) for s in streams)
    h, w = meta["scene_hw"]
    return SceneResult(x_hat=np.clip(x_hat, 0, 1),
                       bpp=payload_bits / (h * w),
                       num_bytes=sum(len(s.data) for s in streams),
                       num_tiles=sum(len(s.per_image_bits) for s in streams))
