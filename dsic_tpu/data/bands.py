"""Sentinel-2 band merge: B02/B03/B04 (blue/green/red) -> RGB.

Capability match for the reference preprocessing
(/root/reference/code/combinebands.py:5-26 single-patch PNG variant,
combinebandsall.py:7-53 batch GeoTIFF variant): per-band min-max
normalization, stack as RGB, write uint8 PNG. Plus a vectorized jitted
variant (`merge_bands`) for on-TPU batch preprocessing of multispectral
stacks (BASELINE.json config 3).

rasterio (GDAL) is optional: GeoTIFF reading is gated on its presence; PNG
band files go through PIL.
"""

from __future__ import annotations

import functools
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from dsic_tpu.utils.image_io import save_image

try:
    import rasterio  # type: ignore
    HAS_RASTERIO = True
except ImportError:
    HAS_RASTERIO = False


def _normalize_band(band: np.ndarray) -> np.ndarray:
    band = band.astype(np.float32)
    lo, hi = float(band.min()), float(band.max())
    if hi - lo < 1e-6:
        return np.zeros_like(band)
    return (band - lo) / (hi - lo)


def _read_band(path: str) -> np.ndarray:
    if path.lower().endswith((".tif", ".tiff")) and HAS_RASTERIO:
        with rasterio.open(path) as src:
            return src.read(1)
    arr = np.asarray(Image.open(path), dtype=np.float32)
    if arr.ndim == 3:  # band stored as an RGB/gray+alpha PNG: one channel
        arr = arr[..., 0]
    return arr


def create_rgb_from_pngs(b2_path: str, b3_path: str, b4_path: str,
                         out_path: str) -> np.ndarray:
    """B02 (blue), B03 (green), B04 (red) band files -> RGB PNG
    (combinebands.py:16-26 equivalent). Returns the HWC float array."""
    blue = _normalize_band(_read_band(b2_path))
    green = _normalize_band(_read_band(b3_path))
    red = _normalize_band(_read_band(b4_path))
    rgb = np.stack([red, green, blue], axis=-1)
    save_image(out_path, rgb)
    return rgb


def process_all_patches(root: str, out_dir: str) -> list[str]:
    """Walk BigEarthNet-style patch folders containing *_B02/_B03/_B04 band
    files and write one RGB PNG per patch (combinebandsall.py:15-53
    equivalent). Returns written paths; unreadable patches are skipped with a
    warning (the reference's WARN-and-continue posture)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for patch_dir in sorted(d for d in glob.glob(os.path.join(root, "*"))
                            if os.path.isdir(d)):
        def find(suffix):
            hits = (glob.glob(os.path.join(patch_dir, f"*_{suffix}.tif"))
                    + glob.glob(os.path.join(patch_dir, f"*_{suffix}.png")))
            return hits[0] if hits else None
        b2, b3, b4 = find("B02"), find("B03"), find("B04")
        if not (b2 and b3 and b4):
            print(f"[bands] WARN: missing B02/B03/B04 in {patch_dir}, skipping")
            continue
        out_path = os.path.join(out_dir,
                                os.path.basename(patch_dir) + "_RGB.png")
        try:
            create_rgb_from_pngs(b2, b3, b4, out_path)
            written.append(out_path)
        except Exception as exc:  # noqa: BLE001 — skip-and-continue per patch
            print(f"[bands] WARN: failed {patch_dir}: {exc}")
    return written


@functools.partial(jax.jit, static_argnums=(1,))
def merge_bands(bands: jax.Array, band_indices=(2, 1, 0)) -> jax.Array:
    """Vectorized band merge on device: (B, H, W, K) multispectral stack ->
    (B, H, W, 3) RGB with per-image per-band min-max normalization.

    Default indices assume channel order [B02, B03, B04, ...] -> RGB selects
    (B04, B03, B02)."""
    sel = bands[..., jnp.asarray(band_indices)]
    lo = jnp.min(sel, axis=(1, 2), keepdims=True)
    hi = jnp.max(sel, axis=(1, 2), keepdims=True)
    return (sel - lo) / jnp.maximum(hi - lo, 1e-6)


def main(argv=None) -> int:
    """CLI entry point mirroring the reference's standalone band-merge
    scripts: batch mode over BigEarthNet-style patch folders
    (combinebandsall.py:47-53) or a single patch from three band files
    (combinebands.py:16-26)."""
    import argparse

    ap = argparse.ArgumentParser(
        description="Sentinel-2 B02/B03/B04 -> RGB PNG merge")
    ap.add_argument("--root", help="directory of BigEarthNet patch folders")
    ap.add_argument("--out", required=True,
                    help="output dir (--root) or output PNG path (--b2/3/4)")
    ap.add_argument("--b2", help="single-patch B02 (blue) band file")
    ap.add_argument("--b3", help="single-patch B03 (green) band file")
    ap.add_argument("--b4", help="single-patch B04 (red) band file")
    args = ap.parse_args(argv)
    if args.root:
        written = process_all_patches(args.root, args.out)
        print(f"[bands] wrote {len(written)} RGB patches to {args.out}")
        return 0 if written else 1
    if args.b2 and args.b3 and args.b4:
        create_rgb_from_pngs(args.b2, args.b3, args.b4, args.out)
        print(f"[bands] wrote {args.out}")
        return 0
    ap.error("need either --root or all of --b2/--b3/--b4")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
