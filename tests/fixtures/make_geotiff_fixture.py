#!/usr/bin/env python
"""Generate the committed BigEarthNet-style GeoTIFF fixture (VERDICT r4 #8).

16 patch folders, each holding *_B02/_B03/_B04.tif uint16 band rasters at
96x96 (Sentinel-2 L2A-like reflectance range 0..10000), derived
deterministically from data/synthetic.py so the content matches the corpus
the rest of the suite trains on. Run once; the TIFFs are committed so the
full L0->L5 chain test (tests/test_geotiff_e2e.py) runs on real files
without regeneration.

Note: written via PIL (uint16 grayscale TIFF). rasterio is not installed in
this image; dsic_tpu.data.bands._read_band falls back to PIL for .tif when
rasterio is absent, which is exactly the path the test exercises.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from dsic_tpu.data.synthetic import synthetic_patches  # noqa: E402


def main() -> None:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "geotiff")
    os.makedirs(root, exist_ok=True)
    patches = synthetic_patches(16, (96, 96), seed=2026)
    for i, img in enumerate(patches):
        name = f"S2_FIXTURE_patch_{i:02d}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        # RGB float [0,1] -> L2A-like uint16 bands: B04=red, B03=green,
        # B02=blue, reflectance scaled to 0..10000
        for band, ch in (("B02", 2), ("B03", 1), ("B04", 0)):
            arr = np.clip(img[..., ch] * 10000.0, 0, 65535).astype(np.uint16)
            Image.fromarray(arr).save(os.path.join(d, f"{name}_{band}.tif"))
    print(f"wrote 16 patch folders under {root}")


if __name__ == "__main__":
    main()
