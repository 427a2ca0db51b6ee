"""Host-side image I/O: PIL readers feeding the jitted pipeline.

Matches the reference's loader conventions: recursive glob over 7 extensions
(datasets.py:8-13), RGB conversion, [0,1] float (datasets.py:65-72). Arrays
are HWC float32.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

IMAGE_EXTS = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.tif", "*.tiff", "*.webp")


def list_images(root: str) -> list[str]:
    files: list[str] = []
    for ext in IMAGE_EXTS:
        files.extend(glob.glob(os.path.join(root, "**", ext), recursive=True))
    return sorted(files)


def load_image(path: str) -> np.ndarray:
    """HWC float32 in [0, 1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """HWC uint8 — the device wire format (jitted paths normalize)."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def save_image(path: str, array) -> None:
    """HWC float in [0,1] (or NHWC with N==1) -> 8-bit image file."""
    arr = np.asarray(array)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)
