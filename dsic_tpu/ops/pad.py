"""Padding / cropping / resize helpers (static-shape friendly).

Reference: pad-to-multiple-of-16 with centered reflect padding
(/root/reference/code/modelv2/datasets.py:41-49, modelseval.py:57-64), crop
back to the original size after synthesis (eval_selfcontained.py:67), and the
bilinear-resize guard in the RD loss (model.py:95-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def padded_size(size: int, mult: int = 16) -> int:
    return ((size + mult - 1) // mult) * mult


def pad_to_multiple(x: jax.Array, mult: int = 16):
    """Centered reflect-pad the spatial dims of NHWC (or HWC) ``x`` to a
    multiple of ``mult``. Returns (padded, (top, left, H, W)) where (H, W) is
    the original spatial size — feed to :func:`crop_to` to invert."""
    spatial_offset = x.ndim - 3  # 0 for HWC, 1 for NHWC
    h, w = x.shape[spatial_offset], x.shape[spatial_offset + 1]
    new_h, new_w = padded_size(h, mult), padded_size(w, mult)
    top = (new_h - h) // 2
    left = (new_w - w) // 2
    pad = [(0, 0)] * x.ndim
    pad[spatial_offset] = (top, new_h - h - top)
    pad[spatial_offset + 1] = (left, new_w - w - left)
    mode = "reflect" if (h > 1 and w > 1) else "edge"
    return jnp.pad(x, pad, mode=mode), (top, left, h, w)


def crop_to(x: jax.Array, box) -> jax.Array:
    """Crop spatial dims back to the (top, left, H, W) box from
    :func:`pad_to_multiple`."""
    top, left, h, w = box
    if x.ndim == 4:
        return x[:, top:top + h, left:left + w, :]
    return x[top:top + h, left:left + w, :]


def resize_bilinear(x: jax.Array, hw) -> jax.Array:
    """Bilinear resize of NHWC spatial dims (align_corners=False semantics,
    matching torch F.interpolate in model.py:95-96)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")
