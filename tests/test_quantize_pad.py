"""Quantizer STE + padding/tiling behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.ops.quantize import quantize, ste_round
from dsic_tpu.ops.pad import pad_to_multiple, crop_to, padded_size
from dsic_tpu.ops.tiling import patchify, stitch, tile_grid


def test_noise_quantizer_bounds_and_grad():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 8, 8, 2))
    q = quantize(x, "noise", key)
    assert float(jnp.max(jnp.abs(q))) <= 0.5
    g = jax.grad(lambda x: jnp.sum(quantize(x, "noise", key)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_ste_round_values_and_grad():
    x = jnp.asarray([0.4, 0.5, 1.5, 2.5, -0.5, -1.2])
    # round-half-to-even, like torch.round
    np.testing.assert_allclose(np.asarray(ste_round(x)),
                               [0.0, 0.0, 2.0, 2.0, -0.0, -1.0])
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_pad_to_multiple_matches_torch_reflect():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 3, 120, 121)).astype(np.float32)
    # reference centered padding (datasets.py:41-49)
    new_h, new_w = padded_size(120), padded_size(121)
    left = (new_w - 121) // 2
    top = (new_h - 120) // 2
    want = F.pad(torch.from_numpy(img),
                 (left, new_w - 121 - left, top, new_h - 120 - top),
                 mode="reflect").numpy()
    x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    got, box = pad_to_multiple(x, 16)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)
    # crop inverts
    back = crop_to(got, box)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_tile_grid_covers():
    for size in (256, 300, 511, 1000):
        starts = tile_grid(size, 256, 16)
        assert starts[0] == 0
        assert starts[-1] + 256 >= size


def test_patchify_stitch_roundtrip():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(300, 280, 3)).astype(np.float32))
    tiles, offsets = patchify(img, tile=128, overlap=16)
    out = stitch(tiles, offsets, (300, 280), overlap=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
