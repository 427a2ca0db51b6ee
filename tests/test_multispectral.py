"""Multispectral pipeline: 13-band stack -> RGB -> tiled real-bitstream
round trip (BASELINE.json config 3)."""

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.codec.api import Codec
from dsic_tpu.data.pipeline import merge_scene_bands, compress_multispectral_scene
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.models import CompressionModel


def _band_stack(hw=(200, 180), k=13, seed=0):
    rng = np.random.default_rng(seed)
    base = synthetic_patches(1, hw, seed=seed)[0]  # smooth structure
    gains = rng.uniform(500, 4000, size=k).astype(np.float32)
    stack = base[..., :1] * gains[None, None, :] \
        + rng.normal(0, 20, size=(*hw, k)).astype(np.float32)
    return stack


def test_merge_scene_bands():
    stack = _band_stack()
    rgb = merge_scene_bands(stack, (3, 2, 1))
    assert rgb.shape == (200, 180, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    np.testing.assert_allclose(rgb.reshape(-1, 3).max(axis=0), 1.0, atol=1e-5)


def test_compress_multispectral_scene():
    model = CompressionModel(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)))
    codec = Codec(model, params)
    stack = _band_stack(hw=(150, 170))
    result, rgb = compress_multispectral_scene(codec, stack, tile=128,
                                               overlap=16, batch=4)
    assert rgb.shape == (150, 170, 3)
    assert result.x_hat.shape == (150, 170, 3)
    assert result.bpp > 0 and result.num_tiles >= 2
