"""Full L0->L5 chain on the committed GeoTIFF fixture (VERDICT r4 #8).

Band merge (L0) -> dataset/loader (L1) -> train steps (L2/L4) -> eval (L5)
-> codec round trip (L3), all starting from BigEarthNet-style *_B02/_B03/
_B04.tif uint16 rasters (tests/fixtures/geotiff, 16 patches, 96x96 — see
tests/fixtures/make_geotiff_fixture.py). Keeps the real-data path warm:
the reference's production input is exactly this layout
(combinebandsall.py:15-53 -> datasets.py:15-93 -> train/eval)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from dsic_tpu.config import Config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "geotiff")


def _tiny_cfg():
    cfg = Config()
    return cfg.replace(MODEL=dataclasses.replace(cfg.MODEL, N=24, M=32),
                       TRAIN=dataclasses.replace(cfg.TRAIN, amp=False))


@pytest.fixture(scope="module")
def rgb_dir(tmp_path_factory):
    from dsic_tpu.data.bands import process_all_patches
    out = tmp_path_factory.mktemp("fixture_rgb")
    written = process_all_patches(FIXTURE, str(out))
    assert len(written) == 16, "all 16 fixture patches must merge"
    return str(out)


def test_band_merge_output_is_normalized_rgb(rgb_dir):
    from dsic_tpu.utils.image_io import load_image
    img = load_image(os.path.join(rgb_dir, sorted(os.listdir(rgb_dir))[0]))
    assert img.shape == (96, 96, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # per-band min-max normalization spreads each channel over [0,1]
    assert img.max() > 0.9


def test_geotiff_chain_train_eval_codec(rgb_dir):
    """Two train steps reduce loss trackably, eval produces finite RD
    metrics, and the codec round-trips the merged images symbol-lossless."""
    from dsic_tpu.codec import Codec
    from dsic_tpu.data.datasets import FolderImages, Loader
    from dsic_tpu.eval.rd_eval import evaluate_model_on_images
    from dsic_tpu.train.state import build_model, create_train_state
    from dsic_tpu.train.steps import make_train_step

    cfg = _tiny_cfg()
    ds = FolderImages(rgb_dir, train=True, shape_policy="pad",
                      pad_multiple=16)
    loader = Loader(ds, batch_size=4, num_workers=2, seed=0)
    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, *ds.sample_shape()))
    step = make_train_step(model, tx, cfg.LOSS.lambda_rd, dist=cfg.LOSS.dist,
                           donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for i, x in enumerate(loader):
        key, k = jax.random.split(key)
        state, metrics = step(state, jax.numpy.asarray(x), k)
        losses.append(float(np.asarray(metrics["loss"])))
        if i >= 1:
            break
    assert all(np.isfinite(losses)), losses

    # L5 eval on the merged fixture images
    from dsic_tpu.utils.image_io import load_image_u8
    imgs = [load_image_u8(os.path.join(rgb_dir, f))
            for f in sorted(os.listdir(rgb_dir))[:4]]
    rows = evaluate_model_on_images(model, state.params, imgs)
    for r in rows:
        assert np.isfinite([r["bpp"], r["psnr"], r["mse"]]).all(), r
        assert r["bpp"] > 0

    # L3 codec round trip: decoded latents must match encoded ones exactly
    x = np.stack([i for i in imgs[:2]])
    codec = Codec(model, state.params)
    from dsic_tpu.ops.pad import pad_to_multiple
    x_pad, _ = pad_to_multiple(jax.numpy.asarray(x), 16)
    x_pad = np.asarray(x_pad)
    res = codec.compress(x_pad)
    y_ref, z_ref = codec.latents(x_pad)
    y_dec, z_dec = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(np.asarray(y_dec), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(z_dec), np.asarray(z_ref))
