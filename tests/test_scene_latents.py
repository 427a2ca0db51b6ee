"""Scene tiling through the real codec + latent analysis."""

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.codec.api import Codec
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.eval.scene import roundtrip_scene
from dsic_tpu.eval.latent_analysis import analyze_latents, fit_student_t
from dsic_tpu.models import CompressionModel


def _model_params(hw=(64, 64)):
    model = CompressionModel(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, *hw, 3)))
    return model, params


def test_scene_roundtrip():
    model, params = _model_params()
    codec = Codec(model, params)
    scene = synthetic_patches(1, (200, 250), seed=0)[0]
    res = roundtrip_scene(codec, scene, tile=128, overlap=16, batch=4)
    assert res.x_hat.shape == scene.shape
    assert res.bpp > 0 and res.num_tiles >= 4
    # untrained model won't reconstruct well; the pipeline must at least
    # produce values in range and a deterministic result
    assert res.x_hat.min() >= 0 and res.x_hat.max() <= 1
    res2 = roundtrip_scene(codec, scene, tile=128, overlap=16, batch=4)
    np.testing.assert_array_equal(res.x_hat, res2.x_hat)


def test_scene_smaller_than_tile():
    model, params = _model_params()
    codec = Codec(model, params)
    scene = synthetic_patches(1, (96, 96), seed=1)[0]
    res = roundtrip_scene(codec, scene, tile=256, overlap=16, batch=4)
    assert res.x_hat.shape == scene.shape
    assert res.num_tiles == 1


def test_fit_student_t_recovers_params():
    rng = np.random.default_rng(0)
    import scipy.stats
    vals = scipy.stats.t.rvs(df=4.0, scale=2.0, size=20000, random_state=rng)
    fit = fit_student_t(vals)
    assert abs(fit["nu"] - 4.0) < 1.0
    assert abs(fit["sigma"] - 2.0) < 0.2
    assert fit["t_beats_gauss"]


def test_analyze_latents_artifacts(tmp_path):
    model, params = _model_params()
    imgs = synthetic_patches(2, (64, 64), seed=2)
    fit = analyze_latents(model, params, imgs, str(tmp_path))
    assert (tmp_path / "latent_fit.png").exists()
    assert (tmp_path / "latent_fit_channels.png").exists()
    assert (tmp_path / "studentt_best_featuremaps.png").exists()
    assert np.isfinite(fit["nu"]) and len(fit["per_channel"]) > 0
