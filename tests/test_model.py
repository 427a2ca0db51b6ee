"""CompressionModel: shapes, output dict, loss semantics, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsic_tpu.models import CompressionModel, rate_distortion_loss


def _init(model, hw=(64, 64), batch=1):
    x = jnp.zeros((batch, *hw, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    return params, x


def test_forward_shapes_and_keys():
    model = CompressionModel(N=32, M=48)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(2, 64, 64, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out["y"].shape == (2, 4, 4, 48)       # stride 16
    assert out["z"].shape == (2, 1, 1, 32)       # stride 64 total
    assert out["x_hat"].shape == (2, 64, 64, 3)
    assert out["sigma"].shape == out["y"].shape
    assert out["nu"].shape == out["y"].shape
    assert set(out) == {"x_hat", "nll_y", "nll_z", "y", "y_tilde", "z",
                        "z_tilde", "sigma", "nu"}
    nu = np.asarray(out["nu"])
    assert nu.min() >= 2.0 and nu.max() <= 100.0


def test_global_params_constant_over_space():
    model = CompressionModel(N=32, M=48, spatial_params=False)
    params, _ = _init(model, hw=(128, 128))
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(size=(1, 128, 128, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="round", train=False)
    sigma = np.asarray(out["sigma"])
    assert np.allclose(sigma, sigma[:, :1, :1, :])  # per-channel only


def test_spatial_params_mode():
    model = CompressionModel(N=32, M=48, spatial_params=True)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(2)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    # noise mode: at init z rounds to all-zero, which would make any head
    # output constant; the noisy z_tilde exercises true spatial variation.
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(3)})
    assert out["sigma"].shape == out["y"].shape
    sigma = np.asarray(out["sigma"])
    assert not np.allclose(sigma, sigma[:, :1, :1, :])  # varies spatially


def test_mix_mode_noise_rate_round_decoder():
    """quant_mode="mix" (Minnen-Singh 2020 fine-tune recipe): likelihoods
    come from the NOISY latents while the decoder sees STE-ROUNDED latents,
    and the rate term keeps a live gradient (no STE dead-zone collapse)."""
    model = CompressionModel(N=32, M=48)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(7)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="mix", train=True,
                      rngs={"noise": jax.random.PRNGKey(11)})
    y_t = np.asarray(out["y_tilde"])
    # rate leg is the noise relaxation: y_tilde is NOT integral
    assert not np.allclose(y_t, np.round(y_t))
    # decoder leg is rounded: x_hat equals the eval-mode reconstruction
    out_eval = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               np.asarray(out_eval["x_hat"]), atol=1e-6)

    # the RATE term still has a gradient through y (the whole point of mix
    # over pure STE-round: p(round(y)) is piecewise constant, p(y+u) is not)
    def rate_only(p):
        o = model.apply(p, x, quant_mode="mix", train=True,
                        rngs={"noise": jax.random.PRNGKey(11)})
        return jnp.mean(o["nll_y"])

    g = jax.grad(rate_only)(params)
    leaves = [np.abs(np.asarray(l)).max() for l in jax.tree.leaves(g)]
    assert max(leaves) > 0.0


def test_round_mode_deterministic_and_integer():
    model = CompressionModel(N=32, M=48)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out1 = model.apply(params, x, quant_mode="round", train=False)
    out2 = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_array_equal(np.asarray(out1["x_hat"]),
                                  np.asarray(out2["x_hat"]))
    y_t = np.asarray(out1["y_tilde"])
    np.testing.assert_array_equal(y_t, np.round(y_t))


@pytest.mark.parametrize("dist", ["mse", "msssim"])
def test_rd_loss_finite_and_composed(dist):
    model = CompressionModel(N=32, M=48)
    params, _ = _init(model, hw=(96, 96))
    x = jnp.asarray(np.random.default_rng(4)
                    .uniform(size=(2, 96, 96, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(5)})
    loss, r, d = rate_distortion_loss(out, x, lambda_rd=100.0, dist=dist)
    assert np.isfinite(float(loss)) and float(r) >= 0.0
    np.testing.assert_allclose(float(loss), 100.0 * float(d) + float(r),
                               rtol=1e-6)


def test_rate_matches_manual_bpp():
    model = CompressionModel(N=32, M=48)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="round", train=False)
    _, r, _ = rate_distortion_loss(out, x, lambda_rd=1.0, dist="mse")
    manual = (np.asarray(out["nll_y"]).sum() + np.asarray(out["nll_z"]).sum()) / (64 * 64)
    np.testing.assert_allclose(float(r), manual, rtol=1e-6)


def test_amp_bfloat16_forward():
    model = CompressionModel(N=32, M=48, dtype=jnp.bfloat16)
    params, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(6)
                    .uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = model.apply(params, x, quant_mode="round", train=False)
    # likelihoods still computed in f32
    assert out["nll_y"].dtype == jnp.float32
    loss, _, _ = rate_distortion_loss(out, x, lambda_rd=10.0, dist="mse")
    assert np.isfinite(float(loss))
