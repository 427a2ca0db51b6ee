"""Spatial (H-sharded) training via shard_map + explicit halos
(parallel/spatial.py): halo ops must match the flax modules bit-for-bit-ish,
the full (data x spatial) train step must match the data-parallel step, and
the GSPMD bug that motivated all of this is pinned as a documented repro."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dsic_tpu.config import Config
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.models.layers import (
    AnalysisTransform, SynthesisTransform, conv, conv_t)
from dsic_tpu.parallel.mesh import (
    DATA_AXIS, SPATIAL_AXIS, make_mesh, shard_batch)
from dsic_tpu.parallel.spatial import (
    halo_conv, halo_conv_t, spatial_analysis, spatial_synthesis,
    make_spatial_train_step)
from dsic_tpu.train.state import TrainState, create_train_state
from dsic_tpu.train.steps import make_sharded_train_step, shard_state


def _tiny_cfg():
    import dataclasses
    cfg = Config()
    return cfg.replace(MODEL=dataclasses.replace(cfg.MODEL, N=16, M=24),
                       TRAIN=dataclasses.replace(cfg.TRAIN, amp=False))


def _sp_map(fn, n_sp):
    mesh = make_mesh(1, n_sp)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, SPATIAL_AXIS, None, None),),
        out_specs=P(None, SPATIAL_AXIS, None, None))), mesh


@pytest.mark.parametrize("k,stride", [(3, 1), (5, 2), (5, 1)])
@pytest.mark.parametrize("n_sp", [2, 4])
def test_halo_conv_matches_flax(k, stride, n_sp):
    rng = jax.random.PRNGKey(k * 10 + stride)
    x = jax.random.normal(rng, (2, 32, 16, 5))
    mod = conv(7, k, stride)
    params = mod.init(jax.random.PRNGKey(1), x)
    want = mod.apply(params, x)
    kern = params["params"]["kernel"]
    bias = params["params"]["bias"]

    fn, mesh = _sp_map(lambda xl: halo_conv(xl, kern, bias, stride), n_sp)
    got = fn(jax.device_put(x, NamedSharding(
        mesh, P(None, SPATIAL_AXIS, None, None))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_sp", [2, 4])
def test_halo_conv_t_matches_flax(n_sp):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 6))
    mod = conv_t(9)
    params = mod.init(jax.random.PRNGKey(1), x)
    want = mod.apply(params, x)
    assert want.shape == (2, 16, 24, 9)  # exact 2x upsample
    kern = params["params"]["kernel"]
    bias = params["params"]["bias"]

    fn, mesh = _sp_map(lambda xl: halo_conv_t(xl, kern, bias), n_sp)
    got = fn(jax.device_put(x, NamedSharding(
        mesh, P(None, SPATIAL_AXIS, None, None))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_spatial_transforms_match_modules():
    """spatial_analysis / spatial_synthesis (manual halo path) == the flax
    AnalysisTransform / SynthesisTransform, pinning the mirrored layer specs."""
    x = jnp.asarray(synthetic_patches(2, (64, 64), seed=0))
    ga = AnalysisTransform(16, 24)
    pa = ga.init(jax.random.PRNGKey(0), x)
    y = ga.apply(pa, x)
    gs = SynthesisTransform(16, 24)
    ps = gs.init(jax.random.PRNGKey(1), y)
    xh = gs.apply(ps, y)

    fa, mesh = _sp_map(lambda xl: spatial_analysis(pa["params"], xl), 2)
    sh = NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))
    got_y = fa(jax.device_put(x, sh))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(y),
                               rtol=1e-5, atol=1e-5)

    fs, mesh = _sp_map(lambda yl: spatial_synthesis(ps["params"], yl), 2)
    got_xh = fs(jax.device_put(y, NamedSharding(
        mesh, P(None, SPATIAL_AXIS, None, None))))
    np.testing.assert_allclose(np.asarray(got_xh), np.asarray(xh),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dist", ["mse", "msssim"])
def test_spatial_train_step_matches_data_parallel(dist):
    """The 4x2 (data x spatial) shard_map step produces the same loss, grad
    norm and updated params as the plain 8x1 data-parallel GSPMD step. Plain
    SGD keeps the param delta LINEAR in the gradient (Adam's first step is
    ~lr*sign(g), which would amplify reduction-order noise on near-zero
    gradients into ±lr flips)."""
    import optax
    cfg = _tiny_cfg()
    model, _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                         sample_shape=(1, 64, 64, 3))
    tx = optax.sgd(1e-2)
    state = TrainState(params=state.params, opt_state=tx.init(state.params),
                       step=state.step)
    x = jnp.asarray(synthetic_patches(8, (64, 64), seed=3))
    key = jax.random.PRNGKey(9)

    mesh_dp = make_mesh(8, 1)
    dp = make_sharded_train_step(model, tx, 20.0, mesh_dp, dist=dist,
                                 donate=False)
    s1, m1 = dp(shard_state(state, mesh_dp), shard_batch(mesh_dp, x), key)

    mesh_sp = make_mesh(4, 2)
    sp = make_spatial_train_step(model, tx, 20.0, mesh_sp, dist=dist,
                                 donate=False)
    s2, m2 = sp(shard_state(state, mesh_sp),
                shard_batch(mesh_sp, x, spatial=True), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_spatial_step_routed_from_make_sharded_train_step():
    """make_sharded_train_step(spatial=True) must route to the shard_map
    implementation and run end-to-end on a (2, 2) mesh."""
    cfg = _tiny_cfg()
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          sample_shape=(1, 64, 64, 3))
    mesh = make_mesh(2, 2)
    step = make_sharded_train_step(model, tx, 20.0, mesh, dist="msssim",
                                   spatial=True, donate=False)
    x = shard_batch(mesh, jnp.asarray(synthetic_patches(4, (64, 64), seed=0)),
                    spatial=True)
    new_state, m = step(shard_state(state, mesh), x, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1


def test_spatial_step_compiles_without_involuntary_remat(capfd):
    """Round-1 VERDICT: the GSPMD 4x2 step triggered '[SPMD] Involuntary full
    rematerialization' on the h_s gradient. The shard_map step is manually
    partitioned, so the SPMD partitioner must never fall back to
    replicate-then-repartition. Guards at compile time: the warning is
    emitted on stderr by spmd_partitioner.cc during compilation."""
    cfg = _tiny_cfg()
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          sample_shape=(1, 64, 64, 3))
    mesh = make_mesh(4, 2)
    step = make_sharded_train_step(model, tx, 20.0, mesh, dist="msssim",
                                   spatial=True, donate=False)
    x = shard_batch(mesh, jnp.asarray(synthetic_patches(8, (64, 64), seed=0)),
                    spatial=True)
    capfd.readouterr()  # drop anything earlier tests left on the C-level fds
    compiled = step.lower(shard_state(state, mesh), x,
                          jax.random.PRNGKey(1)).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err
    assert compiled is not None


@pytest.mark.xfail(strict=False, reason=(
    "Documents the XLA SPMD partitioner bug (jax 0.9, CPU backend, GSPMD and "
    "Shardy) that makes GSPMD unusable for H-sharded training of this model: "
    "conv param gradients come out exactly n_data x too large when the "
    "bottleneck has > 16 channels. If this starts passing, XLA fixed it — "
    "consider re-evaluating the GSPMD path."))
def test_gspmd_spatial_grad_known_bad():
    import flax.linen as nn

    class AE(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = x
            for _ in range(3):
                y = nn.Conv(16, (5, 5), strides=(2, 2),
                            padding=((2, 2), (2, 2)))(y)
            y = nn.Conv(24, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)))(y)
            for _ in range(3):
                y = nn.ConvTranspose(16, (5, 5), strides=(2, 2),
                                     padding=((2, 3), (2, 3)))(y)
            return nn.ConvTranspose(3, (5, 5), strides=(2, 2),
                                    padding=((2, 3), (2, 3)))(y)

    x = jnp.asarray(synthetic_patches(8, (64, 64), seed=3))
    mod = AE()
    params = mod.init(jax.random.PRNGKey(0), x)

    def f(p, xin):
        return jnp.mean((mod.apply(p, xin) - xin[..., :3]) ** 2)

    g_true = jax.jit(jax.grad(f))(params, x)
    mesh = make_mesh(4, 2)
    xsh = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    g = jax.jit(jax.grad(f), in_shardings=(None, xsh))(
        params, jax.device_put(x, xsh))
    for a, b in zip(jax.tree.leaves(g_true), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-7)
