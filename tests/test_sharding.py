"""Mesh / sharding: data-parallel train step on an 8-device CPU mesh must
(a) compile and run, (b) produce numerics matching the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.parallel.mesh import make_mesh, shard_batch, batch_sharding
from dsic_tpu.train.state import create_train_state
from dsic_tpu.train.steps import (
    make_train_step, make_sharded_train_step, shard_state)


def _tiny_cfg():
    import dataclasses
    cfg = Config()
    return cfg.replace(MODEL=dataclasses.replace(cfg.MODEL, N=16, M=24),
                       TRAIN=dataclasses.replace(cfg.TRAIN, amp=False))


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "spatial": 2}


def test_data_parallel_step_matches_single_device():
    cfg = _tiny_cfg()
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          sample_shape=(1, 32, 32, 3))
    x = jnp.asarray(synthetic_patches(8, (32, 32), seed=0))
    key = jax.random.PRNGKey(7)

    single = make_train_step(model, tx, 20.0, dist="mse", donate=False)
    s1, m1 = single(state, x, key)

    mesh = make_mesh(8, 1)
    sharded = make_sharded_train_step(model, tx, 20.0, mesh, dist="mse",
                                      donate=False)
    state_r = shard_state(state, mesh)
    xs = shard_batch(mesh, x)
    s2, m2 = sharded(state_r, xs, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    leaves1 = jax.tree.leaves(s1.params)
    leaves2 = jax.tree.leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_spatial_partitioning_compiles():
    """H-sharded forward over a (1, 2) mesh — GSPMD must insert conv halo
    exchanges and produce the same result as unsharded."""
    cfg = _tiny_cfg()
    model, _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                         sample_shape=(1, 64, 64, 3))
    x = jnp.asarray(synthetic_patches(2, (64, 64), seed=1))

    def fwd(params, x):
        out = model.apply(params, x, quant_mode="round", train=False)
        return out["x_hat"], out["nll_y"]

    want_xh, want_nll = jax.jit(fwd)(state.params, x)

    mesh = make_mesh(1, 2)
    xsh = batch_sharding(mesh, spatial=True)
    fwd_sp = jax.jit(fwd, in_shardings=(None, xsh))
    got_xh, got_nll = fwd_sp(state.params, shard_batch(mesh, x, spatial=True))
    np.testing.assert_allclose(np.asarray(got_xh), np.asarray(want_xh),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_nll), np.asarray(want_nll),
                               atol=2e-4)
