"""Jitted train/eval steps, single-device and mesh-sharded.

The hot loop matches the reference semantics (train.py:191-204): forward with
noise quantization, RD loss, grad-clip 1.0, Adam. On a mesh, the batch is
sharded over the 'data' axis and params are replicated; XLA inserts the
gradient all-reduce over ICI (SURVEY.md section 2 parallelism note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from dsic_tpu.models import rate_distortion_loss
from dsic_tpu.parallel.mesh import batch_sharding, replicated
from dsic_tpu.train.state import TrainState


def make_train_step(model, tx, lambda_rd: float, dist: str = "msssim",
                    donate: bool = True, quant_mode: str = "noise"):
    """Returns jitted (state, x, key) -> (state, metrics dict).
    ``quant_mode="round"`` trains through the STE rounding path (the
    fine-tune stage; TrainConfig.quant_mode)."""

    def step(state: TrainState, x: jax.Array, key: jax.Array):
        if x.dtype == jnp.uint8:  # wire format: normalize on device
            x = x.astype(jnp.float32) * (1.0 / 255.0)

        def loss_fn(params):
            out = model.apply(params, x, quant_mode=quant_mode, train=True,
                              rngs={"noise": key})
            loss, r, d = rate_distortion_loss(out, x, lambda_rd=lambda_rd,
                                              dist=dist)
            return loss, (r, d)

        (loss, (r, d)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(tx, grads)
        metrics = {"loss": loss, "R": r, "D": d, "grad_norm": gnorm}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, lambda_rd: float, dist: str = "msssim"):
    """Round-quantization validation step (train.py:149-162)."""

    def step(params, x: jax.Array):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        out = model.apply(params, x, quant_mode="round", train=False)
        loss, r, d = rate_distortion_loss(out, x, lambda_rd=lambda_rd,
                                          dist=dist)
        return {"loss": loss, "R": r, "D": d}

    return jax.jit(step)


def make_sharded_train_step(model, tx, lambda_rd: float, mesh,
                            dist: str = "msssim", spatial: bool = False,
                            donate: bool = True, quant_mode: str = "noise"):
    """Mesh-parallel train step. spatial=False: batch sharded over 'data',
    params/opt state replicated, gradient all-reduce inserted by XLA (GSPMD —
    proven numerically exact, tests/test_sharding.py). spatial=True: H is
    additionally sharded over 'spatial' via the shard_map + explicit-halo
    implementation in parallel/spatial.py — GSPMD must NOT be used there: the
    XLA SPMD partitioner emits conv gradients exactly n_data x too large for
    this model's H-sharded backward (see parallel/spatial.py docstring and
    tests/test_spatial_shardmap.py for the pure-flax repro)."""
    if spatial:
        from dsic_tpu.parallel.spatial import make_spatial_train_step
        return make_spatial_train_step(model, tx, lambda_rd, mesh,
                                       dist=dist, donate=donate)

    def step(state: TrainState, x: jax.Array, key: jax.Array):
        if x.dtype == jnp.uint8:  # wire format: normalize on device
            x = x.astype(jnp.float32) * (1.0 / 255.0)

        def loss_fn(params):
            out = model.apply(params, x, quant_mode=quant_mode, train=True,
                              rngs={"noise": key})
            loss, r, d = rate_distortion_loss(out, x, lambda_rd=lambda_rd,
                                              dist=dist)
            return loss, (r, d)

        (loss, (r, d)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(tx, grads)
        return new_state, {"loss": loss, "R": r, "D": d, "grad_norm": gnorm}

    rep = replicated(mesh)
    xsh = batch_sharding(mesh, spatial=spatial)
    return jax.jit(
        step,
        in_shardings=(rep, xsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def shard_state(state: TrainState, mesh) -> TrainState:
    """Replicate a train state across the mesh."""
    return jax.device_put(state, replicated(mesh))
