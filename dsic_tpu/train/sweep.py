"""λ-vmapped sweep: train EVERY lambda's model simultaneously in one jitted
step.

The reference trains its 8-point λ grid as 8 independent SLURM jobs
(submit.sbatch:24-31, one GPU each). The TPU-idiomatic replacement
(SURVEY.md §2 parallelism note: "one mesh per λ job, or a λ-vmapped sweep")
is to stack the 8 models' parameters along a leading axis and `jax.vmap`
the whole (forward, loss, per-model grad clip, Adam update) over it: one
compile, one device, all λs advancing per step, with XLA batching the
per-model convolutions into larger MXU-friendly launches. Each model's
training math is IDENTICAL to the sequential path (per-model grad clip and
optimizer state — verified by tests/test_sweep.py equivalence against
make_train_step).

Checkpoints unstack back into the reference's `alpha{λ}lambda` layout, so
the entire eval suite consumes a vmapped sweep unchanged.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dsic_tpu.config import Config, ckpt_name
from dsic_tpu.models import rate_distortion_loss
from dsic_tpu.train.state import (
    TrainState, build_model, create_train_state, make_optimizer)
from dsic_tpu.utils.checkpoint import save_checkpoint


def stack_states(states: list[TrainState]) -> TrainState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(state: TrainState, i: int) -> TrainState:
    return jax.tree.map(lambda a: a[i], state)


def init_sweep_state(cfg: Config, lambdas, rng, sample_shape):
    """One model per λ (independent seeds), stacked along a leading axis."""
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    states = []
    for i in range(len(lambdas)):
        _, _, st = create_train_state(cfg, jax.random.fold_in(rng, i),
                                      sample_shape)
        states.append(st)
    return model, tx, stack_states(states)


def make_sweep_train_step(model, tx, lambdas, dist: str = "msssim",
                          donate: bool = True):
    """(stacked_state, x, key) -> (stacked_state, per-λ metrics). The batch
    is SHARED across λ models (the reference's jobs iterate the same
    dataset); the noise rng is split per model."""
    lam_arr = jnp.asarray(lambdas, jnp.float32)
    n = len(lambdas)

    def one_model(state: TrainState, lam, key, x):
        def loss_fn(params):
            out = model.apply(params, x, quant_mode="noise", train=True,
                              rngs={"noise": key})
            loss, r, d = rate_distortion_loss(out, x, lambda_rd=lam,
                                              dist=dist)
            return loss, (r, d)

        (loss, (r, d)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(tx, grads)
        return new_state, {"loss": loss, "R": r, "D": d, "grad_norm": gnorm}

    def step(state: TrainState, x: jax.Array, key: jax.Array):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        keys = jax.random.split(key, n)
        return jax.vmap(one_model, in_axes=(0, 0, 0, None))(
            state, lam_arr, keys, x)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sweep_eval_step(model, lambdas, dist: str = "msssim"):
    lam_arr = jnp.asarray(lambdas, jnp.float32)

    def one_model(params, lam, x):
        out = model.apply(params, x, quant_mode="round", train=False)
        loss, r, d = rate_distortion_loss(out, x, lambda_rd=lam, dist=dist)
        return {"loss": loss, "R": r, "D": d}

    def step(state_params, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        return jax.vmap(one_model, in_axes=(0, 0, None))(state_params,
                                                         lam_arr, x)

    return jax.jit(step)


def train_sweep_vmapped(cfg: Config, lambdas, train_loader, val_loader=None,
                        run_name: str = "sweep", max_steps: int | None = None,
                        log_fn=print) -> list[str]:
    """Drive the vmapped sweep; saves one `alpha{λ}lambda` checkpoint per λ.
    Returns the checkpoint paths."""
    ckpt_dir = os.path.join(cfg.LOGGING.ckpt_dir, run_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    first = next(iter(train_loader))
    model, tx, state = init_sweep_state(
        cfg, lambdas, jax.random.PRNGKey(cfg.TRAIN.seed),
        (1, *first.shape[1:]))
    train_step = make_sweep_train_step(model, tx, lambdas,
                                       dist=cfg.LOSS.dist)
    eval_step = make_sweep_eval_step(model, lambdas, dist=cfg.LOSS.dist)

    key = jax.random.PRNGKey(cfg.TRAIN.seed + 1)
    global_step = 0
    t_last = time.perf_counter()
    for epoch in range(1, cfg.TRAIN.epochs + 1):
        for x in train_loader:
            key, k = jax.random.split(key)
            state, metrics = train_step(state, jnp.asarray(x), k)
            global_step += 1
            if global_step % cfg.LOGGING.log_every == 0:
                m = jax.device_get(metrics)
                dt = (time.perf_counter() - t_last) / cfg.LOGGING.log_every
                t_last = time.perf_counter()
                log_fn(f"[{run_name}] epoch {epoch} step {global_step} "
                       f"({dt * 1e3:.0f} ms/step, all {len(lambdas)} λ): "
                       f"loss={np.round(np.asarray(m['loss']), 2).tolist()} "
                       f"R={np.round(np.asarray(m['R']), 3).tolist()}")
            if (val_loader is not None
                    and global_step % cfg.LOGGING.val_every == 0):
                rs = []
                for xv in val_loader:
                    mv = eval_step(state.params, jnp.asarray(xv))
                    rs.append(np.asarray(mv["R"]))
                if rs:
                    log_fn(f"[step {global_step}] val R per λ: "
                           f"{np.round(np.mean(rs, axis=0), 3).tolist()}")
            if max_steps and global_step >= max_steps:
                return _save_all(ckpt_dir, state, lambdas, epoch, global_step)
    return _save_all(ckpt_dir, state, lambdas, cfg.TRAIN.epochs, global_step)


def _save_all(ckpt_dir, state: TrainState, lambdas, epoch, step) -> list[str]:
    paths = []
    for i, lam in enumerate(lambdas):
        st = jax.device_get(unstack_state(state, i))
        # per-model step counter equals the shared loop counter
        st = TrainState(params=st.params, opt_state=st.opt_state,
                        step=jnp.asarray(step, jnp.int32))
        path = os.path.join(ckpt_dir, ckpt_name(lam))
        paths.append(save_checkpoint(path, st, extra={
            "epoch": epoch, "step": step, "lambda_rd": float(lam)}))
    return paths
