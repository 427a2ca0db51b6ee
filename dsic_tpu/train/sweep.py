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

This is a first-class long-job trainer (the reference's train.py:207-235
cadence): per-λ CSV logs, per-λ best-validation-loss parameter tracking
(device-side masked update over the stacked pytree), and periodic
kill-safe checkpoints of the whole sweep (`sweep_state/`) that
`train_sweep_vmapped` auto-resumes from — a preempted 8000-step sweep
re-enters its partial epoch at the right batch offset with the same
shuffle/augmentation/noise streams, matching an uninterrupted run's step
count (tests/test_sweep.py kill-and-resume test).

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
from dsic_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from dsic_tpu.utils.csv_logger import CsvLogger


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
                          donate: bool = True, quant_mode: str = "noise"):
    """(stacked_state, x, key) -> (stacked_state, per-λ metrics). The batch
    is SHARED across λ models (the reference's jobs iterate the same
    dataset); the noise rng is split per model. ``quant_mode="round"``
    trains through the STE rounding path (the fine-tune stage)."""
    lam_arr = jnp.asarray(lambdas, jnp.float32)
    n = len(lambdas)

    def one_model(state: TrainState, lam, key, x):
        def loss_fn(params):
            out = model.apply(params, x, quant_mode=quant_mode, train=True,
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


@jax.jit
def _select_best(best_params, cur_params, improved_mask):
    """Per-λ masked update of the stacked best-params pytree: rows of
    ``cur_params`` where ``improved_mask`` is True replace ``best_params``."""
    def upd(b, c):
        m = improved_mask.reshape((-1,) + (1,) * (c.ndim - 1))
        return jnp.where(m, c, b)
    return jax.tree.map(upd, best_params, cur_params)


def _probe_sample_shape(train_loader) -> tuple:
    """Static (1, H, W, C) init shape WITHOUT consuming the loader (consuming
    next(iter(loader)) would advance the shuffle stream and tear up a
    prefetch pipeline — the batch-order stream must stay identical to the
    sequential trainer's)."""
    ds = getattr(train_loader, "ds", None)
    if ds is not None and hasattr(ds, "sample_shape"):
        return (1, *ds.sample_shape())
    first = next(iter(train_loader))  # plain-iterable fallback (tests)
    return (1, *first.shape[1:])


class SweepTrainer:
    """Stateful driver for the λ-vmapped sweep (mirrors Trainer's
    save/restore semantics: noise key, epoch offset, mid-epoch batch skip,
    best-val tracking — train.py:207-235 cadence)."""

    SWEEP_CKPT = "sweep_state"

    def __init__(self, cfg: Config, lambdas, run_name: str = "sweep",
                 sample_shape=(1, 128, 128, 3), ckpt_names=None,
                 sweep_ckpt: str | None = None):
        """ckpt_names: per-λ final checkpoint names (default the reference's
        alpha{λ}lambda). A ZOO QUALITY sweep passes e.g. ["bmshj2018_q1",
        ...] plus a distinct ``sweep_ckpt`` so concurrent/successive grouped
        sweeps under one run dir don't collide — every quality of one
        (N, M) group trains in ONE vmapped step, like the flagship λ grid."""
        self.cfg = cfg
        self.lambdas = list(lambdas)
        self.run_name = run_name
        self.ckpt_names = list(ckpt_names) if ckpt_names else None
        if self.ckpt_names and len(self.ckpt_names) != len(self.lambdas):
            raise ValueError("ckpt_names must match lambdas")
        if sweep_ckpt:
            self.SWEEP_CKPT = sweep_ckpt
        self.ckpt_dir = os.path.join(cfg.LOGGING.ckpt_dir, run_name)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.model, self.tx, self.state = init_sweep_state(
            cfg, self.lambdas, jax.random.PRNGKey(cfg.TRAIN.seed),
            sample_shape)
        self.train_step = make_sweep_train_step(
            self.model, self.tx, self.lambdas, dist=cfg.LOSS.dist,
            quant_mode=getattr(cfg.TRAIN, "quant_mode", "noise"))
        self.eval_step = make_sweep_eval_step(self.model, self.lambdas,
                                              dist=cfg.LOSS.dist)
        # stacked; per-λ masked updates. Copied (not aliased): the train step
        # DONATES the state, which would invalidate aliased init buffers.
        self.best_params = jax.tree.map(jnp.copy, self.state.params)
        self.best_val = np.full(len(self.lambdas), np.inf, np.float32)
        self.best_step = np.zeros(len(self.lambdas), np.int64)
        self.key = jax.random.PRNGKey(cfg.TRAIN.seed + 1)
        self.global_step = 0
        self.epoch = 0
        self._epoch_start_step = 0
        self._resume_mid_epoch = False
        self._resumed = False

    def init_params_from(self, ckpt_dir: str, names=None) -> None:
        """Seed the stacked sweep params from existing per-λ checkpoints
        (the STE-round FINE-TUNE stage: prior noise-trained params, fresh
        optimizer state and schedule). ``names`` defaults to this sweep's
        own checkpoint names, so a fine-tune sweep over the same grid picks
        up exactly the checkpoints its predecessor wrote."""
        names = names or self.ckpt_names or [ckpt_name(l)
                                             for l in self.lambdas]
        if len(names) != len(self.lambdas):
            raise ValueError("init_from names must match lambdas")
        template = unstack_state(self.state, 0)
        rows = []
        for nm in names:
            st_r, _ = restore_checkpoint(os.path.join(ckpt_dir, nm),
                                         template)
            rows.append(st_r.params)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
        self.state = TrainState(params=stacked,
                                opt_state=self.state.opt_state,
                                step=self.state.step)
        self.best_params = jax.tree.map(jnp.copy, stacked)

    # --- checkpointing ----------------------------------------------------

    def save_sweep(self) -> str:
        path = os.path.join(self.ckpt_dir, self.SWEEP_CKPT)
        payload_state = {
            "sweep": jax.device_get(self.state),
            "best_params": jax.device_get(self.best_params),
        }
        return save_checkpoint(path, payload_state, extra={
            "epoch": self.epoch, "step": self.global_step,
            "epoch_start_step": self._epoch_start_step,
            "best_val": self.best_val, "best_step": self.best_step,
            "noise_key": np.asarray(self.key).tolist(),
            "lambdas": np.asarray(self.lambdas, np.float64)})

    def restore_sweep(self, path: str | None = None) -> bool:
        path = path or os.path.join(self.ckpt_dir, self.SWEEP_CKPT)
        if not os.path.isdir(path):
            return False
        template = {"sweep": self.state, "best_params": self.best_params}
        restored, extra = restore_checkpoint(path, template)
        saved_lams = np.asarray(extra.get("lambdas", self.lambdas))
        if (len(saved_lams) != len(self.lambdas)
                or not np.allclose(saved_lams, np.asarray(self.lambdas,
                                                          np.float64))):
            raise ValueError(
                f"sweep checkpoint at {path} was trained on lambdas "
                f"{saved_lams.tolist()}, not {self.lambdas}")
        self.state = restored["sweep"]
        self.best_params = restored["best_params"]
        self.best_val = np.asarray(extra.get(
            "best_val", np.full(len(self.lambdas), np.inf)), np.float32)
        self.best_step = np.asarray(extra.get(
            "best_step", np.zeros(len(self.lambdas))), np.int64)
        self.epoch = int(extra.get("epoch", 0))
        self.global_step = int(extra.get("step", 0))
        if "noise_key" in extra:
            self.key = jnp.asarray(extra["noise_key"], jnp.uint32)
        self._epoch_start_step = int(extra.get("epoch_start_step", 0))
        self._resume_mid_epoch = True
        self._resumed = True
        return True

    # --- the loop ---------------------------------------------------------

    def fit(self, train_loader, val_loader=None, max_steps: int | None = None,
            log_fn=print) -> list[str]:
        cfg = self.cfg
        csvs = {}
        for i, lam in enumerate(self.lambdas):
            tag = int(lam) if float(lam).is_integer() else lam
            log_name = (f"train_log_{self.ckpt_names[i]}.csv"
                        if self.ckpt_names else f"train_log_lambda{tag}.csv")
            csvs[lam] = CsvLogger(
                os.path.join(self.ckpt_dir, log_name),
                ["step", "epoch", "loss", "R_bpp", "D", "msssim",
                 "grad_norm", "sec_per_step"],
                append=self.global_step > 0)
        t_last = time.perf_counter()
        start_epoch = self.epoch + 1
        skip_batches = 0
        if self._resume_mid_epoch:
            self._resume_mid_epoch = False
            consumed = self.global_step - self._epoch_start_step
            if self.epoch >= 1 and consumed > 0:
                start_epoch = self.epoch
                skip_batches = consumed
        if self._resumed and hasattr(train_loader, "skip_epochs"):
            train_loader.skip_epochs(start_epoch - 1)
            self._resumed = False
        is_mss = cfg.LOSS.dist == "msssim"
        try:
            for epoch in range(start_epoch, cfg.TRAIN.epochs + 1):
                self.epoch = epoch
                if skip_batches == 0:
                    self._epoch_start_step = self.global_step
                for x in train_loader:
                    if skip_batches:
                        skip_batches -= 1
                        continue
                    self.key, k = jax.random.split(self.key)
                    self.state, metrics = self.train_step(
                        self.state, jnp.asarray(x), k)
                    self.global_step += 1

                    if self.global_step % cfg.LOGGING.log_every == 0:
                        m = jax.device_get(metrics)
                        dt = ((time.perf_counter() - t_last)
                              / cfg.LOGGING.log_every)
                        t_last = time.perf_counter()
                        for i, lam in enumerate(self.lambdas):
                            d_i = float(np.asarray(m["D"])[i])
                            csvs[lam].log(
                                step=self.global_step, epoch=epoch,
                                loss=float(np.asarray(m["loss"])[i]),
                                R_bpp=float(np.asarray(m["R"])[i]), D=d_i,
                                msssim=(1.0 - d_i) if is_mss else float("nan"),
                                grad_norm=float(np.asarray(m["grad_norm"])[i]),
                                sec_per_step=dt)
                        log_fn(f"[{self.run_name}] epoch {epoch} step "
                               f"{self.global_step} ({dt * 1e3:.0f} ms/step, "
                               f"all {len(self.lambdas)} λ): "
                               f"loss={np.round(np.asarray(m['loss']), 2).tolist()} "
                               f"R={np.round(np.asarray(m['R']), 3).tolist()}")

                    if (val_loader is not None and self.global_step
                            % cfg.LOGGING.val_every == 0):
                        self._validate_and_track(val_loader, log_fn)
                        # kill-safety save: a failure here (the save layer
                        # already retries transient FS races) must not kill
                        # the very run it exists to protect — best params
                        # live on device and re-save at the next cadence
                        try:
                            self.save_sweep()
                        except Exception as e:
                            log_fn(f"WARN: periodic sweep save failed ({e}); "
                                   "training continues")

                    if max_steps and self.global_step >= max_steps:
                        return self._finalize(val_loader, log_fn)
            return self._finalize(val_loader, log_fn)
        finally:
            for c in csvs.values():
                c.close()

    def _validate_and_track(self, val_loader, log_fn) -> np.ndarray:
        """Per-λ mean val loss; masked-update the stacked best params."""
        sums, n = None, 0
        for xv in val_loader:
            mv = jax.device_get(self.eval_step(self.state.params,
                                               jnp.asarray(xv)))
            b = xv.shape[0]
            cur = np.asarray(mv["loss"], np.float64) * b
            sums = cur if sums is None else sums + cur
            n += b
        if not n:
            return np.full(len(self.lambdas), np.nan)
        val_loss = (sums / n).astype(np.float32)
        improved = val_loss < self.best_val
        if improved.any():
            self.best_params = _select_best(self.best_params,
                                            self.state.params,
                                            jnp.asarray(improved))
            self.best_val = np.where(improved, val_loss, self.best_val)
            self.best_step = np.where(improved, self.global_step,
                                      self.best_step)
        log_fn(f"[step {self.global_step}] val loss per λ: "
               f"{np.round(val_loss, 4).tolist()} "
               f"(best@{self.best_step.tolist()})")
        return val_loss

    def _finalize(self, val_loader, log_fn) -> list[str]:
        """One `alpha{λ}lambda` checkpoint per λ. TRAIN.select == "best"
        takes each λ's lowest-val-loss params (tracked per λ); "last" takes
        final-step params (reference train.py:227-235)."""
        if val_loader is not None:  # rank the final params too
            self._validate_and_track(val_loader, log_fn)
        self.save_sweep()
        use_best = (getattr(self.cfg.TRAIN, "select", "last") == "best"
                    and np.isfinite(self.best_val).all())
        src_params = self.best_params if use_best else self.state.params
        paths = []
        for i, lam in enumerate(self.lambdas):
            st = TrainState(
                params=jax.device_get(
                    jax.tree.map(lambda a: a[i], src_params)),
                opt_state=jax.device_get(
                    jax.tree.map(lambda a: a[i], self.state.opt_state)),
                step=jnp.asarray(self.global_step, jnp.int32))
            path = os.path.join(self.ckpt_dir,
                                self.ckpt_names[i] if self.ckpt_names
                                else ckpt_name(lam))
            # int flag, not a string: orbax StandardCheckpointer rejects str
            extra = {"epoch": self.epoch, "step": self.global_step,
                     "lambda_rd": float(lam),
                     "selected_best": int(use_best)}
            if use_best:
                extra["best_val_loss"] = float(self.best_val[i])
                extra["best_step"] = int(self.best_step[i])
            paths.append(save_checkpoint(path, st, extra=extra))
        return paths


def train_sweep_vmapped(cfg: Config, lambdas, train_loader, val_loader=None,
                        run_name: str = "sweep", max_steps: int | None = None,
                        log_fn=print, resume: bool = True, ckpt_names=None,
                        sweep_ckpt: str | None = None,
                        init_from: str | None = None) -> list[str]:
    """Drive the vmapped sweep; saves one `alpha{λ}lambda` checkpoint per λ
    (or ``ckpt_names``). Auto-resumes from
    `{ckpt_dir}/{run_name}/{sweep_ckpt or "sweep_state"}` when present
    (resume=True). ``init_from``: a checkpoint run directory whose per-λ
    checkpoints seed the params (fine-tune stage; a mid-run sweep_state
    resume takes precedence). Returns the checkpoint paths."""
    trainer = SweepTrainer(cfg, lambdas, run_name=run_name,
                           sample_shape=_probe_sample_shape(train_loader),
                           ckpt_names=ckpt_names, sweep_ckpt=sweep_ckpt)
    if resume and trainer.restore_sweep():
        log_fn(f"[{run_name}] resumed sweep at step {trainer.global_step} "
               f"(epoch {trainer.epoch})")
    elif init_from:
        trainer.init_params_from(init_from)
        log_fn(f"[{run_name}] params seeded from {init_from} "
               f"({len(trainer.lambdas)} checkpoints)")
    return trainer.fit(train_loader, val_loader, max_steps=max_steps,
                       log_fn=log_fn)
