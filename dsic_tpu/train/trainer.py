"""Training loop: epochs over a prefetched loader, periodic logging and
round-mode validation, orbax checkpoints named `alpha{lambda}lambda`.

Control flow matches the reference trainer (train.py:164-238): seed, loaders,
model+Adam, per-step noise-quantized RD loss with grad clip, log every
`log_every`, validate every `val_every` with quant_mode="round", final
checkpoint `alpha{lambda}lambda`. Additions over the reference: resume from
checkpoint, periodic best-val checkpoints (present but commented out in the
reference, train.py:215-225), mesh data-parallel execution, CSV metrics log.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dsic_tpu.config import Config, ckpt_name
from dsic_tpu.train.state import create_train_state
from dsic_tpu.train.steps import (
    make_train_step, make_eval_step, make_sharded_train_step, shard_state)
from dsic_tpu.parallel.mesh import make_mesh, shard_batch
from dsic_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from dsic_tpu.utils.csv_logger import CsvLogger


def validate(eval_step, params, val_loader, mesh=None):
    """Mean (R, D) over the validation set at round quantization
    (train.py:149-162).

    Tail batches whose size does not divide the mesh 'data' axis are
    replicate-padded with row 0 up to the next multiple, and row 0's exact
    contribution is subtracted back out (metric means are linear per image),
    so small validation sets on large meshes stay exact instead of raising
    in shard_batch."""
    tot_r, tot_d, n = 0.0, 0.0, 0
    n_div = int(mesh.shape["data"]) if mesh is not None else 1
    for x in val_loader:
        xb = jnp.asarray(x)
        b = int(xb.shape[0])
        pad = (-b) % n_div
        if mesh is not None and pad:
            xp = jnp.concatenate([xb, jnp.repeat(xb[:1], pad, axis=0)])
            m = eval_step(params, shard_batch(mesh, xp))
            x0 = jnp.repeat(xb[:1], b + pad, axis=0)
            m0 = eval_step(params, shard_batch(mesh, x0))
            tot_r += float(m["R"]) * (b + pad) - float(m0["R"]) * pad
            tot_d += float(m["D"]) * (b + pad) - float(m0["D"]) * pad
        else:
            if mesh is not None:
                xb = shard_batch(mesh, xb)
            m = eval_step(params, xb)
            tot_r += float(m["R"]) * b
            tot_d += float(m["D"]) * b
        n += b
    if n == 0:
        return float("nan"), float("nan")
    return tot_r / n, tot_d / n


class Trainer:
    def __init__(self, cfg: Config, run_name: str = "default_run",
                 use_mesh: bool = False, sample_shape=None,
                 final_ckpt: str | None = None, log_name: str | None = None):
        self.cfg = cfg
        self.run_name = run_name
        # final checkpoint name; defaults to the reference's alpha{λ}lambda,
        # zoo quality sweeps pass e.g. "bmshj2018_q3"
        self.final_ckpt = final_ckpt
        # CSV log filename; zoo sweeps pass "train_log_{family}_q{q}.csv" so
        # logs are greppable by family/quality instead of converted-λ floats
        self.log_name = log_name
        self.ckpt_dir = os.path.join(cfg.LOGGING.ckpt_dir, run_name)
        os.makedirs(self.ckpt_dir, exist_ok=True)

        rng = jax.random.PRNGKey(cfg.TRAIN.seed)
        if sample_shape is None:
            s = cfg.DATA.crop_size
            sample_shape = (1, s, s, 3)
        self.model, self.tx, self.state = create_train_state(cfg, rng,
                                                             sample_shape)
        self.mesh = make_mesh(cfg.PARALLEL.data, cfg.PARALLEL.spatial) \
            if use_mesh else None
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
            self.train_step = make_sharded_train_step(
                self.model, self.tx, cfg.LOSS.lambda_rd, self.mesh,
                dist=cfg.LOSS.dist,
                quant_mode=getattr(cfg.TRAIN, "quant_mode", "noise"))
        else:
            self.train_step = make_train_step(
                self.model, self.tx, cfg.LOSS.lambda_rd, dist=cfg.LOSS.dist,
                quant_mode=getattr(cfg.TRAIN, "quant_mode", "noise"))
        self.eval_step = make_eval_step(self.model, cfg.LOSS.lambda_rd,
                                        dist=cfg.LOSS.dist)
        self.global_step = 0
        self.epoch = 0
        self.best_val_r = float("inf")
        # best-val selection (TRAIN.select == "best") goes by the full
        # validation objective λ·D + R, not R alone (lowest-R would just pick
        # the most-compressed checkpoint regardless of distortion)
        self.best_val_loss = float("inf")
        self._best_path: str | None = None
        self._key = jax.random.PRNGKey(cfg.TRAIN.seed + 1)
        # step count at the start of the current epoch: lets resume re-enter
        # a partially-trained epoch at the right batch offset instead of
        # restarting at the next epoch boundary (which drifts step counts vs
        # a non-preempted run)
        self._epoch_start_step = 0
        self._resume_mid_epoch = False
        self._resumed = False

    # --- checkpointing -----------------------------------------------------

    def save(self, name: str | None = None, best: bool = False) -> str:
        name = name or f"step_{self.global_step:07d}{'_best' if best else ''}"
        path = os.path.join(self.ckpt_dir, name)
        return save_checkpoint(path, self.state, extra={
            "epoch": self.epoch, "step": self.global_step,
            "best_val_R": self.best_val_r,
            "best_val_loss": self.best_val_loss,
            "lambda_rd": self.cfg.LOSS.lambda_rd,
            "epoch_start_step": self._epoch_start_step,
            "noise_key": np.asarray(self._key).tolist()})

    def restore(self, path: str):
        self.state, extra = restore_checkpoint(path, self.state)
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
        self.epoch = int(extra.get("epoch", 0))
        self.global_step = int(extra.get("step", 0))
        self.best_val_r = float(extra.get("best_val_R", float("inf")))
        self.best_val_loss = float(extra.get("best_val_loss", float("inf")))
        if "noise_key" in extra:
            self._key = jnp.asarray(extra["noise_key"], jnp.uint32)
        if "epoch_start_step" in extra:
            self._epoch_start_step = int(extra["epoch_start_step"])
            self._resume_mid_epoch = True
        self._resumed = True
        # recover the newest best-val checkpoint so TRAIN.select == "best"
        # survives preemption even if no further improvement happens
        bests = sorted(d for d in os.listdir(self.ckpt_dir)
                       if d.endswith("_best"))
        if bests:
            self._best_path = os.path.join(self.ckpt_dir, bests[-1])

    # --- the loop ----------------------------------------------------------

    def fit(self, train_loader, val_loader=None, max_steps: int | None = None,
            log_fn=print):
        cfg = self.cfg
        lam = self.cfg.LOSS.lambda_rd
        lam_tag = int(lam) if float(lam).is_integer() else lam
        csv = CsvLogger(os.path.join(self.ckpt_dir,
                                     self.log_name
                                     or f"train_log_lambda{lam_tag}.csv"),
                        ["step", "epoch", "loss", "R_bpp", "D", "msssim",
                         "grad_norm", "sec_per_step"],
                        append=self.global_step > 0)
        t_last = time.perf_counter()
        # mid-epoch resume: re-enter the partial epoch, skipping the batches
        # it already consumed, so step counts match a non-preempted run
        start_epoch = self.epoch + 1
        skip_batches = 0
        if self._resume_mid_epoch:
            self._resume_mid_epoch = False
            consumed = self.global_step - self._epoch_start_step
            if self.epoch >= 1 and consumed > 0:
                start_epoch = self.epoch
                skip_batches = consumed
        if self._resumed and hasattr(train_loader, "skip_epochs"):
            # replay the shuffle stream up to the re-entered epoch so the
            # skipped batches are the ONES ACTUALLY CONSUMED pre-preemption
            # (a fresh Loader would otherwise hand epoch N the 1st shuffle)
            train_loader.skip_epochs(start_epoch - 1)
            self._resumed = False
        try:
            for epoch in range(start_epoch, cfg.TRAIN.epochs + 1):
                self.epoch = epoch
                if skip_batches == 0:
                    self._epoch_start_step = self.global_step
                for x in train_loader:
                    if skip_batches:
                        skip_batches -= 1
                        continue
                    xb = jnp.asarray(x)
                    if self.mesh is not None:
                        xb = shard_batch(self.mesh, xb)
                    self._key, k = jax.random.split(self._key)
                    self.state, metrics = self.train_step(self.state, xb, k)
                    self.global_step += 1

                    if self.global_step % cfg.LOGGING.log_every == 0:
                        m = jax.device_get(metrics)
                        dt = (time.perf_counter() - t_last) / cfg.LOGGING.log_every
                        t_last = time.perf_counter()
                        # 1-D is MS-SSIM only under the msssim distortion
                        is_mss = cfg.LOSS.dist == "msssim"
                        csv.log(step=self.global_step, epoch=epoch,
                                loss=float(m["loss"]), R_bpp=float(m["R"]),
                                D=float(m["D"]),
                                msssim=(1.0 - float(m["D"])) if is_mss
                                else float("nan"),
                                grad_norm=float(m["grad_norm"]),
                                sec_per_step=dt)
                        d_tag = (f"MS-SSIM={1 - float(m['D']):.4f}" if is_mss
                                 else f"MSE={float(m['D']):.5f}")
                        log_fn(f"[{self.run_name}] epoch {epoch} step "
                               f"{self.global_step}: loss={float(m['loss']):.4f} "
                               f"R={float(m['R']):.3f}bpp "
                               f"{d_tag} "
                               f"({dt * 1e3:.0f} ms/step)")

                    if (val_loader is not None
                            and self.global_step % cfg.LOGGING.val_every == 0):
                        val_r, val_d = validate(self.eval_step,
                                                self.state.params, val_loader,
                                                self.mesh)
                        val_loss = lam * val_d + val_r
                        log_fn(f"[step {self.global_step}] val R={val_r:.3f} "
                               f"bpp | val D={val_d:.5f} | "
                               f"val loss={val_loss:.4f}")
                        if val_loss < self.best_val_loss:
                            # a failed best-save must not kill the run (the
                            # save layer already retries transient FS races)
                            # NOR advance best_val_loss past the params
                            # actually on disk
                            try:
                                self._best_path = self.save(best=True)
                                self.best_val_loss = val_loss
                                self.best_val_r = val_r
                            except Exception as e:
                                log_fn(f"WARN: best-checkpoint save failed "
                                       f"({e}); training continues, best "
                                       "params remain the previous save")

                    if max_steps and self.global_step >= max_steps:
                        return self.finalize()
            return self.finalize()
        finally:
            csv.close()

    def finalize(self) -> str:
        """Save the final lambda-named checkpoint (train.py:227-235). With
        TRAIN.select == "best" the params are taken from the lowest-val-loss
        checkpoint seen during fit (falling back to final-step params if
        validation never ran)."""
        if (getattr(self.cfg.TRAIN, "select", "last") == "best"
                and self._best_path is not None):
            best_state, extra = restore_checkpoint(self._best_path, self.state)
            if self.mesh is not None:
                best_state = shard_state(best_state, self.mesh)
            self.state = best_state
            self.global_step = int(extra.get("step", self.global_step))
            self.epoch = int(extra.get("epoch", self.epoch))
        path = self.save(
            name=self.final_ckpt or ckpt_name(self.cfg.LOSS.lambda_rd))
        return path
