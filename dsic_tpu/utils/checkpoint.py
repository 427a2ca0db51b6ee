"""Checkpoint save/restore via orbax — the reference only saves final
checkpoints named `alpha{lambda}lambda.pt` with {model, opt, epoch, step}
(train.py:227-235) and has NO resume path; here save/restore are symmetric so
training survives preemption (SURVEY.md section 5)."""

from __future__ import annotations

import os
import shutil
import time
import warnings
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, extra: dict | None = None,
                    retries: int = 2) -> str:
    """Save a pytree (TrainState or params) plus optional metadata dict.
    ``path`` is a directory (orbax format). Returns the path.

    Retries transient filesystem races: orbax's async OCDBT commit
    intermittently fails on this class of VM filesystem with
    ``NOT_FOUND ... Failed to rename ... .__lock [ENOENT]`` inside its own
    tmp directory (observed twice across multi-hour sweep runs, each time
    killing an 8000-step training job at a PERIODIC kill-safety save — the
    exact save whose whole purpose is surviving faults). A failed attempt
    removes the poisoned ``*.orbax-checkpoint-tmp`` dir and re-saves; the
    committed final directory is only ever replaced atomically, so a failed
    attempt never corrupts the previous good checkpoint."""
    path = os.path.abspath(path)
    payload = {"state": jax.device_get(state)}
    if extra:
        payload["extra"] = {k: np.asarray(v) if not isinstance(v, (str, bytes))
                            else v for k, v in extra.items()}
    last_err = None
    for attempt in range(retries + 1):
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, payload, force=True)
            ckptr.wait_until_finished()
            return path
        except Exception as e:  # transient FS race; clean tmp and retry
            last_err = e
            shutil.rmtree(path + ".orbax-checkpoint-tmp", ignore_errors=True)
            if attempt < retries:
                warnings.warn(f"checkpoint save to {path} failed "
                              f"(attempt {attempt + 1}/{retries + 1}): {e}; "
                              "retrying")
                time.sleep(1.0 + attempt)
    raise last_err


def restore_checkpoint(path: str, target_state: Any | None = None):
    """Restore (state, extra). If ``target_state`` is given, the state is
    reconstructed with its pytree structure (dataclasses included); otherwise
    raw nested dicts of arrays are returned."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target_state is not None:
        # extras are restored raw first (their keys are unknown a priori)
        raw = ckptr.restore(path)
        template = {"state": jax.device_get(target_state)}
        if "extra" in raw:
            template["extra"] = raw["extra"]
        try:
            payload = ckptr.restore(path, template)
        except ValueError:
            # Optimizer-state tree mismatch: e.g. a checkpoint trained with
            # an LR schedule restored into a constant-lr template (the eval
            # suite's default). Evaluation only needs params — graft the
            # restored params (and step) onto the target structure and keep
            # the template's freshly-initialized opt_state. Resuming
            # TRAINING across different OPTIM configs intentionally loses
            # optimizer moments here; the warning says so.
            if not hasattr(target_state, "params"):
                raise
            import warnings
            warnings.warn(
                f"checkpoint {path} has a different optimizer-state "
                "structure than the restore template (different "
                "OPTIM.lr_schedule?); restoring params only")
            state = target_state.replace(
                params=raw["state"]["params"],
                step=raw["state"].get("step", target_state.step))
            return state, raw.get("extra", {})
    else:
        payload = ckptr.restore(path)
    return payload["state"], payload.get("extra", {})


def latest_step(ckpt_dir: str) -> str | None:
    """Return the newest step_* checkpoint directory under ckpt_dir, if any."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None
