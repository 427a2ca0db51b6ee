#!/usr/bin/env python
"""Pack trained checkpoints into small committable npz blobs (and back).

The build VM persists ONLY git-committed content across restarts;
`checkpoints/` is gitignored, so a restart destroys every trained model
(it happened 2026-08-19: the whole live3/live4 zoo vanished mid-round).
Measured result CSVs survive because the pipeline commits them, but any
follow-up eval (new compare artifacts, deeper eval sets, bench against a
trained model) then needs a full retrain.

`pack` walks a checkpoint root, restores each orbax checkpoint RAW,
keeps the params subtree only (optimizer moments are retrain state, not
model identity), casts float arrays to float16 (params are O(1)
magnitude; f16's 10-bit mantissa costs ~1e-3 relative rounding — RD
curves re-measured from packed weights shift slightly vs the committed
CSVs), and writes one deflate-compressed npz per model.

`unpack` reverses: rebuilds {params (float32), step} and saves it as an
orbax checkpoint. `utils.checkpoint.restore_checkpoint` grafts a
params-only checkpoint onto any eval TrainState template via its
optimizer-mismatch fallback (checkpoint.py:70-88), so unpacked
checkpoints drop into eval.cli / Codec unchanged.

Usage:
  python scripts/pack_ckpt.py pack   CKPT_ROOT OUT_DIR [--glob 'alpha*lambda']
  python scripts/pack_ckpt.py unpack IN_DIR    CKPT_ROOT
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _nest(flat):
    root = {}
    for path, v in flat.items():
        node = root
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return root


def pack(root: str, out_dir: str, pattern: str) -> int:
    from dsic_tpu.utils.checkpoint import restore_checkpoint
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if not os.path.isdir(path) or not fnmatch.fnmatch(name, pattern):
            continue
        if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
            continue
        state, _ = restore_checkpoint(path)
        params = state["params"] if isinstance(state, dict) else state.params
        flat = _flatten(params)
        blob = {}
        for k, v in flat.items():
            blob[k] = v.astype(np.float16) if v.dtype == np.float32 else v
        step = state.get("step", 0) if isinstance(state, dict) else state.step
        blob["__step__"] = np.asarray(int(np.asarray(step)))
        out = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(out, **blob)
        print(f"packed {name}: {len(flat)} arrays -> "
              f"{os.path.getsize(out) / 1e6:.1f} MB")
        n += 1
    return n


def unpack(in_dir: str, root: str, skip_existing: bool = False,
           pattern: str = "*") -> int:
    from dsic_tpu.utils.checkpoint import save_checkpoint
    os.makedirs(root, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(in_dir)):
        if not fname.endswith(".npz"):
            continue
        name = fname[:-4]
        if not fnmatch.fnmatch(name, pattern):
            continue
        if skip_existing and os.path.exists(
                os.path.join(root, name, "_CHECKPOINT_METADATA")):
            continue
        with np.load(os.path.join(in_dir, fname)) as z:
            flat = {k: z[k] for k in z.files}
        step = int(flat.pop("__step__"))
        params = _nest({k: v.astype(np.float32)
                        if v.dtype == np.float16 else v
                        for k, v in flat.items()})
        save_checkpoint(os.path.join(root, name),
                        {"params": params, "step": step})
        print(f"unpacked {name} (step {step})")
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["pack", "unpack"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--glob", default="*", help="checkpoint dir name filter")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (pack/unpack is host-side "
                         "work; avoids a slow TPU claim and never contends "
                         "with a live training job)")
    ap.add_argument("--skip-existing", action="store_true",
                    help="unpack: leave checkpoints that already exist on "
                         "disk untouched (self-healing driver restore)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.mode == "pack":
        n = pack(args.src, args.dst, args.glob)
    else:
        n = unpack(args.src, args.dst,
                   skip_existing=args.skip_existing, pattern=args.glob)
    if n == 0 and not args.skip_existing:
        print("nothing matched", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
