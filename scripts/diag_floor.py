#!/usr/bin/env python
"""Round-5 diagnostic: locate the distortion floor in the synthetic corpus.

The live5 report-test flagship curve (wip_live5/bd_live) pins MSE at
~1.46e-3 for every lambda >= 250 while bpp rises 2.9 -> 3.5, and MS-SSIM
peaks at lambda=3 then falls — the signature of corpus content the
16x-bottleneck model cannot reproduce (attempting it decorrelates the
fine-scale SSIM structure term; omitting it scores better).

This script evaluates restored mix-stage checkpoints on component-ablated
variants of the seed-99 eval distribution (monkeypatching the synthetic
generators) and prints per-variant MSE / PSNR / MS-SSIM. The variant whose
removal collapses the MSE floor is the culprit.

Run on CPU (does not touch the TPU):
  python scripts/diag_floor.py [--n 24] [--lambdas 3,10000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dsic_tpu.config import Config  # noqa: E402
from dsic_tpu.data import synthetic  # noqa: E402


def _zeros_grating(rng, hw):
    rng.uniform(0, np.pi); rng.uniform(0.08, 0.35); rng.uniform(0, 2 * np.pi)
    return np.zeros((*hw, 1), np.float32)


def _lowfreq_grating(rng, hw):
    """Same structure, frequency capped at 0.15 cycles/px (period >= 6.7px)."""
    h, w = hw
    theta = rng.uniform(0, np.pi)
    rng.uniform(0.08, 0.35)  # keep rng stream aligned with the original
    freq = 0.06 + 0.09 * (theta / np.pi)  # deterministic-ish low band
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi)
    arg = 2 * np.pi * freq * (np.cos(theta) * xx + np.sin(theta) * yy) + phase
    return np.sin(arg).astype(np.float32)[..., None]


def _zeros_block(rng, hw, block, channels=1):
    h, w = hw
    lh, lw = max(1, -(-h // block)), max(1, -(-w // block))
    rng.standard_normal((lh, lw, channels))
    return np.zeros((h, w, channels), np.float32)


def _zeros_polyline(rng, hw, width):
    rng.uniform(0, hw[1]); rng.uniform(0, hw[0]); rng.uniform(0, 2 * np.pi)
    return np.zeros((*hw, 1), np.float32)


VARIANTS = {
    "full": {},
    "no_grating": {"_grating": _zeros_grating},
    "lowfreq_grating": {"_grating": _lowfreq_grating},
    "no_blocknoise": {"_block_noise": _zeros_block},
    "no_polylines": {"_polyline_mask": _zeros_polyline},
    "no_grating_no_block": {"_grating": _zeros_grating,
                            "_block_noise": _zeros_block},
}


def gen_variant(name: str, n: int, hw, seed: int) -> np.ndarray:
    patches = {}
    saved = {}
    for attr, fn in VARIANTS[name].items():
        saved[attr] = getattr(synthetic, attr)
        setattr(synthetic, attr, fn)
    try:
        patches = synthetic.synthetic_patches(n, hw, seed)
    finally:
        for attr, fn in saved.items():
            setattr(synthetic, attr, fn)
    return patches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--lambdas", default="3,10000")
    ap.add_argument("--ckpt_root", default="checkpoints/live5/mix_stage")
    ap.add_argument("--weights", default="weights/live5/flagship_mix_stage")
    args = ap.parse_args()

    # restore packed weights if the orbax checkpoints are missing
    lambdas = [float(s) for s in args.lambdas.split(",")]
    need = [l for l in lambdas if not os.path.exists(os.path.join(
        args.ckpt_root, f"alpha{l:g}lambda", "_CHECKPOINT_METADATA"))]
    if need:
        from scripts.pack_ckpt import unpack
        unpack(args.weights, args.ckpt_root, skip_existing=True)

    from dsic_tpu.eval.rd_eval import evaluate_model_on_images
    from dsic_tpu.train.state import build_model, create_train_state
    from dsic_tpu.utils.checkpoint import restore_checkpoint

    cfg = Config()
    model = build_model(cfg, train_dtype=None)
    _, _, template = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, 64, 64, 3))

    data = {v: gen_variant(v, args.n, (120, 120), 99) for v in VARIANTS}

    print(f"{'variant':22s} {'lambda':>8s} {'bpp':>7s} {'mse':>10s} "
          f"{'psnr':>7s} {'msssim':>8s}")
    for lam in lambdas:
        path = os.path.join(args.ckpt_root, f"alpha{lam:g}lambda")
        state, _ = restore_checkpoint(path, template)
        params = state["params"] if isinstance(state, dict) else state.params
        for vname, imgs in data.items():
            rows = evaluate_model_on_images(
                model, params, [imgs[i] for i in range(len(imgs))])
            bpp = float(np.mean([r["bpp"] for r in rows]))
            mse = float(np.mean([r["mse"] for r in rows]))
            psnr = float(np.mean([r["psnr"] for r in rows]))
            mss = float(np.mean([r["msssim"] for r in rows]))
            print(f"{vname:22s} {lam:8g} {bpp:7.3f} {mse:10.6f} "
                  f"{psnr:7.3f} {mss:8.4f}")


if __name__ == "__main__":
    main()
