#!/usr/bin/env python
"""charm2020 slice-count ablation: K in {2, 4, 6, 12} (slice_size 96/48/32/16
at M=192), equal training steps, same data — RD + real-codec throughput
table, the Minnen-Singh 2020 section-5 ablation rerun in-framework to pick
``MODEL.slice_size`` on evidence (round-2 VERDICT next #5).

Writes {out}/charm_slice_ablation.csv with one row per K:
  K, slice_size, params, bpp_real, psnr, msssim, enc_ms, dec_ms, sec_per_step

Usage: python scripts/charm_slice_ablation.py [--work /root/work/live_demo]
           [--steps 4000] [--out demo_results/live]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

# Runnable from anywhere: scripts/ lives beside the package root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/root/work/live_demo")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--out", default="demo_results/live")
    p.add_argument("--quality", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dsic_tpu.config import Config
    from dsic_tpu.data.datasets import make_loaders
    from dsic_tpu.models.zoo import zoo_quality
    from dsic_tpu.train.trainer import Trainer
    from dsic_tpu.codec import make_codec
    from dsic_tpu.ops.msssim import ms_ssim
    from dsic_tpu.utils.image_io import list_images, load_image_u8
    from dsic_tpu.utils.csv_logger import CsvLogger

    q = zoo_quality("charm2020", args.quality)
    eval_paths = list_images(os.path.join(args.work, "eval_data"))[:64]
    eval_imgs = np.stack([load_image_u8(p_) for p_ in eval_paths])
    # pad to the model's multiple (120 -> 128)
    from dsic_tpu.ops.pad import pad_to_multiple, crop_to
    ev, box = pad_to_multiple(jnp.asarray(eval_imgs, jnp.float32) / 255.0, 64)
    ev = np.asarray(ev)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for slice_size in (96, 48, 32, 16):
        k = q["M"] // slice_size
        cfg = Config()
        cfg = cfg.replace(
            DATA=dataclasses.replace(cfg.DATA,
                                     root=os.path.join(args.work, "data"),
                                     batch_size=16, pad_multiple=64),
            MODEL=dataclasses.replace(cfg.MODEL, family="charm2020",
                                      N=q["N"], M=q["M"],
                                      slice_size=slice_size),
            LOSS=dataclasses.replace(cfg.LOSS, lambda_rd=q["lam"],
                                     dist="mse"),
            OPTIM=dataclasses.replace(cfg.OPTIM, lr_schedule="cosine",
                                      decay_steps=args.steps,
                                      warmup_steps=args.steps // 16),
            TRAIN=dataclasses.replace(cfg.TRAIN, epochs=600, select="best"))
        train_loader, val_loader = make_loaders(cfg)
        name = f"charm_k{k}"
        t = Trainer(cfg, run_name="slice_ablation",
                    sample_shape=(1, *train_loader.ds.sample_shape()),
                    final_ckpt=name, log_name=f"train_log_{name}.csv")
        t0 = time.perf_counter()
        t.fit(train_loader, val_loader, max_steps=args.steps)
        sec_per_step = (time.perf_counter() - t0) / args.steps
        n_params = sum(int(np.prod(np.asarray(a).shape))
                       for a in jax.tree.leaves(t.state.params))

        codec = make_codec(t.model, t.state.params)
        # RD on the held-out set through the REAL codec
        res = codec.compress(ev)
        x_hat = codec.decompress(res.data, quantize_output=False)
        ref = np.asarray(crop_to(jnp.asarray(ev), box))
        rec = np.asarray(crop_to(jnp.asarray(x_hat), box))
        mse = float(np.mean((ref - rec) ** 2))
        psnr = -10.0 * np.log10(mse)
        mss = float(np.mean(np.asarray(ms_ssim(jnp.asarray(rec),
                                               jnp.asarray(ref)))))
        # codec throughput on a 32-batch (median of 3)
        xb = ev[:32]
        enc_t, dec_t = [], []
        for _ in range(3):
            e0 = time.perf_counter()
            r = codec.compress(xb)
            e1 = time.perf_counter()
            codec.decompress(r.data)
            enc_t.append(e1 - e0)
            dec_t.append(time.perf_counter() - e1)
        row = dict(K=k, slice_size=slice_size, params=n_params,
                   bpp_real=round(float(res.bpp), 5), psnr=round(psnr, 3),
                   msssim=round(mss, 5),
                   enc_ms=round(sorted(enc_t)[1] * 1e3, 1),
                   dec_ms=round(sorted(dec_t)[1] * 1e3, 1),
                   sec_per_step=round(sec_per_step, 4))
        rows.append(row)
        print("ABLATION", row, flush=True)

    with CsvLogger(os.path.join(args.out, "charm_slice_ablation.csv"),
                   list(rows[0].keys())) as csv:
        for r in rows:
            csv.log(**r)
    print(f"wrote {args.out}/charm_slice_ablation.csv")


if __name__ == "__main__":
    main()
