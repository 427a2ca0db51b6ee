"""Per-lambda best-validation checkpoint selection ACROSS fine-tune stages.

The flagship lambda-grid models are trained in stages (noise -> STE-round ->
mixed quantization; see docs/DESIGN.md).  Each stage's sweep already keeps its
own best-val checkpoint (--select best), but the best checkpoint over the FULL
training trajectory of a given lambda may come from an earlier stage: e.g. the
pure-STE stage wins at low lambda (its rate leg settled near the distortion
knee) while the mix stage wins at high lambda (noise-free decoder leg).

This script applies the same selection rule the in-run tracker uses — argmin
of the validation RD loss  lambda * (1 - MS-SSIM) + bpp  (the training
objective, reference /root/reference/code/modelv2/model.py:75-107 with
LOSS.dist="msssim") — per lambda across the stage curves measured on the SAME
held-out eval set, and installs the winners as the live flagship.

Stage curves are the agg_model_rd_summary CSVs the BD pipeline wrote for each
stage (identical eval set, identical pipeline), so no re-evaluation is needed
to select; the caller re-runs `eval.cli bd --reuse` afterwards so the
installed composite curve is re-measured end-to-end from the actual installed
checkpoints (never trust a compose-from-CSVs shortcut).

Usage:
  python scripts/select_flagship_stage.py BD_DIR CKPT_ROOT \
      --stages mix=agg_model_rd_summary.csv,ste_stage=agg_model_rd_summary_ste_stage.csv \
      --installed mix
"""
from __future__ import annotations

import argparse
import csv
import os
import shutil
import sys


def read_curve(path: str) -> dict[float, dict]:
    rows = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            rows[float(row["lambda"])] = {
                "bpp": float(row["bpp"]),
                "msssim": float(row["msssim"]),
                "psnr": float(row["psnr"]),
            }
    return rows


def val_loss(lam: float, row: dict) -> float:
    return lam * (1.0 - row["msssim"]) + row["bpp"]


def ckpt_name(lam: float) -> str:
    # alpha{lambda}lambda naming convention (reference train.py:227-235)
    lam_s = str(int(lam)) if float(lam).is_integer() else str(lam)
    return f"alpha{lam_s}lambda"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bd_dir")
    ap.add_argument("ckpt_root")
    ap.add_argument("--stages", required=True,
                    help="comma list of stage=curve_csv (csv paths relative "
                         "to BD_DIR); first entry is the stage whose "
                         "checkpoints live at CKPT_ROOT/<name> directly")
    ap.add_argument("--installed", required=True,
                    help="stage currently installed at CKPT_ROOT/alpha*lambda")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    stages: dict[str, dict[float, dict]] = {}
    for part in args.stages.split(","):
        name, csv_rel = part.split("=", 1)
        path = os.path.join(args.bd_dir, csv_rel)
        if not os.path.exists(path):
            print(f"[select] stage {name}: no curve at {path}, skipping")
            continue
        stages[name] = read_curve(path)
    if args.installed not in stages:
        print(f"installed stage {args.installed!r} has no curve", file=sys.stderr)
        return 2

    lambdas = sorted(set().union(*[set(c) for c in stages.values()]))
    out_rows = []
    swaps = []
    for lam in lambdas:
        losses = {s: val_loss(lam, c[lam]) for s, c in stages.items() if lam in c}
        winner = min(losses, key=losses.get)
        out_rows.append({"lambda": lam, "stage": winner,
                         **{f"loss_{s}": round(l, 4) for s, l in losses.items()}})
        if winner != args.installed:
            swaps.append((lam, winner))

    sel_path = os.path.join(args.bd_dir, "stage_selection.csv")
    with open(sel_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(out_rows[0]))
        w.writeheader()
        w.writerows(out_rows)
    for r in out_rows:
        print(f"[select] lambda={r['lambda']}: {r['stage']}  "
              + "  ".join(f"{k}={v}" for k, v in r.items()
                          if k.startswith("loss_")))

    for lam, winner in swaps:
        name = ckpt_name(lam)
        src = os.path.join(args.ckpt_root, winner, name)
        dst = os.path.join(args.ckpt_root, name)
        keep = os.path.join(args.ckpt_root, args.installed + "_stage_kept", name)
        if not os.path.isdir(src):
            print(f"[select] MISSING {src}; skipping swap", file=sys.stderr)
            continue
        print(f"[select] install {winner}/{name} -> {dst}")
        if args.dry_run:
            continue
        os.makedirs(os.path.dirname(keep), exist_ok=True)
        if os.path.isdir(dst) and not os.path.isdir(keep):
            shutil.move(dst, keep)
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
    print(f"[select] {len(swaps)} swap(s); record: {sel_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
