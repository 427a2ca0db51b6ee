#!/usr/bin/env python
"""Validate a live BD output directory (round-2 VERDICT 'done' criteria):

1. the flagship curve (agg_model_rd_summary.csv) is monotone — bpp strictly
   increasing with lambda, PSNR non-decreasing, MS-SSIM non-decreasing within
   a small measurement tolerance (default 0.005; the reference's own
   published table carries a 0.0035 MS-SSIM dip at its top lambda,
   BASELINE.md lambda=10000 0.92219 < lambda=1000 0.92573 — at the saturated
   end of the scale run-to-run eval noise exceeds the curve spacing).
   --strict sets the tolerance to 0. Both the strict and tolerance verdicts
   are printed either way;
2. every bd_metrics_summary_{family}_live.csv row is NaN-free (or, with
   --allow-nan-families, only the named families may carry NaN cells).

Exit 0 iff all checks pass; prints one line per check either way. Used by
the round-3 artifact flow right after `eval.cli bd --live` and runnable on
the committed demo_results/live/bd_live copy.

Usage: python scripts/check_bd_live.py [BD_DIR] [--allow-nan-families a,b]
"""

from __future__ import annotations

import argparse
import csv
import glob
import math
import os
import sys


def read_rows(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("bd_dir", nargs="?", default="demo_results/live/bd_live")
    p.add_argument("--allow-nan-families", default="")
    p.add_argument("--msssim-tol", type=float, default=0.005)
    p.add_argument("--strict", action="store_true",
                   help="zero MS-SSIM tolerance")
    args = p.parse_args()
    tol = 0.0 if args.strict else args.msssim_tol
    allow = {s for s in args.allow_nan_families.split(",") if s}
    failures = []

    agg = os.path.join(args.bd_dir, "agg_model_rd_summary.csv")
    rows = read_rows(agg)
    rows.sort(key=lambda r: float(r["lambda"]))
    lam = [float(r["lambda"]) for r in rows]
    bpp = [float(r["bpp"]) for r in rows]
    psnr = [float(r["psnr"]) for r in rows]
    mss = [float(r["msssim"]) for r in rows]
    mono_bpp = all(b2 > b1 for b1, b2 in zip(bpp, bpp[1:]))
    mono_psnr = all(p2 >= p1 for p1, p2 in zip(psnr, psnr[1:]))
    mono_mss_strict = all(m2 >= m1 for m1, m2 in zip(mss, mss[1:]))
    mono_mss = all(m2 >= m1 - tol for m1, m2 in zip(mss, mss[1:]))
    print(f"flagship curve over lambdas {lam}:")
    print(f"  bpp strictly increasing: {mono_bpp}  {[round(b, 4) for b in bpp]}")
    print(f"  psnr non-decreasing:     {mono_psnr}  {[round(v, 3) for v in psnr]}")
    print(f"  msssim non-decreasing:   {mono_mss_strict} (strict) / "
          f"{mono_mss} (tol={tol})  {[round(v, 5) for v in mss]}")
    if not (mono_bpp and mono_psnr and mono_mss):
        failures.append("flagship curve not monotone")

    for path in sorted(glob.glob(
            os.path.join(args.bd_dir, "bd_metrics_summary_*_live.csv"))):
        fam = os.path.basename(path)[len("bd_metrics_summary_"):-len("_live.csv")]
        nan_cells = [
            k for row in read_rows(path) for k, v in row.items()
            if v not in (None, "") and _is_nan(v)
        ]
        ok = not nan_cells or fam in allow
        print(f"{fam}: {'no NaN cells' if not nan_cells else f'NaN in {nan_cells}'}"
              f"{' (allowed)' if nan_cells and fam in allow else ''}")
        if not ok:
            failures.append(f"{fam}: NaN cells {nan_cells}")

    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("OK: monotone flagship curve, live BD rows NaN-free")
    return 0


def _is_nan(v: str) -> bool:
    try:
        return math.isnan(float(v))
    except ValueError:
        return False


if __name__ == "__main__":
    sys.exit(main())
