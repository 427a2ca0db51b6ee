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
LOSS.dist="msssim") — per lambda across stage curves all measured on one
SELECTION-VAL set, and installs the winners as the live flagship.

Stage curves are the agg_model_rd_summary CSVs the BD pipeline wrote for each
stage (identical eval set, identical pipeline), so no re-evaluation is needed
to select.  Eval-set hygiene (round-4 three-way split): the curves handed to
this script must come from the selection-val split ONLY; the caller then runs
one end-to-end `eval.cli bd` of the installed checkpoints on a DISJOINT
report-test split that no selection decision ever saw (never trust a
compose-from-CSVs shortcut) — see scripts/live_retrain_r4.sh stages 9-10.

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
    ap.add_argument("--force_install", action="store_true",
                    help="install EVERY winner from its stage snapshot dir "
                         "regardless of --installed (use when the root is "
                         "already a mixed composite)")
    ap.add_argument("--require_monotone", action="store_true",
                    help="constrain the composite to a valid RD ordering "
                         "(bpp strictly increasing, PSNR non-decreasing in "
                         "lambda) and minimize TOTAL val loss subject to it; "
                         "falls back to unconstrained per-lambda argmin if "
                         "no stage combination satisfies the constraint")
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

    import math
    lambdas = sorted(set().union(*[set(c) for c in stages.values()]))
    per_lam = []  # [(lam, {stage: (loss, bpp, psnr)})]
    for lam in lambdas:
        opts = {}
        for s, c in stages.items():
            if lam not in c:
                continue
            row = c[lam]
            # A non-positive/non-finite estimated bpp means the checkpoint
            # collapsed its rate leg below the continuous-entropy floor
            # (differential Student-t entropy can go negative for near-delta
            # densities). Its raw val loss can then WIN spuriously (negative
            # rate term), but the point is degenerate — the real codec bpp
            # is >= 0 and the curve artifact would carry a negative rate.
            # Never install it.
            if not (math.isfinite(row["bpp"]) and row["bpp"] > 0
                    and math.isfinite(row["msssim"])
                    and math.isfinite(row["psnr"])):
                print(f"[select] lambda={lam}: stage {s} dropped "
                      f"(degenerate point bpp={row['bpp']:.4g})")
                continue
            opts[s] = (val_loss(lam, row), row["bpp"], row["psnr"])
        if not opts:
            print(f"[select] lambda={lam}: NO valid stage point; keeping "
                  f"installed stage", file=sys.stderr)
            opts = {args.installed: (float("inf"), float("nan"),
                                     float("nan"))}
        per_lam.append((lam, opts))

    argmin = {lam: min(o, key=lambda s: o[s][0]) for lam, o in per_lam}
    choice = dict(argmin)
    if args.require_monotone:
        # Exhaustive search over stage combinations (few stages, few
        # lambdas), with tiered validity — the ordering an RD curve is
        # supposed to have, degrading gracefully when the checkpoints
        # cannot provide it (tiers mirror scripts/check_bd_live.py):
        #   tier 0: bpp strictly increasing, psnr non-decreasing, msssim
        #           non-decreasing within MSS_TOL;
        #   tier 1: bpp+psnr as above; msssim leg within-noise-flat
        #           (total span < MSS_SPAN, the checker's saturation
        #           threshold) — no false MS-SSIM ordering claims;
        #   tier 2: bpp+psnr only;
        #   tier 3: unconstrained per-lambda argmin.
        # Within the first non-empty tier, minimize total val loss.
        import itertools
        MSS_TOL, MSS_SPAN = 0.005, 0.02
        names = [list(o) for _, o in per_lam]
        best = {0: None, 1: None, 2: None}
        for combo in itertools.product(*names):
            pts = [stages[s][lam] for (lam, _), s in zip(per_lam, combo)]
            bpps = [p["bpp"] for p in pts]
            psnrs = [p["psnr"] for p in pts]
            msss = [p["msssim"] for p in pts]
            if not all(b2 > b1 for b1, b2 in zip(bpps, bpps[1:])):
                continue
            if not all(p2 >= p1 for p1, p2 in zip(psnrs, psnrs[1:])):
                continue
            tot = sum(o[s][0] for (_, o), s in zip(per_lam, combo))
            tiers = [2]
            if all(m2 >= m1 - MSS_TOL for m1, m2 in zip(msss, msss[1:])):
                tiers.append(0)
            if max(msss) - min(msss) < MSS_SPAN:
                tiers.append(1)
            for t in tiers:
                if best[t] is None or tot < best[t][0]:
                    best[t] = (tot, combo)
        for t in (0, 1, 2):
            if best[t] is not None:
                print(f"[select] constrained tier {t} "
                      f"(total loss {best[t][0]:.4f})")
                choice = {lam: s for (lam, _), s in zip(per_lam, best[t][1])}
                break
        else:
            print("[select] no bpp/psnr-monotone stage combination exists; "
                  "falling back to per-lambda argmin")

    out_rows = []
    swaps = []
    for lam, opts in per_lam:
        winner = choice[lam]
        row = {"lambda": lam, "stage": winner,
               **{f"loss_{s}": round(v[0], 4) for s, v in opts.items()}}
        if winner != argmin[lam]:
            row["constrained"] = (f"argmin {argmin[lam]} overridden for "
                                  f"curve ordering")
        out_rows.append(row)
        if args.force_install or winner != args.installed:
            swaps.append((lam, winner))

    sel_path = os.path.join(args.bd_dir, "stage_selection.csv")
    fields = list(dict.fromkeys(k for r in out_rows for k in r))
    with open(sel_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval="")
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
