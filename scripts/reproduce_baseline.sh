#!/usr/bin/env bash
# One-command reproduction of BASELINE.md on real Sentinel-2 data, end-to-end:
#
#   BigEarthNet-S2 tar -> extraction (cpu.sbatch:16-29)
#   -> band merge to RGB PNGs (combinebandsall.py via dsic_tpu.data.bands)
#   -> 8-lambda training sweep (submit.sbatch / train.py, 30 epochs)
#   -> 1000-image RD CSVs + plots (modelseval.py schemas)
#   -> BD summaries vs JPEG + recorded learned baselines
#      (writeupbdcurves{jpeg,balle,minnen,cheng}ALL.py)
#   -> LIVE same-dataset bmshj2018 baseline: quality sweep trained on the
#      same patches, live BD + bpp-matched visual comparison
#      (writeupbdcurvesballeALL.py:385-435, resultsanalysisballe.py:139-268)
#   -> latent-distribution analysis (distribution_check artifacts)
#
# Usage:
#   scripts/reproduce_baseline.sh TAR_OR_DATA_DIR WORK_DIR        # real data
#   scripts/reproduce_baseline.sh --dry-run [WORK_DIR]            # synthetic
#
# TAR_OR_DATA_DIR may be: a BigEarthNet-S2 .tar/.tar.zst archive, an extracted
# BigEarthNet root (band GeoTIFFs), or a directory of ready RGB PNGs.
# Requires rasterio for GeoTIFF band merging (gated import in data/bands.py);
# PNG-input and synthetic paths have no extra dependencies.
set -euo pipefail

DRY=0
if [[ "${1:-}" == "--dry-run" ]]; then
  DRY=1
  WORK="${2:-/tmp/dsic_reproduce_dry}"
else
  SRC="${1:?usage: reproduce_baseline.sh TAR_OR_DATA_DIR WORK_DIR | --dry-run}"
  WORK="${2:?usage: reproduce_baseline.sh TAR_OR_DATA_DIR WORK_DIR}"
fi
DATA="$WORK/rgb"
OUT="$WORK/results"
CKPT="$WORK/checkpoints"
mkdir -p "$WORK" "$OUT"

# Training scale: the reference trains 30 epochs on the full patch set
# (train.py / BASELINE.md). Override for smoke tests.
EPOCHS="${EPOCHS:-30}"
MAX_STEPS="${MAX_STEPS:-}"
MAX_IMAGES="${MAX_IMAGES:-1000}"
# Grid overrides for smoke tests (defaults reproduce the reference grids)
LAMBDAS="${LAMBDAS:-}"
QUALITIES="${QUALITIES:-1,2,3,4,5,6,7,8}"
COMPARE_LAMBDAS="${COMPARE_LAMBDAS:-10,100,1000}"
LAMBDA_ARGS=()
[[ -n "$LAMBDAS" ]] && LAMBDA_ARGS+=(--lambdas "$LAMBDAS")
STEP_ARGS=()
[[ -n "$MAX_STEPS" ]] && STEP_ARGS+=(--max_steps "$MAX_STEPS")

if [[ "$DRY" == 1 ]]; then
  echo "== [dry-run] synthetic stand-in dataset =="
  mkdir -p "$DATA"
  python - "$DATA" <<'PY'
import sys, os
from dsic_tpu.data.synthetic import write_synthetic_dataset
if not os.path.exists(os.path.join(sys.argv[1], "patch_0000.png")):
    write_synthetic_dataset(sys.argv[1], n=64, hw=(120, 120), seed=7)
print("synthetic dataset ready")
PY
  EPOCHS=1
  STEP_ARGS=(--max_steps "${MAX_STEPS:-3}")
  MAX_IMAGES=8
else
  if [[ -f "$SRC" ]]; then
    echo "== extracting $SRC (cpu.sbatch tar step) =="
    mkdir -p "$WORK/raw"
    case "$SRC" in
      *.tar.zst) tar --use-compress-program=unzstd -xf "$SRC" -C "$WORK/raw" ;;
      *.tar|*.tar.gz|*.tgz) tar -xaf "$SRC" -C "$WORK/raw" ;;
      *) echo "unknown archive type: $SRC" >&2; exit 2 ;;
    esac
    SRC="$WORK/raw"
  fi
  if compgen -G "$SRC/*.png" > /dev/null; then
    echo "== $SRC already contains RGB PNGs; skipping band merge =="
    DATA="$SRC"
  else
    echo "== band merge (combinebandsall.py equivalent) =="
    scripts/preprocess_bands.sh "$SRC" "$DATA"
  fi
fi

echo "== 8-lambda training sweep (reference grid, MS-SSIM loss) =="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name repro \
    --ckpt_dir "$WORK/checkpoints" \
    --lambda_sweep --epochs "$EPOCHS" "${STEP_ARGS[@]}" "${LAMBDA_ARGS[@]}"
CKPT="$WORK/checkpoints/repro"

echo "== live bmshj2018 baseline: quality sweep on the same data =="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name repro \
    --ckpt_dir "$WORK/checkpoints" \
    --family bmshj2018 --quality_sweep "$QUALITIES" \
    --epochs "$EPOCHS" "${STEP_ARGS[@]}"

echo "== RD evaluation ($MAX_IMAGES images, reference CSV schemas) =="
python -m dsic_tpu.eval.cli rd --ckpt_root "$CKPT" --images "$DATA" \
    --out "$OUT/rd" --max_images "$MAX_IMAGES"

echo "== BD summaries: recorded baselines + LIVE bmshj2018 =="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$DATA" \
    --out "$OUT/bd" --max_images "$MAX_IMAGES" --live bmshj2018

echo "== bpp-matched visual comparisons (JPEG + live bmshj2018) =="
# no `ls | head` here: under pipefail, head closing the pipe early can
# SIGPIPE ls and kill the whole script (observed flake) — use the glob
for FIRST_IMG in "$DATA"/*.png; do break; done
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$FIRST_IMG" --out "$OUT/compare_jpeg" --lambdas "$COMPARE_LAMBDAS"
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$FIRST_IMG" --out "$OUT/compare_bmshj" --vs bmshj2018 \
    --lambdas "$COMPARE_LAMBDAS"

echo "== latent-distribution analysis =="
python -m dsic_tpu.eval.cli latents --ckpt "$CKPT/alpha1000lambda" \
    --images "$DATA" --out "$OUT/latents" --max_images 32

echo "reproduction complete: $OUT"
echo "compare $OUT/rd/agg_model_rd_summary.csv against BASELINE.md"
