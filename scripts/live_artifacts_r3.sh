#!/usr/bin/env bash
# Round-3 artifact refresh: bpp-matched visual comparisons for ALL six live
# zoo families + JPEG, flagship latent-analysis artifacts, and codec
# throughput — against the deep-retrained checkpoints/live3 models on the
# held-out eval set. Runs the reference's resultsanalysis* workflow
# (/root/reference/code/modelv2/resultsanalysisballe.py constants loop) as
# one script. One TPU job at a time: pass a marker file to wait on.
#
# Usage: scripts/live_artifacts_r3.sh [WORK_DIR] [CKPT_RUN] [MARKER_FILE]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
RUN="${2:-live3}"
MARKER="${3:-}"
EVAL="$WORK/eval_data"
OUT="$WORK/results_r3"
CKPT="checkpoints/$RUN"
FAMILIES="bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022"

if [[ -n "$MARKER" ]]; then
    echo "waiting for $MARKER ..."
    while [[ ! -f "$MARKER" ]]; do sleep 30; done
    echo "marker present"
fi
mkdir -p "$OUT"

for fam in $FAMILIES; do
    echo "=== compare vs $fam (bpp-matched) ==="
    python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
        --image "$EVAL/patch_0001.png" --out "$OUT/compare_$fam" \
        --lambdas 10,100,1000 --vs "$fam"
done

echo "=== compare vs jpeg ==="
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$EVAL/patch_0001.png" --out "$OUT/compare_jpeg" \
    --lambdas 10,100,1000 --vs jpeg

echo "=== flagship latent analysis ==="
python -m dsic_tpu.eval.cli latents --ckpt "$CKPT/alpha100lambda" \
    --images "$EVAL" --out "$OUT/latents" --max_images 64

echo "=== codec throughput (global + spatial table modes) ==="
python -m dsic_tpu.eval.cli throughput --batch 32 \
    | tee "$OUT/throughput_global.txt"
python -m dsic_tpu.eval.cli throughput --batch 32 --spatial_params \
    | tee "$OUT/throughput_spatial.txt"

echo "round-3 artifacts complete: $OUT"
