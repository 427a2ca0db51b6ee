#!/usr/bin/env bash
# Final stage of the live-baseline demo: train the cheng2020_gmm sweep
# (cheng2020's K=3 mixture head) and refresh the live BD comparison with
# all five families. Waits until MARKER_FILE exists (the previous job's
# last artifact) before touching the TPU.
#
# Usage: scripts/live_gmm_followup.sh [WORK_DIR] [STEPS] [MARKER_FILE]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-3000}"
MARKER="${3:-}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results"
CKPT="checkpoints/live"

if [[ -n "$MARKER" ]]; then
    echo "waiting for $MARKER ..."
    while [[ ! -f "$MARKER" ]]; do sleep 30; done
    echo "marker present"
fi

echo "=== [1/2] cheng2020_gmm quality sweep ($STEPS steps each) ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --family cheng2020_gmm --quality_sweep 1,2,3,4,5,6 \
    --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [2/2] live BD with all five families ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 \
    --live bmshj2018,mbt2018_mean,cheng2020_checkerboard,cheng2020_gmm,charm2020

echo "gmm follow-up complete: $OUT"
