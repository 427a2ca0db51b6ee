#!/usr/bin/env bash
# Third stage of the live-baseline demo: train the beyond-reference
# charm2020 (channel-conditional) quality sweep on the same dataset and add
# it to the live BD comparison. charm's entropy model conditions on decoded
# channel slices, so its RD curve should dominate mbt2018_mean's on the
# same data — the point of the family.
#
# Usage: scripts/live_charm_followup.sh [WORK_DIR] [STEPS] [WAIT_PID]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-3000}"
WAIT_PID="${3:-}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results"
CKPT="checkpoints/live"

if [[ -n "$WAIT_PID" ]]; then
    echo "waiting for pid $WAIT_PID to finish..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "predecessor done"
fi

echo "=== [1/2] charm2020 quality sweep ($STEPS steps each) ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --family charm2020 --quality_sweep 1,2,3,4,5,6,7,8 \
    --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [2/2] live BD with all four families ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 \
    --live bmshj2018,mbt2018_mean,cheng2020_checkerboard,charm2020

echo "charm follow-up complete: $OUT"
