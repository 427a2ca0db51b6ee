#!/usr/bin/env bash
# Round-3 follow-up to live_retrain_r3.sh: train the elic2022 joint
# space-channel family (models/elic.py) at the SAME equal-steps budget,
# then refresh the live BD comparison with all SIX families. Run after
# live_retrain_r3.sh completes (stages are skip-if-done, so re-running is
# cheap).
#
# Usage: scripts/live_elic_followup.sh [WORK_DIR] [STEPS] [CKPT_RUN]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-8000}"
RUN="${3:-live3}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results_r3"
CKPT="checkpoints/$RUN"
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
WARMUP=$((STEPS / 16))

train_common=(--data_root "$DATA" --run_name "$RUN" --max_steps "$STEPS"
              --epochs 600 --batch_size 16 --select best
              --lr_schedule cosine --decay_steps "$STEPS"
              --warmup_steps "$WARMUP")

echo "=== elic2022 quality sweep ($STEPS steps each) ==="
for q in $(seq 1 8); do
    if [ -d "$CKPT/elic2022_q${q}" ]; then
        echo "elic2022 q$q exists; skipping"
        continue
    fi
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --family elic2022 --quality "$q"
done

echo "=== six-family live BD refresh ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --live bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022

echo "=== bpp-matched visual comparison vs elic2022 ==="
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$EVAL/patch_0001.png" --out "$OUT/compare_elic2022" \
    --lambdas 10,100,1000 --vs elic2022

echo "elic follow-up complete: $OUT"
