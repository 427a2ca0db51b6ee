#!/usr/bin/env bash
# Round-3 deep equal-steps retrain (VERDICT r2 next #1): flagship lambda
# sweep AND every live zoo family at the SAME step budget (default 8000),
# with cosine LR decay, best-validation-loss checkpoint selection, and rate
# ranges arranged to overlap:
#   - the flagship vmapped sweep trains an EXTENDED grid (lambda 1 and 3
#     below the reference 8-point grid) so its curve reaches down into the
#     zoo families' low-rate span;
#   - cheng2020* trains the q7/q8 overlap extension (models/zoo.py
#     CHENG_QUALITY) so its curve reaches up into the flagship's span.
# Every stage is skip-if-done, so a preempted script re-run continues where
# it left off (the vmapped sweep additionally auto-resumes mid-run from its
# own sweep_state checkpoint).
#
# Usage: scripts/live_retrain_r3.sh [WORK_DIR] [STEPS] [CKPT_RUN]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-8000}"
RUN="${3:-live3}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results_r3"
CKPT="checkpoints/$RUN"
# extended flagship grid: reference 8 points + {1,3} for low-rate overlap
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
WARMUP=$((STEPS / 16))
mkdir -p "$DATA" "$EVAL" "$OUT"

if [ ! -f "$DATA/patch_0001.png" ]; then
python - "$DATA" "$EVAL" <<'PY'
import sys
from dsic_tpu.data.synthetic import write_synthetic_dataset
write_synthetic_dataset(sys.argv[1], n=320, hw=(120, 120), seed=7)
write_synthetic_dataset(sys.argv[2], n=256, hw=(120, 120), seed=99)
print("datasets ready")
PY
fi

train_common=(--data_root "$DATA" --run_name "$RUN" --max_steps "$STEPS"
              --epochs 600 --batch_size 16 --select best
              --lr_schedule cosine --decay_steps "$STEPS"
              --warmup_steps "$WARMUP")

echo "=== [1/7] flagship lambda-vmapped sweep ($STEPS steps, grid $FLAG_LAMBDAS) ==="
if [ ! -d "$CKPT/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS"
else
    echo "flagship checkpoints exist; skipping"
fi

stage=2
for family in bmshj2018 mbt2018_mean charm2020 \
              cheng2020_checkerboard cheng2020_gmm; do
    echo "=== [$stage/7] $family quality sweep ($STEPS steps each) ==="
    qmax=8
    for q in $(seq 1 $qmax); do
        if [ -d "$CKPT/${family}_q${q}" ]; then
            echo "$family q$q exists; skipping"
            continue
        fi
        python -m dsic_tpu.train.cli "${train_common[@]}" \
            --family "$family" --quality "$q"
    done
    stage=$((stage + 1))
done

echo "=== [7/7] live BD + bpp-matched comparisons (held-out eval set) ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --live bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm

echo "live retrain complete: $OUT"
