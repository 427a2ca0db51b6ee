#!/usr/bin/env bash
# Round-3 deep equal-steps retrain, v2: same plan as live_retrain_r3.sh
# (flagship extended-λ vmapped sweep + every zoo family at equal steps,
# cosine decay, best-val selection) but the zoo quality sweeps train
# VMAPPED per (N, M) architecture group (--quality_vmap): ~3-4x less
# wall-clock than one-model-per-run. Includes elic2022 (sixth family).
# Every stage is skip-if-done at quality granularity, and in-flight vmapped
# groups additionally auto-resume from their own sweep_state checkpoints.
#
# Usage: scripts/live_retrain_r3b.sh [WORK_DIR] [STEPS] [CKPT_RUN]
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
FAMILIES="bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022"
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

echo "=== [1/8] flagship lambda-vmapped sweep ($STEPS steps, grid $FLAG_LAMBDAS) ==="
if [ ! -d "$CKPT/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS"
else
    echo "flagship checkpoints exist; skipping"
fi

stage=2
for family in $FAMILIES; do
    missing=""
    for q in $(seq 1 8); do
        [ -d "$CKPT/${family}_q${q}" ] || missing="$missing,$q"
    done
    missing="${missing#,}"
    echo "=== [$stage/8] $family quality sweep (vmapped; missing: ${missing:-none}) ==="
    if [ -n "$missing" ]; then
        python -m dsic_tpu.train.cli "${train_common[@]}" \
            --family "$family" --quality_sweep "$missing" --quality_vmap
    fi
    stage=$((stage + 1))
done

echo "=== [8/8] live BD + bpp-matched comparisons (held-out eval set) ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --live bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022

echo "live retrain v2 complete: $OUT"
