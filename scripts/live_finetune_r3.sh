#!/usr/bin/env bash
# Round-3 stage 2: STE-round fine-tune of the flagship λ grid + incremental
# live-BD refresh.
#
# The noise-trained flagship pays a model-dependent noise->round rate gap at
# eval (up to ~0.5 bpp) that scrambles the low-rate λ ordering; the zoo's
# mean-conditioned families are immune. Fine-tune every λ through the STE
# rounding path (TRAIN.quant_mode=round, seeded from the noise checkpoints,
# small fresh cosine LR), then re-evaluate ONLY the flagship leg and the
# families the OOM-killed first pass missed, reusing the rest (bd --reuse).
#
# Usage: scripts/live_finetune_r3.sh [WORK_DIR] [CKPT_RUN] [FT_STEPS]
set -uo pipefail
WORK="${1:-/root/work/live_demo}"
RUN="${2:-live3}"
FT_STEPS="${3:-2500}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results_r3"
CKPT="checkpoints/$RUN"
FT="checkpoints/${RUN}ft"
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
ALL_FAMILIES="bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022"

echo "=== [1/5] STE-round fine-tune (all 10 λ vmapped, $FT_STEPS steps) ==="
if [ ! -d "$FT/$RUN/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli --data_root "$DATA" --run_name "$RUN" \
        --ckpt_dir "$FT" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --init_from "$CKPT" --quant_mode round \
        --max_steps "$FT_STEPS" --epochs 600 --batch_size 16 \
        --select best --lr 3e-5 --lr_schedule cosine \
        --decay_steps "$FT_STEPS" --warmup_steps 50 || exit 1
fi

echo "=== [2/5] install fine-tuned flagship checkpoints (originals kept) ==="
mkdir -p "$CKPT/noise_stage"
for lam in 1 3 10 25 50 100 250 500 1000 10000; do
    name="alpha${lam}lambda"
    [ -d "$CKPT/noise_stage/$name" ] || mv "$CKPT/$name" "$CKPT/noise_stage/$name"
    rm -rf "$CKPT/$name"
    cp -r "$FT/$RUN/$name" "$CKPT/$name"
done

echo "=== [3/5] flagship re-eval + missing family legs (separate processes) ==="
rm -f "$OUT/bd_live/agg_model_rd_summary.csv" \
      "$OUT/bd_live/per_image_per_lambda_results.csv"
for fam in cheng2020_checkerboard cheng2020_gmm elic2022; do
    python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
        --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
        --reuse --live "$fam" || exit 1
done

echo "=== [4/5] full BD table + overlay plots from the assembled curves ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --reuse --live "$ALL_FAMILIES" || exit 1

echo "=== [5/5] acceptance check ==="
python scripts/check_bd_live.py "$OUT/bd_live" | tee "$OUT/bd_live/CHECK.txt"

echo "fine-tune + BD refresh complete: $OUT/bd_live"
