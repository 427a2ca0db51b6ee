#!/usr/bin/env bash
# Round-3 stage 2b: MIXED-quantization fine-tune of the flagship λ grid.
#
# The pure STE-round fine-tune (live_finetune_r3.sh) closes the
# noise->round rate gap at high λ but COLLAPSES λ<=50 to R=0: p(round(y))
# is piecewise constant, so once a latent lands in the dead zone the rate
# term offers no gradient out and the low-λ distortion weight cannot pay
# the rounding barrier. quant_mode=mix (Minnen-Singh 2020 §4) keeps the
# additive-noise relaxation on the RATE leg (smooth likelihoods, no
# barrier) while the decoder trains on STE-rounded latents (the eval-time
# input), so low-λ models settle at small-but-nonzero rates instead of 0.
#
# Seeds from the NOISE-stage originals, installs the mix checkpoints as the
# live flagship (pure-STE stage preserved in ste_stage/), re-evaluates the
# flagship BD leg (families reused), and re-runs the acceptance check.
#
# Usage: scripts/live_finetune_r3_mix.sh [WORK_DIR] [CKPT_RUN] [FT_STEPS]
set -uo pipefail
WORK="${1:-/root/work/live_demo}"
RUN="${2:-live3}"
FT_STEPS="${3:-6000}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results_r3"
CKPT="checkpoints/$RUN"
FT="checkpoints/${RUN}mix"
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
ALL_FAMILIES="bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022"

echo "=== [1/4] mixed-quantization fine-tune (all 10 λ vmapped, $FT_STEPS steps) ==="
if [ ! -d "$FT/$RUN/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli --data_root "$DATA" --run_name "$RUN" \
        --ckpt_dir "$FT" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --init_from "$CKPT/noise_stage" --quant_mode mix \
        --max_steps "$FT_STEPS" --epochs 600 --batch_size 16 \
        --select best --lr 3e-5 --lr_schedule cosine \
        --decay_steps "$FT_STEPS" --warmup_steps 50 || exit 1
fi

echo "=== [2/4] install mix checkpoints (STE stage preserved) ==="
mkdir -p "$CKPT/ste_stage"
for lam in 1 3 10 25 50 100 250 500 1000 10000; do
    name="alpha${lam}lambda"
    [ -d "$CKPT/ste_stage/$name" ] || mv "$CKPT/$name" "$CKPT/ste_stage/$name"
    rm -rf "$CKPT/$name"
    cp -r "$FT/$RUN/$name" "$CKPT/$name"
done

echo "=== [3/4] flagship BD re-eval (family curves reused) ==="
rm -f "$OUT/bd_live/agg_model_rd_summary.csv" \
      "$OUT/bd_live/per_image_per_lambda_results.csv"
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --reuse --live "$ALL_FAMILIES" || exit 1

echo "=== [4/4] acceptance check ==="
python scripts/check_bd_live.py "$OUT/bd_live" | tee "$OUT/bd_live/CHECK.txt"

echo "mix fine-tune + BD refresh complete: $OUT/bd_live"
