#!/usr/bin/env bash
# Round-3 finalization: compose the flagship from per-lambda best-val stage
# winners, run a short remedial low-LR mixed-quantization fine-tune FROM the
# composite (the mix stage mistakenly seeded from the noise stage, regressing
# low lambda — see docs/DESIGN.md), re-measure the installed curve end-to-end,
# re-select if the remedial stage regressed anywhere, and re-run the
# acceptance check.
#
# Usage: scripts/live_finalize_r3.sh [WORK_DIR] [CKPT_RUN] [FT_STEPS] [RESELECT_DEADLINE_EPOCH]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live_demo}"
RUN="${2:-live3}"
FT_STEPS="${3:-3000}"
DEADLINE="${4:-0}"   # skip the post-reselect re-measure after this epoch time
OUT="$WORK/results_r3"
BD="$OUT/bd_live"
CKPT="checkpoints/$RUN"
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
ALL_FAMILIES="bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022"

echo "=== [1/6] snapshot mix stage; best-val selection (mix vs ste) ==="
mkdir -p "$CKPT/mix_stage"
for lam in 1 3 10 25 50 100 250 500 1000 10000; do
    name="alpha${lam}lambda"
    [ -d "$CKPT/mix_stage/$name" ] || cp -r "$CKPT/$name" "$CKPT/mix_stage/$name"
done
[ -f "$BD/agg_model_rd_summary_mix_stage.csv" ] || \
    cp "$BD/agg_model_rd_summary.csv" "$BD/agg_model_rd_summary_mix_stage.csv"
python scripts/select_flagship_stage.py "$BD" "$CKPT" \
    --stages mix_stage=agg_model_rd_summary_mix_stage.csv,ste_stage=agg_model_rd_summary_ste_stage.csv \
    --installed mix_stage --require_monotone --force_install || exit 1

if [ "$FT_STEPS" -le 0 ]; then
    echo "=== [2-3/6] FT_STEPS=$FT_STEPS: skipping remedial stage ==="
    echo "=== [4/6] BD re-measure of the installed (composite) curve ==="
    rm -f "$BD/agg_model_rd_summary.csv" "$BD/per_image_per_lambda_results.csv"
    python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$WORK/eval_data" \
        --out "$BD" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
        --reuse --live "$ALL_FAMILIES" || exit 1
    echo "=== [6/6] acceptance check ==="
    python scripts/check_bd_live.py "$BD" | tee "$BD/CHECK.txt"
    echo "finalize (no-remedial) complete: $BD"
    exit 0
fi

echo "=== [2/6] remedial low-LR mix fine-tune from the composite ($FT_STEPS steps) ==="
if [ ! -d "checkpoints/${RUN}remedial/$RUN/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli --data_root "$WORK/data" --run_name "$RUN" \
        --ckpt_dir "checkpoints/${RUN}remedial" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --init_from "$CKPT" --quant_mode mix \
        --max_steps "$FT_STEPS" --epochs 600 --batch_size 16 \
        --select best --lr 1e-5 --lr_schedule cosine \
        --decay_steps "$FT_STEPS" --warmup_steps 50 || exit 1
fi

echo "=== [3/6] install remedial stage ==="
mkdir -p "$CKPT/remedial_stage"
for lam in 1 3 10 25 50 100 250 500 1000 10000; do
    name="alpha${lam}lambda"
    [ -d "$CKPT/remedial_stage/$name" ] || \
        cp -r "checkpoints/${RUN}remedial/$RUN/$name" "$CKPT/remedial_stage/$name"
    rm -rf "$CKPT/$name"
    cp -r "$CKPT/remedial_stage/$name" "$CKPT/$name"
done

echo "=== [4/6] BD re-measure of the installed (remedial) curve ==="
rm -f "$BD/agg_model_rd_summary.csv" "$BD/per_image_per_lambda_results.csv"
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$WORK/eval_data" \
    --out "$BD" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
    --reuse --live "$ALL_FAMILIES" || exit 1
cp "$BD/agg_model_rd_summary.csv" "$BD/agg_model_rd_summary_remedial_stage.csv"

echo "=== [5/6] final selection across remedial/ste/mix stages ==="
python scripts/select_flagship_stage.py "$BD" "$CKPT" \
    --stages remedial_stage=agg_model_rd_summary_remedial_stage.csv,ste_stage=agg_model_rd_summary_ste_stage.csv,mix_stage=agg_model_rd_summary_mix_stage.csv \
    --installed remedial_stage --require_monotone --force_install | tee /tmp/reselect_r3.log || exit 1
# only non-remedial winners change the installed curve (force_install
# re-copies remedial rows that are already measured)
swaps=$(grep -cE "^\[select\] install (ste|mix)_stage" /tmp/reselect_r3.log || true)
if [ "$swaps" -gt 0 ]; then
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
        echo "[finalize] $swaps swap(s) but past re-measure deadline; composing"
        echo "[finalize] NOTE: agg curve composed from per-stage measured rows"
        python - "$BD" <<'EOF'
import csv, sys, os
bd = sys.argv[1]
sel = {float(r["lambda"]): r["stage"]
       for r in csv.DictReader(open(os.path.join(bd, "stage_selection.csv")))}
curves = {}
for st in set(sel.values()):
    path = os.path.join(bd, f"agg_model_rd_summary_{st}.csv")
    curves[st] = {float(r["lambda"]): r for r in csv.DictReader(open(path))}
rows = [curves[sel[lam]][lam] for lam in sorted(sel)]
with open(os.path.join(bd, "agg_model_rd_summary.csv"), "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0]))
    w.writeheader(); w.writerows(rows)
EOF
    else
        echo "[finalize] $swaps swap(s); re-measuring installed composite"
        rm -f "$BD/agg_model_rd_summary.csv" "$BD/per_image_per_lambda_results.csv"
        python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$WORK/eval_data" \
            --out "$BD" --max_images 256 --lambdas "$FLAG_LAMBDAS" \
            --reuse --live "$ALL_FAMILIES" || exit 1
    fi
fi

echo "=== [6/6] acceptance check ==="
python scripts/check_bd_live.py "$BD" | tee "$BD/CHECK.txt"
echo "finalize complete: $BD"
