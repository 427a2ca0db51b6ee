#!/usr/bin/env bash
# Round-4 deep retrain (VERDICT r3 next #1/#2/#3/#10), on the HARDENED
# synthetic corpus (data/synthetic.py round-4 generator: fBm terrain,
# textured parcels, roads, built-up speckle) with a THREE-WAY split:
#
#   train_data  2000 images, seed 7   — trainer input (its own 90/10
#                                       internal val split drives in-run
#                                       best-checkpoint selection)
#   val_data     256 images, seed 55  — STAGE selection only (per-lambda
#                                       cross-stage winner choice)
#   test_data   1000 images, seed 99  — the REPORTED BD table; no selection
#                                       decision ever sees it
#
# Flagship stages (all lambda-vmapped over the 10-point grid):
#   [1] noise   STEPS        (reference quantization relaxation)
#   [2] STE     ~5/16*STEPS  seeded from noise  (closes the noise->round gap)
#   [3] mix     ~3/4*STEPS   seeded from STE    (VERDICT #10: the round-3 mix
#       stage seeded from noise regressed low lambda; seeding from STE makes
#       cross-stage composition unnecessary rather than constrained-away)
# Zoo: all six live families x 8 qualities at the SAME STEPS budget
# (quality-vmapped within equal-(N,M) groups).
#
# Then: stage curves measured on val_data -> select_flagship_stage installs
# winners -> ONE end-to-end `eval.cli bd` of the installed checkpoints on
# test_data (the committed agg_model_rd_summary.csv is never composed) ->
# acceptance check.
#
# Every stage is skip-if-done; a preempted re-run continues (the vmapped
# sweeps additionally auto-resume mid-run from their sweep_state).
#
# Usage: scripts/live_retrain_r4.sh [WORK_DIR] [STEPS] [CKPT_RUN]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live4}"
STEPS="${2:-8000}"
RUN="${3:-live4}"
TRAIN="$WORK/train_data"
VAL="$WORK/val_data"
TEST="$WORK/test_data"
OUT="$WORK/results_r4"
CKPT="checkpoints/$RUN"
FLAG_LAMBDAS="1,3,10,25,50,100,250,500,1000,10000"
ALL_FAMILIES="bmshj2018,mbt2018_mean,charm2020,cheng2020_checkerboard,cheng2020_gmm,elic2022"
WARMUP=$((STEPS / 16))
STE_STEPS=$((STEPS * 5 / 16))
MIX_STEPS=$((STEPS * 3 / 4))
FT_WARMUP_STE=$((STE_STEPS > 200 ? 50 : STE_STEPS / 4 + 1))
FT_WARMUP_MIX=$((MIX_STEPS > 200 ? 50 : MIX_STEPS / 4 + 1))
# corpus sizes (env-overridable so a tiny CPU pilot can exercise the whole
# flow before committing TPU hours)
N_TRAIN="${N_TRAIN:-2000}"
N_VAL="${N_VAL:-256}"
N_TEST="${N_TEST:-1000}"
MSS_SPAN_GATE="${MSS_SPAN_GATE:-0.05}"
BATCH="${BATCH:-16}"
FAMILIES="${FAMILIES:-bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022}"
EXTRA_CFG=(); [ -n "${CFG:-}" ] && EXTRA_CFG=(--config "$CFG")
ALL_FAMILIES="$(echo "$FAMILIES" | tr ' ' ',')"
mkdir -p "$TRAIN" "$VAL" "$TEST" "$OUT"

# --- restart resilience (PACK_WEIGHTS=1, set by the unattended driver) ---
# The build VM persists ONLY git content across a host restart; two restarts
# this round destroyed gitignored checkpoints/ and the whole $WORK tree
# mid-pipeline. When enabled: (a) every finished training leg is packed to a
# committable f16 npz (scripts/pack_ckpt.py) and git-committed immediately,
# (b) measured eval CSVs are mirrored into demo_results/live/wip_$RUN and
# committed, and the eval stages re-seed from that mirror on a rerun so a
# restart costs minutes, not the multi-hour leg. All hooks are best-effort
# (never fail the pipeline).
PACK_WEIGHTS="${PACK_WEIGHTS:-0}"
WIP="demo_results/live/wip_$RUN"

archive_weights() {  # <src_root> <dst_subdir> <glob> <commit_msg>
    [ "$PACK_WEIGHTS" = 1 ] || return 0
    (
        set +e
        python scripts/pack_ckpt.py pack "$1" "weights/$RUN/$2" \
            --glob "$3" --cpu &&
            git add "weights/$RUN/$2" && git commit -m "$4"
    ) || echo "WARN: weight archival failed for $2 (continuing)"
    return 0
}

commit_wip() {  # <commit_msg>
    [ "$PACK_WEIGHTS" = 1 ] || return 0
    ( set +e; git add "$WIP" && git commit -m "$1" ) \
        || echo "WARN: wip commit failed (continuing)"
    return 0
}

if [ ! -f "$TRAIN/patch_0001.png" ]; then
python - "$TRAIN" "$VAL" "$TEST" "$N_TRAIN" "$N_VAL" "$N_TEST" <<'PY'
import sys
from dsic_tpu.data.synthetic import write_synthetic_dataset
n_train, n_val, n_test = int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6])
write_synthetic_dataset(sys.argv[1], n=n_train, hw=(120, 120), seed=7)
write_synthetic_dataset(sys.argv[2], n=n_val, hw=(120, 120), seed=55)
write_synthetic_dataset(sys.argv[3], n=n_test, hw=(120, 120), seed=99)
print(f"datasets ready ({n_train} train / {n_val} selection-val / "
      f"{n_test} report-test)")
PY
fi

train_common=("${EXTRA_CFG[@]}" --data_root "$TRAIN" --run_name "$RUN"
              --epochs 600 --batch_size "$BATCH" --select best
              --lr_schedule cosine)

echo "=== [1/10] flagship noise stage ($STEPS steps, grid $FLAG_LAMBDAS) ==="
if [ ! -d "$CKPT/noise_stage/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --max_steps "$STEPS" --decay_steps "$STEPS" \
        --warmup_steps "$WARMUP"
    mkdir -p "$CKPT/noise_stage"
    for lam in 1 3 10 25 50 100 250 500 1000 10000; do
        mv "$CKPT/alpha${lam}lambda" "$CKPT/noise_stage/alpha${lam}lambda"
    done
    archive_weights "$CKPT/noise_stage" flagship_noise_stage 'alpha*lambda' \
        "Archive $RUN flagship noise-stage weights (10 lambdas, f16 npz)"
else
    echo "noise stage exists; skipping"
fi

echo "=== [2/10] flagship STE stage ($STE_STEPS steps, seeded from noise) ==="
if [ ! -d "$CKPT/ste_stage/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --ckpt_dir "checkpoints/${RUN}ste" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --init_from "$CKPT/noise_stage" --quant_mode round \
        --max_steps "$STE_STEPS" --decay_steps "$STE_STEPS" \
        --lr 3e-5 --warmup_steps "$FT_WARMUP_STE"
    mkdir -p "$CKPT/ste_stage"
    for lam in 1 3 10 25 50 100 250 500 1000 10000; do
        cp -r "checkpoints/${RUN}ste/$RUN/alpha${lam}lambda" \
              "$CKPT/ste_stage/alpha${lam}lambda"
    done
    archive_weights "$CKPT/ste_stage" flagship_ste_stage 'alpha*lambda' \
        "Archive $RUN flagship STE-stage weights (10 lambdas, f16 npz)"
else
    echo "STE stage exists; skipping"
fi

echo "=== [3/10] flagship mix stage ($MIX_STEPS steps, seeded from STE) ==="
if [ ! -d "$CKPT/mix_stage/alpha10000lambda" ]; then
    python -m dsic_tpu.train.cli "${train_common[@]}" \
        --ckpt_dir "checkpoints/${RUN}mix" \
        --lambda_vmap --lambdas "$FLAG_LAMBDAS" \
        --init_from "$CKPT/ste_stage" --quant_mode mix \
        --max_steps "$MIX_STEPS" --decay_steps "$MIX_STEPS" \
        --lr 3e-5 --warmup_steps "$FT_WARMUP_MIX"
    mkdir -p "$CKPT/mix_stage"
    for lam in 1 3 10 25 50 100 250 500 1000 10000; do
        cp -r "checkpoints/${RUN}mix/$RUN/alpha${lam}lambda" \
              "$CKPT/mix_stage/alpha${lam}lambda"
    done
    archive_weights "$CKPT/mix_stage" flagship_mix_stage 'alpha*lambda' \
        "Archive $RUN flagship mix-stage weights (10 lambdas, f16 npz)"
else
    echo "mix stage exists; skipping"
fi

stage=4
for family in $FAMILIES; do
    echo "=== [$stage/10] $family quality-VMAPPED sweep ($STEPS steps) ==="
    done_all=1
    for q in $(seq 1 8); do
        [ -d "$CKPT/${family}_q${q}" ] || done_all=0
    done
    if [ "$done_all" = 1 ]; then
        echo "$family q1-8 exist; skipping"
    else
        python -m dsic_tpu.train.cli "${train_common[@]}" \
            --max_steps "$STEPS" --decay_steps "$STEPS" \
            --warmup_steps "$WARMUP" --family "$family" \
            --quality_sweep 1,2,3,4,5,6,7,8 --quality_vmap
        archive_weights "$CKPT" zoo "${family}_q*" \
            "Archive $RUN $family zoo weights (8 qualities, f16 npz)"
    fi
    stage=$((stage + 1))
done

echo "=== [9/10] stage curves on SELECTION-VAL + cross-stage selection ==="
VBD="$OUT/val_curves"
mkdir -p "$VBD"
for st in noise_stage ste_stage mix_stage; do
    # re-seed from the committed mirror first: a host restart wipes $WORK
    # but each finished val curve was committed below
    if [ ! -f "$VBD/agg_model_rd_summary_${st}.csv" ] && \
       [ -f "$WIP/val_curves/agg_model_rd_summary_${st}.csv" ]; then
        cp "$WIP/val_curves/agg_model_rd_summary_${st}.csv" "$VBD/"
        echo "re-seeded $st val curve from committed mirror"
    fi
    if [ ! -f "$VBD/agg_model_rd_summary_${st}.csv" ]; then
        rm -f "$VBD/agg_model_rd_summary.csv" \
              "$VBD/per_image_per_lambda_results.csv"
        python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" bd \
            --ckpt_root "$CKPT/$st" \
            --images "$VAL" --out "$VBD" --max_images "$N_VAL" \
            --lambdas "$FLAG_LAMBDAS"
        mv "$VBD/agg_model_rd_summary.csv" \
           "$VBD/agg_model_rd_summary_${st}.csv"
        if [ "$PACK_WEIGHTS" = 1 ]; then
            mkdir -p "$WIP/val_curves"
            cp "$VBD/agg_model_rd_summary_${st}.csv" "$WIP/val_curves/" \
                || true
            commit_wip "WIP: $RUN selection-val curve for $st (measured)"
        fi
    fi
done
# install per-lambda winners at $CKPT/alpha{lam}lambda (selection sees ONLY
# the val curves; --installed is a dummy here since nothing is at the root
# yet -> force_install copies every winner from its stage snapshot)
python scripts/select_flagship_stage.py "$VBD" "$CKPT" \
    --stages mix_stage=agg_model_rd_summary_mix_stage.csv,ste_stage=agg_model_rd_summary_ste_stage.csv,noise_stage=agg_model_rd_summary_noise_stage.csv \
    --installed mix_stage --require_monotone --force_install

echo "=== [10/10] end-to-end BD on REPORT-TEST (installed checkpoints) ==="
BD="$OUT/bd_live"
mkdir -p "$BD"
rm -f "$BD/agg_model_rd_summary.csv" "$BD/per_image_per_lambda_results.csv"
# Re-seed finished legs from the committed mirror (each mirrored CSV was
# measured end-to-end on $TEST before being committed — --reuse then skips
# exactly those legs; partial legs never write an agg CSV, so they rerun).
if [ -d "$WIP/bd_live" ]; then
    for f in "$WIP/bd_live"/agg_*.csv; do
        [ -f "$f" ] || continue
        [ -f "$BD/$(basename "$f")" ] || {
            cp "$f" "$BD/"; echo "re-seeded $(basename "$f") from mirror"; }
    done
fi
# mirror each leg's agg CSV to git as it lands, so a mid-eval restart
# costs one partial leg instead of the whole multi-hour report-test eval
SYNC_PID=""
if [ "$PACK_WEIGHTS" = 1 ]; then
    (
        set +e
        while true; do
            sleep 300
            mkdir -p "$WIP/bd_live"
            changed=0
            for f in "$BD"/agg_*.csv; do
                [ -f "$f" ] || continue
                cmp -s "$f" "$WIP/bd_live/$(basename "$f")" || {
                    cp "$f" "$WIP/bd_live/"; changed=1; }
            done
            if [ "$changed" = 1 ]; then
                git add "$WIP/bd_live" &&
                    git commit -m "WIP: $RUN report-test BD legs (measured, mirrored mid-eval)"
            fi
        done
    ) &
    SYNC_PID=$!
fi
bd_rc=0
python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" bd \
    --ckpt_root "$CKPT" --images "$TEST" \
    --out "$BD" --max_images "$N_TEST" --lambdas "$FLAG_LAMBDAS" \
    --live "$ALL_FAMILIES" --selected 1000,10000 --reuse || bd_rc=$?
if [ -n "$SYNC_PID" ]; then kill "$SYNC_PID" 2>/dev/null || true; fi
[ "$bd_rc" = 0 ] || exit "$bd_rc"
# The acceptance check is a QUALITY gate, not a pipeline failure: record its
# verdict but exit 0 so an unattended driver still proceeds to artifacts +
# bench (a deterministic FAIL would otherwise trigger pointless retries of
# the full report-test BD eval and skip the artifact refresh entirely).
set +e
python scripts/check_bd_live.py "$BD" --min-mss-span "$MSS_SPAN_GATE" | tee "$BD/CHECK.txt"
check_rc=${PIPESTATUS[0]}
set -e
echo "CHECK_RC=$check_rc" >> "$BD/CHECK.txt"
echo "round-4 retrain complete: $BD (acceptance check rc=$check_rc)"
