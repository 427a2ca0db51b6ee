#!/usr/bin/env bash
# Round-4 artifact refresh (VERDICT r3 next #5/#9): bpp-matched visual
# comparisons for ALL six live zoo families + JPEG, the full flagship
# latent-analysis artifact set (5 kinds incl. latent_histograms +
# studentt_best_histograms), and codec throughput — against the round-4
# checkpoints on the report-test set. Mirrors the reference's
# resultsanalysis* workflow (/root/reference/code/modelv2/
# resultsanalysisballe.py:139-268 et al.).
#
# Usage: scripts/live_artifacts_r4.sh [WORK_DIR] [CKPT_RUN] [MARKER_FILE]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live4}"
RUN="${2:-live4}"
MARKER="${3:-}"
TEST="$WORK/test_data"
OUT="$WORK/${RESULTS_SUBDIR:-results_r4}"
CKPT="checkpoints/$RUN"
FAMILIES="${FAMILIES:-bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022}"
# CFG: optional model-config override so a scaled-down CPU pilot can exercise
# the whole artifact flow (same knob as live_retrain_r4.sh)
EXTRA_CFG=(); [ -n "${CFG:-}" ] && EXTRA_CFG=(--config "$CFG")

if [[ -n "$MARKER" ]]; then
    echo "waiting for $MARKER ..."
    while [[ ! -f "$MARKER" ]]; do sleep 30; done
    echo "marker present"
fi
mkdir -p "$OUT"

# Honor the driver's wall-clock deadline BETWEEN legs (r6_driver.sh only
# checks it between stages, so a leg started at deadline-minus-epsilon
# would otherwise hold the single TPU through the round-end bench window —
# the VERDICT r4 #3 failure mode). rc=42 tells the driver this was a clean
# early stop, not a broken leg; install_r5_artifacts.sh installs per-leg
# so a partial refresh never deletes legs it didn't re-measure.
deadline_stop() {
    if [ -n "${R6_DEADLINE_EPOCH:-}" ] &&
       [ "$(date +%s)" -ge "$R6_DEADLINE_EPOCH" ]; then
        echo "deadline reached — stopping artifact refresh early (partial: $OUT)"
        exit 42
    fi
}

# Cheap, whole-class artifacts first (latents = all 5 kinds in one run,
# throughput = 2 short runs) so a deadline stop costs compare legs, not
# artifact classes.
deadline_stop
echo "=== flagship latent analysis (all 5 artifact kinds) ==="
python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" latents --ckpt "$CKPT/alpha100lambda" \
    --images "$TEST" --out "$OUT/latents" --max_images 64

deadline_stop
echo "=== codec throughput (global + spatial table modes) ==="
python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" throughput --batch "${TP_BATCH:-32}" \
    | tee "$OUT/throughput_global.txt"
python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" throughput --batch "${TP_BATCH:-32}" --spatial_params \
    | tee "$OUT/throughput_spatial.txt"

for fam in $FAMILIES; do
    deadline_stop
    echo "=== compare vs $fam (bpp-matched) ==="
    python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" compare --ckpt_root "$CKPT" \
        --image "$TEST/patch_0001.png" --out "$OUT/compare_$fam" \
        --lambdas 10,100,1000 --vs "$fam"
done

deadline_stop
echo "=== compare vs jpeg ==="
python -m dsic_tpu.eval.cli "${EXTRA_CFG[@]}" compare --ckpt_root "$CKPT" \
    --image "$TEST/patch_0001.png" --out "$OUT/compare_jpeg" \
    --lambdas 10,100,1000 --vs jpeg

echo "round-4 artifacts complete: $OUT"
