#!/usr/bin/env bash
# Install the round-4 measured artifacts from a live_retrain_r4.sh +
# live_artifacts_r4.sh work dir into demo_results/live, replacing the
# round-3 set. The committed layout becomes:
#   demo_results/live/bd_live/      report-test BD table (end-to-end measured
#                                   on test_data; never composed) + CHECK.txt
#   demo_results/live/val_curves/   per-stage selection-val curves +
#                                   stage_selection.csv (the ONLY data any
#                                   selection decision saw)
#   demo_results/live/compare_*/    bpp-matched visual comparisons
#   demo_results/live/latents/      flagship latent-analysis artifact set
#   demo_results/live/throughput_*.txt
#
# Usage: scripts/install_r4_artifacts.sh [WORK_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live4}"
SRC="$WORK/results_r4"
DST="demo_results/live"

[ -f "$SRC/bd_live/agg_model_rd_summary.csv" ] || {
    echo "no measured bd_live in $SRC" >&2; exit 1; }
[ -f "$SRC/val_curves/stage_selection.csv" ] || {
    echo "no selection record in $SRC" >&2; exit 1; }

rm -rf "$DST/bd_live" "$DST/val_curves" "$DST"/compare_* "$DST/latents"
cp -r "$SRC/bd_live" "$DST/bd_live"
cp -r "$SRC/val_curves" "$DST/val_curves"
for d in "$SRC"/compare_*; do
    [ -d "$d" ] && cp -r "$d" "$DST/$(basename "$d")"
done
[ -d "$SRC/latents" ] && cp -r "$SRC/latents" "$DST/latents"
for f in throughput_global.txt throughput_spatial.txt; do
    [ -f "$SRC/$f" ] && cp "$SRC/$f" "$DST/$f"
done
echo "installed round-4 artifacts into $DST:"
find "$DST/bd_live" "$DST/val_curves" -type f | sort
