#!/usr/bin/env bash
# Install round-5 measured artifacts from a live_retrain_r5.sh +
# live_artifacts_r4.sh work dir into demo_results/live.
#
# VERDICT r4 #2: the canonical demo_results/live/bd_live only ever holds a
# table that PASSED scripts/check_bd_live.py — the caller must pass
# INSTALL_BD=1 only on CHECK_RC=0 (a failing table stays quarantined in
# demo_results/live/wip_$RUN, where the pipeline already mirrors it).
# val_curves / compare_* / latents / throughput are verdict-independent
# measurements and install either way.
#
# Usage: INSTALL_BD=0|1 scripts/install_r5_artifacts.sh [WORK_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live6}"
SRC="$WORK/results_r5"
DST="demo_results/live"
INSTALL_BD="${INSTALL_BD:-0}"

[ -f "$SRC/val_curves/stage_selection.csv" ] || {
    echo "no selection record in $SRC" >&2; exit 1; }

if [ "$INSTALL_BD" = 1 ]; then
    [ -f "$SRC/bd_live/agg_model_rd_summary.csv" ] || {
        echo "INSTALL_BD=1 but no measured bd_live in $SRC" >&2; exit 1; }
    grep -q "^CHECK_RC=0" "$SRC/bd_live/CHECK.txt" || {
        echo "refusing to install bd_live: CHECK.txt is not a PASS" >&2
        exit 1; }
    rm -rf "$DST/bd_live"
    cp -r "$SRC/bd_live" "$DST/bd_live"
fi

rm -rf "$DST/val_curves"
cp -r "$SRC/val_curves" "$DST/val_curves"
# Per-leg compare install: a deadline-stopped partial artifact refresh
# (live_artifacts_r4.sh rc=42) must only replace the legs it actually
# re-measured, never delete the ones it didn't get to.
if compgen -G "$SRC/compare_*" > /dev/null; then
    for d in "$SRC"/compare_*; do
        [ -d "$d" ] || continue
        rm -rf "$DST/$(basename "$d")"
        cp -r "$d" "$DST/$(basename "$d")"
    done
fi
if [ -d "$SRC/latents" ]; then
    rm -rf "$DST/latents"
    cp -r "$SRC/latents" "$DST/latents"
fi
for f in throughput_global.txt throughput_spatial.txt; do
    [ -f "$SRC/$f" ] && cp "$SRC/$f" "$DST/$f"
done
echo "installed round-5 artifacts into $DST (bd_live: $INSTALL_BD):"
find "$DST/val_curves" -type f | sort
[ "$INSTALL_BD" = 1 ] && find "$DST/bd_live" -type f | sort || true
