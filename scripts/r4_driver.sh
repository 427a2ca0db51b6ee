#!/usr/bin/env bash
# Round-4 unattended TPU pipeline driver:
#   [A] deep retrain + three-way-split eval  (scripts/live_retrain_r4.sh)
#   [B] install bd_live/val_curves           -> git commit
#   [C] artifact refresh                      (scripts/live_artifacts_r4.sh)
#   [D] install compare/latents/throughput   -> git commit
#   [E] final bench capture                  -> git commit
#
# The driver GIT-COMMITS measured results itself so they survive even if no
# interactive session is alive. Exactly ONE TPU job runs at a time (this
# script is strictly sequential; do NOT start a second TPU job beside it).
# Every stage of live_retrain_r4.sh is skip-if-done, so re-running this
# driver after a preemption resumes where it left off.
#
# Usage: scripts/r4_driver.sh [WORK_DIR] [STEPS]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live4}"
STEPS="${2:-12000}"
PIDFILE="$WORK/r4_driver.pid"
mkdir -p "$WORK"
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "driver already running (pid $(cat "$PIDFILE")); refusing to start"
    exit 1
fi
echo $$ > "$PIDFILE"

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

commit_results() {
    # Commit only the installed artifact tree; bounded retry in case an
    # interactive session briefly holds the index lock.
    local msg="$1"
    for _ in 1 2 3; do
        if git add demo_results/live && git commit -m "$msg"; then
            return 0
        fi
        sleep 15
    done
    echo "[driver $(stamp)] WARN: git commit failed: $msg"
    return 1
}

echo "[driver $(stamp)] === [A] retrain (STEPS=$STEPS) ==="
if bash scripts/live_retrain_r4.sh "$WORK" "$STEPS" live4; then
    echo "[driver $(stamp)] retrain OK"
else
    rc=$?  # capture BEFORE $(stamp) clobbers $?
    echo "[driver $(stamp)] FATAL: retrain failed (rc=$rc)"
    rm -f "$PIDFILE"
    exit 1
fi

echo "[driver $(stamp)] === [B] install bd_live + val_curves ==="
if bash scripts/install_r4_artifacts.sh "$WORK"; then
    commit_results "Round-4 measured BD table and selection-val curves (STEPS=$STEPS, three-way split)"
fi

echo "[driver $(stamp)] === [C] artifact refresh ==="
if bash scripts/live_artifacts_r4.sh "$WORK" live4; then
    echo "[driver $(stamp)] artifacts OK"
else
    echo "[driver $(stamp)] WARN: artifact refresh failed (rc=$?); continuing"
fi

echo "[driver $(stamp)] === [D] install full artifact set ==="
if bash scripts/install_r4_artifacts.sh "$WORK"; then
    commit_results "Round-4 bpp-matched comparisons, latent analysis, and throughput artifacts"
fi

echo "[driver $(stamp)] === [E] final bench capture ==="
if timeout 1800 python bench.py > "$WORK/bench_final.json" 2> "$WORK/bench_final.err"; then
    mkdir -p demo_results/live
    cp "$WORK/bench_final.json" demo_results/live/bench_r4.json
    commit_results "Round-4 bench capture on live TPU"
    cat "$WORK/bench_final.json"
else
    echo "[driver $(stamp)] WARN: final bench failed"
    tail -3 "$WORK/bench_final.err" || true
fi

rm -f "$PIDFILE"
echo "[driver $(stamp)] === driver complete ==="
