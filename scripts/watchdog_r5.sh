#!/usr/bin/env bash
# Watchdog for the unattended live5 pipeline (scripts/r5_driver.sh).
#
# The TPU claim can drop for minutes at a time (observed rounds 2-4); a
# backend error mid-train kills train.cli and the driver exits FATAL even
# though every stage is skip-if-done and the vmapped sweeps resume from
# their own sweep_state. This loop relaunches the dead driver (bounded
# number of times, with a cool-down) until its log says "driver complete".
#
# Usage: scripts/watchdog_r5.sh [WORK_DIR] [STEPS] [LOG]
set -u
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live5}"
STEPS="${2:-6000}"
LOG="${3:-/root/work_driver.log}"
PIDFILE="$WORK/r5_driver.pid"
MAX_RELAUNCH=20
export FAMILIES="${FAMILIES:-bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022}"

relaunches=0
while true; do
    sleep 600
    if grep -q "driver complete" "$LOG" 2>/dev/null; then
        echo "[watchdog $(date -u '+%H:%M:%S')] driver complete; exiting"
        exit 0
    fi
    if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
        continue  # healthy
    fi
    if [ "$relaunches" -ge "$MAX_RELAUNCH" ]; then
        echo "[watchdog $(date -u '+%H:%M:%S')] relaunch budget exhausted"
        exit 1
    fi
    relaunches=$((relaunches + 1))
    echo "[watchdog $(date -u '+%H:%M:%S')] driver dead; relaunch #$relaunches (cool-down 120s)"
    sleep 120
    # never start a second TPU job: wait out any orphaned pipeline python
    # (observe only -- no pattern kills)
    for _ in $(seq 1 30); do
        if ps -eo args | grep -v grep | grep -q "python -m dsic_tpu"; then
            echo "[watchdog] orphaned pipeline python still running; waiting 60s"
            sleep 60
        else
            break
        fi
    done
    bash scripts/r5_driver.sh "$WORK" "$STEPS" >> "$LOG" 2>&1
done
