#!/usr/bin/env bash
# Watchdog for the round-5 unattended driver: if r6_driver.sh dies (TPU
# outage, OOM, transient crash) relaunch it — every stage is skip-if-done,
# so a relaunch resumes instead of retraining. Respects the wall-clock
# deadline (R6_DEADLINE_EPOCH) and never relaunches past it, so the
# round-end bench capture finds a free chip (VERDICT r4 #3).
#
# Usage: R6_DEADLINE_EPOCH=... nohup scripts/watchdog_r6.sh [WORK] [STEPS] &
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live6}"
STEPS="${2:-6000}"
PIDFILE="$WORK/r6_driver.pid"
DONE_MARK="$WORK/driver_complete"

while true; do
    sleep 120
    if [ -f "$DONE_MARK" ]; then
        echo "[watchdog $(date -u '+%H:%M:%S')] driver completed; exiting"
        exit 0
    fi
    if [ -n "${R6_DEADLINE_EPOCH:-}" ] && \
       [ "$(date +%s)" -ge "$R6_DEADLINE_EPOCH" ]; then
        echo "[watchdog $(date -u '+%H:%M:%S')] deadline passed; exiting"
        exit 0
    fi
    if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
        continue
    fi
    echo "[watchdog $(date -u '+%H:%M:%S')] driver not running; relaunching"
    if bash scripts/r6_driver.sh "$WORK" "$STEPS" \
           >> "${WATCHDOG_DRIVER_LOG:-/root/work_driver.log}" 2>&1; then
        touch "$DONE_MARK"
        echo "[watchdog $(date -u '+%H:%M:%S')] driver completed cleanly"
        exit 0
    fi
    echo "[watchdog $(date -u '+%H:%M:%S')] driver exited nonzero; will retry"
done
