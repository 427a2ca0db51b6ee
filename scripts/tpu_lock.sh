# Single-TPU job lockfile (VERDICT r4 #3 / weak #1) — source this file.
#
# One physical chip, one host: two TPU jobs contend and corrupt each other's
# timings (BENCH_r04 rc=124: the unattended live5 pipeline held the chip
# through the driver's bench window and bench hung until killed). Every
# TPU-holding entry point takes this lock: the unattended drivers (here),
# and bench.py (same pid-file protocol in Python; it FAILS FAST with a
# clear message after a bounded wait instead of hanging).
#
# Protocol: .tpu_lock at the repo root holds "<pid> <label>". Creation is
# O_CREAT|O_EXCL (bash noclobber). A lock whose pid is dead is stale and
# reclaimed. Release on EXIT via trap.
#
# Usage:
#   source scripts/tpu_lock.sh
#   tpu_lock_acquire "r6_driver" [wait_s]   # exits 3 on bounded-wait timeout

TPU_LOCK_PATH="${DSIC_TPU_LOCK:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)/.tpu_lock}"

tpu_lock_release() {
    if [ -f "$TPU_LOCK_PATH" ] && \
       [ "$(awk '{print $1}' "$TPU_LOCK_PATH" 2>/dev/null)" = "$$" ]; then
        rm -f "$TPU_LOCK_PATH"
    fi
}

tpu_lock_acquire() {
    local label="${1:-tpu-job}" wait_s="${2:-600}"
    local deadline=$(( $(date +%s) + wait_s ))
    while true; do
        if ( set -o noclobber; echo "$$ $label" > "$TPU_LOCK_PATH" ) \
               2>/dev/null; then
            trap tpu_lock_release EXIT
            return 0
        fi
        local holder pid
        holder="$(cat "$TPU_LOCK_PATH" 2>/dev/null || true)"
        pid="$(echo "$holder" | awk '{print $1}')"
        if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
            echo "[tpu_lock] reclaiming stale lock ($holder)" >&2
            rm -f "$TPU_LOCK_PATH"
            continue
        fi
        if [ "$(date +%s)" -ge "$deadline" ]; then
            echo "[tpu_lock] FATAL: lock held by live pid $pid ($holder) " \
                 "for >${wait_s}s; refusing to contend for the single TPU" >&2
            return 3
        fi
        sleep 10
    done
}
