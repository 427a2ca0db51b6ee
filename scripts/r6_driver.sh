#!/usr/bin/env bash
# Round-5 unattended pipeline ("live6"): full retrain on the rev-c corpus
# (data/synthetic.py grating-band cap — the measured fix for round-4's
# non-monotone MS-SSIM curve, scripts/diag_floor.py) with the round-5
# hardening set:
#   * single-TPU lockfile (scripts/tpu_lock.sh) held for the whole
#     pipeline, released around bench so bench.py's own lock acquisition
#     can't deadlock (VERDICT r4 #3);
#   * the acceptance check GATES the canonical install: check_bd_live.py
#     PASS -> demo_results/live/bd_live + a PASS commit; FAIL -> the table
#     stays quarantined in demo_results/live/wip_live6 and the commit
#     message says FAIL (VERDICT r4 #2);
#   * zoo provenance recorded truthfully per family (retrained on rev-c vs
#     reused from the live5 rev-b archive — VERDICT r4 #6; the live5 zoo
#     itself was retrained from scratch on the rev-b corpus, 6000 steps);
#   * optional wall-clock deadline (R6_DEADLINE_EPOCH): the driver stops
#     cleanly between stages and releases the TPU lock so the round-end
#     bench capture finds a free chip (BENCH r3/r4 failure mode).
#
# GIT-COMMITS measured results itself. Exactly ONE TPU job at a time.
# Every stage is skip-if-done, so re-running resumes.
#
# Usage: scripts/r6_driver.sh [WORK_DIR] [STEPS]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live6}"
STEPS="${2:-6000}"
RUN=live6
PIDFILE="$WORK/r6_driver.pid"
mkdir -p "$WORK"
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "driver already running (pid $(cat "$PIDFILE")); refusing to start"
    exit 1
fi
echo $$ > "$PIDFILE"

source scripts/tpu_lock.sh
tpu_lock_acquire "r6_driver" 1800 || exit 3
cleanup() { tpu_lock_release; rm -f "$PIDFILE"; }
trap cleanup EXIT

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

past_deadline() {
    [ -n "${R6_DEADLINE_EPOCH:-}" ] &&
        [ "$(date +%s)" -ge "$R6_DEADLINE_EPOCH" ]
}

commit_results() {  # <msg> <pathspec...>
    local msg="$1"; shift
    for _ in 1 2 3; do
        if git add "$@" && git commit -m "$msg" -- "$@"; then
            return 0
        fi
        sleep 15
    done
    echo "[driver $(stamp)] WARN: git commit failed: $msg"
    return 1
}

echo "[driver $(stamp)] === [0] restore archived checkpoints missing on disk ==="
RESTORED_FROM_NPZ=no
for pair in "flagship_noise_stage:noise_stage" "flagship_ste_stage:ste_stage" \
            "flagship_mix_stage:mix_stage" "zoo:."; do
    src="weights/${RUN}/${pair%%:*}"
    dst="checkpoints/${RUN}/${pair##*:}"
    if [ -d "$src" ]; then
        n=$(python scripts/pack_ckpt.py unpack "$src" "$dst" \
                --cpu --skip-existing | grep -c '^unpacked' || true)
        [ "${n:-0}" -gt 0 ] && RESTORED_FROM_NPZ=yes
    fi
done
export RESTORED_FROM_NPZ

export N_VAL="${N_VAL:-192}" N_TEST="${N_TEST:-500}"
export FAMILIES="${FAMILIES:-bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022}"
export ZOO_REUSE="${ZOO_REUSE:-}"
export PACK_WEIGHTS="${PACK_WEIGHTS:-1}"

if past_deadline; then
    echo "[driver $(stamp)] deadline reached before stage A; exiting"
    exit 0
fi
echo "[driver $(stamp)] === [A] retrain on rev-c corpus (STEPS=$STEPS, RUN=$RUN, zoo-reuse=[${ZOO_REUSE:-none}]) ==="
if bash scripts/live_retrain_r5.sh "$WORK" "$STEPS" "$RUN"; then
    echo "[driver $(stamp)] retrain OK"
else
    rc=$?
    echo "[driver $(stamp)] FATAL: retrain failed (rc=$rc)"
    exit 1
fi

echo "[driver $(stamp)] === [B] gated install of bd_live + val_curves ==="
CHECK="$WORK/results_r5/bd_live/CHECK.txt"
if grep -q '^CHECK_RC=0' "$CHECK" 2>/dev/null; then
    VERDICT="PASS"
    INSTALL_BD=1 bash scripts/install_r5_artifacts.sh "$WORK" &&
        commit_results \
            "Round-5 report-test BD table, rev-c corpus (acceptance check PASS: monotone flagship curve incl. MS-SSIM, span gate $( \
                grep -o 'msssim span: [0-9.]*' "$CHECK" | head -1)) — flagship live6 STEPS=$STEPS, ${N_TEST}-image report-test, zoo-reuse=[${ZOO_REUSE:-none}]" \
            demo_results/live/bd_live demo_results/live/val_curves
else
    VERDICT="FAIL"
    echo "[driver $(stamp)] acceptance check FAILED — bd_live stays quarantined in wip_$RUN"
    INSTALL_BD=0 bash scripts/install_r5_artifacts.sh "$WORK" &&
        commit_results \
            "Round-5 val curves (acceptance check FAIL on report-test BD — table quarantined in wip_$RUN, see its CHECK.txt; flagship live6 STEPS=$STEPS, zoo-reuse=[${ZOO_REUSE:-none}])" \
            demo_results/live/val_curves
fi

if past_deadline; then
    echo "[driver $(stamp)] deadline reached after install; exiting"
    exit 0
fi

echo "[driver $(stamp)] === [E] bench capture (driver lock released around it) ==="
tpu_lock_release
if timeout 2400 python bench.py > "$WORK/bench_final.json" 2> "$WORK/bench_final.err"; then
    mkdir -p demo_results/live
    cp "$WORK/bench_final.json" demo_results/live/bench_r5.json
    commit_results "Round-5 bench capture on live TPU (decomposed sub-metrics)" \
        demo_results/live/bench_r5.json
    cat "$WORK/bench_final.json"
else
    echo "[driver $(stamp)] WARN: bench failed"
    tail -3 "$WORK/bench_final.err" || true
fi
tpu_lock_acquire "r6_driver" 1800 || exit 3

if past_deadline; then
    echo "[driver $(stamp)] deadline reached before artifacts; exiting"
    exit 0
fi

echo "[driver $(stamp)] === [C] artifact refresh (all six compare legs, latents, throughput) ==="
if FAMILIES="bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022" \
   RESULTS_SUBDIR=results_r5 bash scripts/live_artifacts_r4.sh "$WORK" "$RUN"; then
    echo "[driver $(stamp)] artifacts OK"
else
    echo "[driver $(stamp)] WARN: artifact refresh failed (rc=$?); continuing"
fi

echo "[driver $(stamp)] === [D] install full artifact set ==="
if INSTALL_BD="$([ "$VERDICT" = PASS ] && echo 1 || echo 0)" \
   bash scripts/install_r5_artifacts.sh "$WORK"; then
    commit_results "Round-5 bpp-matched comparisons, latent analysis, and throughput artifacts (live6, rev-c corpus)" \
        demo_results/live
fi

echo "[driver $(stamp)] === driver complete (acceptance: $VERDICT) ==="
