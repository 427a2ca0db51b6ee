#!/usr/bin/env bash
# Round-4 FINAL unattended pipeline ("live5"): flagship retrain on the FIXED
# corpus (data/synthetic.py structured-learnable noise) with the FIXED
# round/STE-mode bin-integral rate (ops/distributions.py
# student_t_bin_neg_log2_prob), then the same three-way-split eval as
# live_retrain_r4.sh.
#
# Differences vs r4_driver.sh, all forced by the remaining round budget
# (~2h of TPU wall-clock at launch):
#   - flagship retrain at STEPS default 6000. The zoo stage [0] below TRIES
#     to reuse checkpoints/live4, but in the actual round-4 run a host
#     restart had already destroyed live4, so the zoo fell through to
#     live_retrain_r4.sh's training stages and was RETRAINED FROM SCRATCH
#     on the fixed corpus at the same 6000 steps (git log: six "Archive
#     live5 ... zoo weights" commits, 2026-08-19). The original header here
#     said "reused from live4 / trained on the previous corpus" — that
#     provenance was stale and wrong for the committed live5 results
#     (VERDICT r4 weak #4); corrected 2026-08-19. Superseded by
#     scripts/r6_driver.sh, which records zoo provenance per family.
#   - selection-val 192 images, report-test 500 images, 4 BD family legs
#     (+ the live JPEG leg).
#   - bench runs BEFORE the artifact refresh so the headline deliverables
#     (BD table, bench) are committed earliest.
#
# GIT-COMMITS measured results itself so they survive without an
# interactive session. Exactly ONE TPU job at a time. All stages of
# live_retrain_r4.sh are skip-if-done, so re-running resumes.
#
# Usage: scripts/r5_driver.sh [WORK_DIR] [STEPS]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/root/work/live5}"
STEPS="${2:-6000}"
RUN=live5
PIDFILE="$WORK/r5_driver.pid"
mkdir -p "$WORK"
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "driver already running (pid $(cat "$PIDFILE")); refusing to start"
    exit 1
fi
echo $$ > "$PIDFILE"

stamp() { date -u '+%Y-%m-%d %H:%M:%S'; }

commit_results() {
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

echo "[driver $(stamp)] === [0] seed live5 zoo from live4 (hardlinks) ==="
for fam in bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard \
           cheng2020_gmm elic2022; do
    for q in 1 2 3 4 5 6 7 8; do
        src="checkpoints/live4/${fam}_q${q}"
        dst="checkpoints/${RUN}/${fam}_q${q}"
        if [ -d "$src" ] && [ ! -d "$dst" ]; then
            mkdir -p "checkpoints/${RUN}"
            cp -al "$src" "$dst"
        fi
    done
done

echo "[driver $(stamp)] === [0b] restore archived checkpoints missing on disk ==="
# A host restart destroys gitignored checkpoints/ but every finished
# training leg is committed to weights/$RUN as f16 npz; restoring the
# missing ones here makes the watchdog's relaunch fully self-healing
# (skip-if-done then skips every restored leg instead of retraining it).
for pair in "flagship_noise_stage:noise_stage" "flagship_ste_stage:ste_stage" \
            "flagship_mix_stage:mix_stage" "zoo:."; do
    src="weights/${RUN}/${pair%%:*}"
    dst="checkpoints/${RUN}/${pair##*:}"
    if [ -d "$src" ]; then
        python scripts/pack_ckpt.py unpack "$src" "$dst" \
            --cpu --skip-existing \
            || echo "[driver $(stamp)] WARN: restore from $src failed"
    fi
done

export N_VAL="${N_VAL:-192}" N_TEST="${N_TEST:-500}"
export FAMILIES="${FAMILIES:-bmshj2018 mbt2018_mean cheng2020_checkerboard elic2022}"
# archive every finished training leg + measured eval CSV to git as it
# lands (two host restarts this round destroyed all non-git state mid-run)
export PACK_WEIGHTS="${PACK_WEIGHTS:-1}"

echo "[driver $(stamp)] === [A] retrain (STEPS=$STEPS, RUN=$RUN) ==="
if bash scripts/live_retrain_r4.sh "$WORK" "$STEPS" "$RUN"; then
    echo "[driver $(stamp)] retrain OK"
else
    rc=$?
    echo "[driver $(stamp)] FATAL: retrain failed (rc=$rc)"
    rm -f "$PIDFILE"
    exit 1
fi

echo "[driver $(stamp)] === [B] install bd_live + val_curves ==="
if bash scripts/install_r4_artifacts.sh "$WORK"; then
    commit_results "Round-4 final BD table on the fixed corpus (flagship live5 STEPS=$STEPS, 500-image report-test, zoo retrained from scratch on the same corpus at equal steps)"
fi

echo "[driver $(stamp)] === [E] bench capture (before artifacts) ==="
if timeout 1800 python bench.py > "$WORK/bench_final.json" 2> "$WORK/bench_final.err"; then
    mkdir -p demo_results/live
    cp "$WORK/bench_final.json" demo_results/live/bench_r4.json
    commit_results "Round-4 final bench capture on live TPU"
    cat "$WORK/bench_final.json"
else
    echo "[driver $(stamp)] WARN: bench failed"
    tail -3 "$WORK/bench_final.err" || true
fi

echo "[driver $(stamp)] === [C] artifact refresh (all six compare legs) ==="
if FAMILIES="bmshj2018 mbt2018_mean charm2020 cheng2020_checkerboard cheng2020_gmm elic2022" \
   bash scripts/live_artifacts_r4.sh "$WORK" "$RUN"; then
    echo "[driver $(stamp)] artifacts OK"
else
    echo "[driver $(stamp)] WARN: artifact refresh failed (rc=$?); continuing"
fi

echo "[driver $(stamp)] === [D] install full artifact set ==="
if bash scripts/install_r4_artifacts.sh "$WORK"; then
    commit_results "Round-4 bpp-matched comparisons, latent analysis, and throughput artifacts (live5)"
fi

rm -f "$PIDFILE"
echo "[driver $(stamp)] === driver complete ==="
