#!/usr/bin/env bash
# Round-2 live-baseline demonstration: train the flagship lambda sweep AND
# the in-framework zoo families (bmshj2018, mbt2018_mean) on the SAME
# synthetic dataset, then produce the live same-dataset BD comparison
# (bd_metrics_summary_{family}_live.csv) and the bpp-matched visual
# comparisons vs the learned baselines — the reference's
# writeupbdcurvesballeALL.py / resultsanalysisballe.py workflow with the
# baseline actually *run*, not read from recorded CSVs.
#
# Usage: scripts/live_baseline_demo.sh [WORK_DIR] [STEPS]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-3000}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results"
CKPT="checkpoints/live"
mkdir -p "$DATA" "$EVAL" "$OUT"

python - "$DATA" "$EVAL" <<'PY'
import sys
from dsic_tpu.data.synthetic import write_synthetic_dataset
write_synthetic_dataset(sys.argv[1], n=320, hw=(120, 120), seed=7)
write_synthetic_dataset(sys.argv[2], n=256, hw=(120, 120), seed=99)
print("datasets ready")
PY

echo "=== [1/5] flagship lambda sweep ($STEPS steps each) ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --lambda_sweep --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [2/5] bmshj2018 quality sweep ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --family bmshj2018 --quality_sweep 1,2,3,4,5,6,7,8 \
    --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [3/5] mbt2018_mean quality sweep ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --family mbt2018_mean --quality_sweep 1,2,3,4,5,6,7,8 \
    --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [4/5] live BD + bpp-matched comparisons (held-out eval set) ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 --live bmshj2018,mbt2018_mean
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$EVAL/patch_0001.png" --out "$OUT/compare_bmshj2018" \
    --lambdas 10,100,1000 --vs bmshj2018
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$EVAL/patch_0001.png" --out "$OUT/compare_mbt2018_mean" \
    --lambdas 10,100,1000 --vs mbt2018_mean

echo "=== [5/5] codec throughput: global + spatial modes ==="
python -m dsic_tpu.eval.cli throughput --batch 32 | tee "$OUT/throughput_global.txt"
python -m dsic_tpu.eval.cli throughput --batch 32 --spatial_params | tee "$OUT/throughput_spatial.txt"

echo "live baseline demo complete: $OUT"
