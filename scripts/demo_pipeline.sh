#!/usr/bin/env bash
# End-to-end demonstration: synthetic dataset -> lambda-sweep training ->
# full evaluation suite. Mirrors the reference workflow
# (train.py + modelseval.py + writeupbdcurves* + eval_selfcontained_entropy +
# distribution_check) in one script.
#
# Usage: scripts/demo_pipeline.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dsic_demo}"
DATA="$WORK/data"
OUT="$WORK/results"
mkdir -p "$DATA" "$OUT"

python - "$DATA" <<'PY'
import sys
from dsic_tpu.data.synthetic import write_synthetic_dataset
from dsic_tpu.utils.image_io import save_image
from dsic_tpu.data.synthetic import synthetic_patches
write_synthetic_dataset(sys.argv[1], n=320, hw=(120, 120), seed=7)
save_image(sys.argv[1] + "/../scene.png", synthetic_patches(1, (700, 900), seed=42)[0])
print("dataset ready")
PY

python -m dsic_tpu.train.cli --data_root "$DATA" --run_name demo \
    --lambda_sweep --max_steps 600 --epochs 50 --batch_size 16
CKPT=checkpoints/demo

python -m dsic_tpu.eval.cli rd --ckpt_root "$CKPT" --images "$DATA" \
    --out "$OUT/rd" --max_images 64
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$DATA" \
    --out "$OUT/bd" --max_images 64
python -m dsic_tpu.eval.cli entropy --ckpt "$CKPT/alpha1000lambda" \
    --image "$DATA/patch_0000.png" --output "$OUT/recon_1000.png"
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$DATA/patch_0001.png" --out "$OUT/compare" --lambdas 10,100,1000
python -m dsic_tpu.eval.cli latents --ckpt "$CKPT/alpha1000lambda" \
    --images "$DATA" --out "$OUT/latents" --max_images 32
python -m dsic_tpu.eval.cli scene --ckpt "$CKPT/alpha1000lambda" \
    --image "$WORK/scene.png" --out "$OUT/scene_recon.png"
echo "demo complete: $OUT"
