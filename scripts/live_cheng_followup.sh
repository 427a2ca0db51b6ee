#!/usr/bin/env bash
# Follow-up to live_baseline_demo.sh: train the cheng2020_checkerboard
# quality sweep on the same dataset, then refresh the live BD comparison
# with all three families and produce the cheng bpp-matched comparison and
# a real two-pass entropy-coding spot check on a trained checkpoint.
#
# Usage: scripts/live_cheng_followup.sh [WORK_DIR] [STEPS] [WAIT_PID]
set -euo pipefail
WORK="${1:-/root/work/live_demo}"
STEPS="${2:-3000}"
WAIT_PID="${3:-}"
DATA="$WORK/data"
EVAL="$WORK/eval_data"
OUT="$WORK/results"
CKPT="checkpoints/live"

if [[ -n "$WAIT_PID" ]]; then
    echo "waiting for pid $WAIT_PID (live_baseline_demo) to finish..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "predecessor done"
fi

echo "=== [1/4] cheng2020_checkerboard quality sweep ($STEPS steps each) ==="
python -m dsic_tpu.train.cli --data_root "$DATA" --run_name live \
    --family cheng2020_checkerboard --quality_sweep 1,2,3,4,5,6 \
    --max_steps "$STEPS" --epochs 500 --batch_size 16

echo "=== [2/4] live BD with all three families ==="
python -m dsic_tpu.eval.cli bd --ckpt_root "$CKPT" --images "$EVAL" \
    --out "$OUT/bd_live" --max_images 256 \
    --live bmshj2018,mbt2018_mean,cheng2020_checkerboard

echo "=== [3/4] bpp-matched comparison vs cheng ==="
python -m dsic_tpu.eval.cli compare --ckpt_root "$CKPT" \
    --image "$EVAL/patch_0001.png" --out "$OUT/compare_cheng" \
    --lambdas 10,100,1000 --vs cheng2020_checkerboard

echo "=== [4/4] real two-pass entropy coding on the trained q3 checkpoint ==="
python - "$CKPT" "$EVAL" "$OUT" <<'PY'
import sys, os, glob, dataclasses
import numpy as np, jax, jax.numpy as jnp
from dsic_tpu.config import Config
from dsic_tpu.train.state import build_model, create_train_state
from dsic_tpu.utils.checkpoint import restore_checkpoint
from dsic_tpu.utils.image_io import load_image_u8
from dsic_tpu.codec import make_codec, CheckerboardCodec
from dsic_tpu.models.zoo import zoo_quality, zoo_ckpt_name

ckpt_root, eval_dir, out_dir = sys.argv[1:4]
q = 3
preset = zoo_quality("cheng2020_checkerboard", q)
cfg = Config().replace(MODEL=dataclasses.replace(
    Config().MODEL, family="cheng2020_checkerboard",
    N=preset["N"], M=preset["M"]))
model = build_model(cfg, train_dtype=None)
_, _, template = create_train_state(cfg, jax.random.PRNGKey(0),
                                    sample_shape=(1, 64, 64, 3))
state, _ = restore_checkpoint(
    os.path.join(ckpt_root, zoo_ckpt_name("cheng2020_checkerboard", q)),
    template)
paths = sorted(glob.glob(os.path.join(eval_dir, "*.png")))[:8]
imgs = np.stack([load_image_u8(p)[: 64, : 64] for p in paths])
codec = make_codec(model, state.params)
assert isinstance(codec, CheckerboardCodec)
res = codec.compress(imgs)
y_q, z_q = codec.latents(imgs)
y_hat, z_hat = codec.decoded_latents(res.data)
assert np.array_equal(y_q, y_hat) and np.array_equal(z_q, z_hat)
x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
out = model.apply(state.params, x, quant_mode="round", train=False)
est = float((jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"]))
            / (imgs.shape[0] *  64 *  64))
line = (f"cheng q{q} two-pass codec: LOSSLESS, est {est:.4f} bpp, "
        f"real {res.bpp:.4f} bpp ({100*abs(res.bpp-est)/est:.2f}% gap)")
print(line)
with open(os.path.join(out_dir, "cheng_codec_check.txt"), "w") as fh:
    fh.write(line + "\n")
PY
echo "cheng follow-up complete: $OUT"
