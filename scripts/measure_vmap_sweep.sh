#!/usr/bin/env bash
# Measure the lambda-vmapped sweep (train/sweep.py) against sequential
# per-lambda training at the demo training shape: ms/step for all 8 lambdas
# in one vmapped step vs 8x one-model steps. Writes one summary line.
#
# Usage: scripts/measure_vmap_sweep.sh [OUT_FILE] [WAIT_PID]
set -euo pipefail
OUT="${1:-/root/work/live_demo/results/vmap_sweep_timing.txt}"
WAIT_PID="${2:-}"
if [[ -n "$WAIT_PID" ]]; then
    echo "waiting for pid $WAIT_PID..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

python - "$OUT" <<'PY'
import sys, time
import numpy as np, jax, jax.numpy as jnp
from dsic_tpu.config import Config, LAMBDA_GRID
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.train.state import create_train_state, make_optimizer
from dsic_tpu.train.steps import make_train_step
from dsic_tpu.train.sweep import init_sweep_state, make_sweep_train_step

cfg = Config()  # flagship N=128 M=192, bf16 AMP
x = jnp.asarray((synthetic_patches(16, (128, 128), seed=0) * 255 + 0.5
                 ).astype(np.uint8))
key = jax.random.PRNGKey(0)

def timeit(fn, *args, iters=20, warmup=3):
    state = args[0]
    for _ in range(warmup):
        state, m = fn(state, *args[1:])
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fn(state, *args[1:])
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters

# vmapped: all 8 lambdas per step
model, tx, stacked = init_sweep_state(cfg, LAMBDA_GRID,
                                      jax.random.PRNGKey(0),
                                      (1, 128, 128, 3))
sweep = make_sweep_train_step(model, tx, LAMBDA_GRID, dist=cfg.LOSS.dist,
                              donate=False)
t_vmap = timeit(sweep, stacked, x, key)

# sequential: one lambda per step
model1, tx1, st1 = create_train_state(cfg, jax.random.PRNGKey(0),
                                      (1, 128, 128, 3))
one = make_train_step(model1, tx1, 100.0, dist=cfg.LOSS.dist, donate=False)
t_one = timeit(one, st1, x, key)

n = len(LAMBDA_GRID)
line = (f"lambda-vmapped sweep (batch 16x128^2, N=128/M=192, bf16): "
        f"{t_vmap*1e3:.1f} ms/step for all {n} lambdas vs "
        f"{t_one*1e3:.1f} ms/step x {n} sequential = {t_one*n*1e3:.1f} ms "
        f"-> {t_one*n/t_vmap:.2f}x wall-clock speedup on one chip")
print(line)
with open(sys.argv[1], "w") as fh:
    fh.write(line + "\n")
PY
echo done
