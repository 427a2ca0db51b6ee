#!/usr/bin/env bash
# Lambda-sweep training launcher — the TPU-cluster equivalent of the
# reference's per-lambda SLURM array jobs (submit.sbatch). One process
# drives the full sweep with data-parallel training over all local devices;
# on a multi-host pod, run one copy per host (jax.distributed initializes
# from the TPU environment).
#
# Usage: scripts/train_sweep.sh DATA_ROOT [RUN_NAME] [EXTRA_ARGS...]
set -euo pipefail
DATA_ROOT="${1:?usage: train_sweep.sh DATA_ROOT [RUN_NAME] [extra args]}"
RUN_NAME="${2:-sweep_$(date +%Y%m%d_%H%M%S)}"
shift $(( $# > 2 ? 2 : $# ))

exec python -m dsic_tpu.train.cli \
  --data_root "$DATA_ROOT" \
  --run_name "$RUN_NAME" \
  --lambda_sweep \
  --mesh \
  "$@"
