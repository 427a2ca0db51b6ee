#!/usr/bin/env bash
# Sentinel-2 band-merge preprocessing launcher — the CPU-job equivalent of
# the reference's cpu.sbatch: walks BigEarthNet patch folders and writes RGB
# PNGs.
#
# Usage: scripts/preprocess_bands.sh BIGEARTHNET_ROOT OUT_DIR
set -euo pipefail
ROOT="${1:?usage: preprocess_bands.sh BIGEARTHNET_ROOT OUT_DIR}"
OUT="${2:?usage: preprocess_bands.sh BIGEARTHNET_ROOT OUT_DIR}"
exec python - "$ROOT" "$OUT" <<'PY'
import sys
from dsic_tpu.data.bands import process_all_patches
written = process_all_patches(sys.argv[1], sys.argv[2])
print(f"wrote {len(written)} RGB patches to {sys.argv[2]}")
PY
