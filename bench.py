#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line.

Metric: 256px satellite patches/sec/chip through the FULL codec — real
encode (g_a/h_a on TPU, TPU-computed CDF tables, C++ rANS) + real decode
(rANS, h_s, g_s) — the BASELINE.json north-star configuration.

vs_baseline: measured throughput vs the reference-equivalent target of
10x the same pipeline on host CPU (BASELINE.json: ">= 10x CPU encode+decode
per v5e chip"); vs_baseline = tpu_pps / (10 * cpu_pps), so 1.0 == target hit.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


BATCH = 32
HW = (256, 256)


def _build(model_cls, params_rng):
    import jax
    import jax.numpy as jnp
    model = model_cls(N=128, M=192)
    from dsic_tpu.data.synthetic import synthetic_patches
    x = synthetic_patches(BATCH, HW, seed=0)
    params = model.init({"params": jax.random.PRNGKey(params_rng),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.asarray(x[:1]))
    # uint8 on the wire — the production input format (device-normalized)
    x_u8 = (x * 255.0 + 0.5).astype(np.uint8)
    return model, params, x_u8


def _measure(codec, x, iters: int, warmup: int) -> float:
    for _ in range(warmup):
        res = codec.compress(x)
        codec.decompress(res.data)
    t0 = time.perf_counter()
    for _ in range(iters):
        res = codec.compress(x)
        codec.decompress(res.data)
    dt = (time.perf_counter() - t0) / iters
    return x.shape[0] / dt


def main():
    import jax
    from dsic_tpu.models import CompressionModel
    from dsic_tpu.codec import Codec

    model, params, x = _build(CompressionModel, 0)
    codec = Codec(model, params)
    tpu_pps = _measure(codec, x, iters=5, warmup=2)

    # CPU reference: same pipeline, params/arrays placed on host CPU.
    cpu_pps = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params_cpu = jax.device_put(params, cpu)
            codec_cpu = Codec(model, params_cpu)
            x_small = x[:4]
            for _ in range(1):
                r = codec_cpu.compress(x_small)
                codec_cpu.decompress(r.data)
            t0 = time.perf_counter()
            r = codec_cpu.compress(x_small)
            codec_cpu.decompress(r.data)
            cpu_pps = x_small.shape[0] / (time.perf_counter() - t0)
    except Exception as exc:  # noqa: BLE001
        print(f"[bench] WARN: cpu baseline failed: {exc}", file=sys.stderr)

    vs_baseline = (tpu_pps / (10.0 * cpu_pps)) if cpu_pps else 0.0
    print(json.dumps({
        "metric": "256px patches/sec/chip, full encode+decode (real rANS bitstream)",
        "value": round(tpu_pps, 2),
        "unit": "patches/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
