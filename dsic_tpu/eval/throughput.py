"""Throughput measurement: 256px patches/sec/chip for forward-only and for
the full encode+decode round trip (the BASELINE.json north-star metric — the
reference publishes no throughput numbers; SURVEY.md section 6)."""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.codec.api import make_codec
from dsic_tpu.data.synthetic import synthetic_patches


def measure_forward(model, params, batch: int = 8, hw=(256, 256),
                    iters: int = 20, warmup: int = 3) -> dict:
    """Jitted round-mode forward throughput (analysis+synthesis+likelihoods)."""
    x = jnp.asarray(synthetic_patches(batch, hw, seed=0))

    @jax.jit
    def fwd(p, x):
        out = model.apply(p, x, quant_mode="round", train=False)
        return out["x_hat"], out["nll_y"]

    for _ in range(warmup):
        jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(params, x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_batch": dt, "patches_per_sec": batch / dt,
            "batch": batch, "hw": hw}


def measure_codec(model, params, batch: int = 8, hw=(256, 256),
                  iters: int = 5, warmup: int = 1, cfg=None) -> dict:
    """Full real-bitstream encode+decode throughput."""
    codec = make_codec(model, params, cfg)
    x = (synthetic_patches(batch, hw, seed=0) * 255 + 0.5).astype(np.uint8)
    for _ in range(warmup):
        res = codec.compress(x)
        codec.decompress(res.data)
    t_enc = t_dec = 0.0
    bpp = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        res = codec.compress(x)
        t_enc += time.perf_counter() - t0
        t0 = time.perf_counter()
        codec.decompress(res.data)
        t_dec += time.perf_counter() - t0
        bpp = res.bpp
    enc_dt, dec_dt = t_enc / iters, t_dec / iters
    total = enc_dt + dec_dt
    return {"encode_sec": enc_dt, "decode_sec": dec_dt,
            "patches_per_sec": batch / total,
            "encode_patches_per_sec": batch / enc_dt,
            "decode_patches_per_sec": batch / dec_dt,
            "bpp": bpp, "batch": batch, "hw": hw}
