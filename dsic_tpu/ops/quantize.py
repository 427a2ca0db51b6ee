"""Quantizers: additive-uniform-noise relaxation (train) and hard rounding
with a straight-through estimator (eval / decoder input).

Reference semantics: /root/reference/code/modelv2/model.py:27-35 —
"noise" adds U(-0.5, 0.5), "round" rounds. jnp.round matches torch.round
(round-half-to-even).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_noise(x: jax.Array, key: jax.Array) -> jax.Array:
    """Additive uniform noise U(-0.5, 0.5) — differentiable train-time proxy."""
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return x + noise


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    """round(x) with identity gradient (straight-through estimator)."""
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def quantize(x: jax.Array, mode: str, key: jax.Array | None = None) -> jax.Array:
    if mode == "noise":
        if key is None:
            raise ValueError("noise quantization needs a PRNG key")
        return quantize_noise(x, key)
    if mode == "round":
        return ste_round(x)
    raise ValueError(f"Unknown quant mode: {mode}")


def quantize_noise_pallas(x: jax.Array, seed: int | jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Additive U(-0.5, 0.5) noise generated in-kernel with the TPU hardware
    PRNG (pltpu.prng_random_bits) — one fused pass, no separate random tensor
    materialized in HBM. Distribution-equivalent (not bitwise) to
    :func:`quantize_noise`; gradient is identity like the jax.random path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        # prng_random_bits yields int32 bit patterns: logical-shift as uint32
        # (arithmetic >> would sign-extend and skew the range), then bitcast
        # back to int32 — the 24-bit value is positive and Mosaic supports
        # int32 -> f32 (uint32 -> f32 is not implemented).
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        hi24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = hi24.astype(jnp.float32) * (1.0 / (1 << 24))
        o_ref[:] = x_ref[:] + (u - 0.5).astype(x_ref.dtype)

    @jax.custom_vjp
    def _noise(x2d, seed_arr):
        rows, c = x2d.shape
        block = min(rows, 512)
        grid = (rows // block,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            interpret=interpret,
        )(seed_arr, x2d)

    _noise.defvjp(lambda x2d, s: (_noise(x2d, s), None),
                  lambda _, g: (g, None))

    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    rows = x2d.shape[0]
    block = min(rows, 512)
    pad = (-rows) % block
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    out = _noise(x2d, seed_arr)
    return out[:rows].reshape(x.shape)
