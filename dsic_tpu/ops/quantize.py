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
