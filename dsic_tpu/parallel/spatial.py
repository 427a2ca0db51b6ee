"""Spatially-partitioned (H-sharded) training built on shard_map with
EXPLICIT halo exchanges.

Why not GSPMD sharding annotations: XLA's SPMD partitioner (reproduced with
both the GSPMD and Shardy pipelines, jax 0.9 CPU backend) emits numerically
WRONG conv gradients for an H-sharded conv autoencoder whose bottleneck has
more than 16 channels — parameter gradients come out exactly ``n_data`` times
too large on a (data, spatial) mesh while the forward (and loss value!) stay
correct. See tests/test_spatial_shardmap.py::test_gspmd_spatial_grad_known_bad
for the pure-flax repro. The flagship model (M=192) is affected, so round-1's
GSPMD spatial train path was silently broken.

With shard_map every collective is explicit and the backward is the exact
transpose of the program we wrote: `ppermute` halos transpose to reverse
`ppermute`, `all_gather` to `psum_scatter`, and the parameter gradient is one
final `psum` — correct by construction, and with no involuntary
rematerialization (the round-1 GSPMD path replicated the whole hyper-synthesis
gradient).

Collective layout per train step (one step, H=height-of-image sharded):

  g_a / g_s       H-shards; 1-2 boundary rows exchanged per conv over
                  'spatial' (ppermute; zero-filled at image edges == the conv
                  zero padding).
  hyper branch    z is H/64 — too small to shard. y is all_gather'ed over
                  'spatial' once (tiled, axis 1) and h_a/h_s run replicated
                  over 'spatial', sharded over 'data' only. Their redundant
                  loss terms are scaled by 1/n_spatial so the final grad psum
                  counts them once.
  gradients       one psum over ('data', 'spatial') at the end.

Shape constraints (asserted): H divisible by 16 * n_spatial (so every g_a/g_s
activation splits evenly) and H >= 16 * n_spatial (so each shard holds at
least the widest halo, 2 rows at H/8).

Reference parity: the loss assembled here matches
models/compression_model.py::rate_distortion_loss (ref model.py:75-107) and
the equivalence is pinned by tests against the data-parallel step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
import optax

from dsic_tpu.models.layers import HyperAnalysis
from dsic_tpu.ops.gdn import gdn as gdn_op
from dsic_tpu.ops.distributions import (
    student_t_neg_log2_prob, gaussian_neg_log2_prob)
from dsic_tpu.ops.msssim import ms_ssim
from dsic_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
from dsic_tpu.train.state import TrainState

_DIMS = ("NHWC", "HWIO", "NHWC")


def _halo(x: jax.Array, up: int, down: int) -> jax.Array:
    """Concat `up` rows from the previous spatial shard above and `down` rows
    from the next shard below (axis 1 of NHWC). Edge shards receive zeros
    (ppermute's fill), which is exactly the conv zero padding."""
    n = lax.axis_size(SPATIAL_AXIS)
    parts = []
    if up:
        parts.append(lax.ppermute(x[:, -up:], SPATIAL_AXIS,
                                  [(j, j + 1) for j in range(n - 1)]))
    parts.append(x)
    if down:
        parts.append(lax.ppermute(x[:, :down], SPATIAL_AXIS,
                                  [(j + 1, j) for j in range(n - 1)]))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _cast(dtype, *ts):
    return tuple(t.astype(dtype) for t in ts) if dtype is not None else ts


def halo_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
              stride: int, dtype=None) -> jax.Array:
    """H-sharded equivalent of models.layers.conv (nn.Conv, 'same'-style
    padding p=(k-1)//2): halo rows (p up, k-stride-p down), VALID in H after
    the halo, zero padding p in (unsharded) W."""
    k = kernel.shape[0]
    p = (k - 1) // 2
    x, kernel, bias = _cast(dtype, x, kernel, bias)
    x = _halo(x, p, k - stride - p)
    out = lax.conv_general_dilated(
        x, kernel, (stride, stride), padding=((0, 0), (p, p)),
        dimension_numbers=_DIMS)
    return out + bias


def halo_conv_t(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                dtype=None) -> jax.Array:
    """H-sharded equivalent of models.layers.conv_t — flax
    ConvTranspose(5x5, stride 2, padding ((2,3),(2,3))), i.e. a stride-1 conv
    over the 2x-dilated input padded (2,3). Per shard: 1 halo row each way,
    lhs_dilation 2; in H the top halo row lands on dilated coordinate 0 so the
    local padding is (0, 1); W keeps the global (2, 3)."""
    x, kernel, bias = _cast(dtype, x, kernel, bias)
    x = _halo(x, 1, 1)
    out = lax.conv_general_dilated(
        x, kernel, (1, 1), padding=((0, 1), (2, 3)), lhs_dilation=(2, 2),
        dimension_numbers=_DIMS)
    return out + bias


def _gdn(p, x, inverse=False):
    return gdn_op(x, p["beta"].astype(x.dtype), p["gamma"].astype(x.dtype),
                  inverse=inverse)


# Layer specs mirror models/layers.py AnalysisTransform/SynthesisTransform
# (ref layers.py conv stacks); tests/test_spatial_shardmap.py pins the
# equivalence module-vs-manual so the two can't drift silently.
_ANALYSIS = ((3, 1, True), (5, 2, True), (3, 1, True), (5, 2, True),
             (3, 1, True), (5, 2, True), (3, 1, True), (5, 2, False))


def spatial_analysis(p, x: jax.Array, dtype=None) -> jax.Array:
    """AnalysisTransform forward on an H-shard. `p` = params['g_a']."""
    for i, (_k, s, use_gdn) in enumerate(_ANALYSIS):
        c = p[f"conv_{i}"]
        x = halo_conv(x, c["kernel"], c["bias"], s, dtype)
        if use_gdn:
            x = _gdn(p[f"gdn_{i}"], x)
    return x


def spatial_synthesis(p, y: jax.Array, dtype=None) -> jax.Array:
    """SynthesisTransform forward on an H-shard. `p` = params['g_s']."""
    x = y
    for i in range(3):
        d = p[f"deconv_{i}"]
        x = halo_conv_t(x, d["kernel"], d["bias"], dtype)
        x = _gdn(p[f"igdn_{2 * i}"], x, inverse=True)
        c = p[f"conv_{i}"]
        x = halo_conv(x, c["kernel"], c["bias"], 1, dtype)
        x = _gdn(p[f"igdn_{2 * i + 1}"], x, inverse=True)
    d = p["deconv_3"]
    return halo_conv_t(x, d["kernel"], d["bias"], dtype)


def make_spatial_train_step(model, tx, lambda_rd: float, mesh,
                            dist: str = "msssim", donate: bool = True):
    """(data x spatial) mesh-parallel train step via shard_map + explicit
    halos. Numerically matches the data-parallel step (same noise keys via
    model.noise_rngs); params/opt state replicated, batch sharded over
    ('data', H over 'spatial')."""
    n_sp = mesh.shape[SPATIAL_AXIS]
    act_dtype = model.dtype

    def step(state: TrainState, x: jax.Array, key: jax.Array):
        if x.dtype == jnp.uint8:  # wire format: normalize on device
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        B, H, W, _ = x.shape
        assert H % (16 * n_sp) == 0 and H >= 16 * n_sp, (
            f"H={H} must be a multiple of 16*n_spatial={16 * n_sp} and give "
            "each shard >= the widest (2-row) halo")
        hy, wy = H // 16, W // 16
        noise_dtype = act_dtype or jnp.float32
        # Bitwise-identical noise to the data-parallel step: same flax-derived
        # keys, same global shapes (partitionable threefry is
        # sharding-invariant).
        key_y, key_z = model.apply(state.params, method="noise_rngs",
                                   rngs={"noise": key})
        noise_y = jax.random.uniform(key_y, (B, hy, wy, model.M),
                                     noise_dtype, -0.5, 0.5)
        noise_z = jax.random.uniform(key_z, (B, H // 64, W // 64, model.N),
                                     noise_dtype, -0.5, 0.5)

        def device_fn(params, xl, nyl, nzl):
            def local_loss(p):
                pp = p["params"]
                yl = spatial_analysis(pp["g_a"], xl, act_dtype)
                y_full = lax.all_gather(yl, SPATIAL_AXIS, axis=1, tiled=True)
                z = HyperAnalysis(model.N, dtype=act_dtype).apply(
                    {"params": pp["h_a"]}, y_full)
                y_tilde_l = yl + nyl
                z_tilde = z + nzl
                # sigma/nu via the model's own hyper_decode (shared code path
                # with the DP step — identical clamps/pooling), replicated
                # over 'spatial'; slice this shard's rows.
                sigma_f, nu_f = model.apply(p, z_tilde, (hy, wy),
                                            method="hyper_decode")
                j = lax.axis_index(SPATIAL_AXIS)
                ly = hy // n_sp
                sigma_l = lax.dynamic_slice_in_dim(sigma_f, j * ly, ly, 1)
                nu_l = lax.dynamic_slice_in_dim(nu_f, j * ly, ly, 1)

                nll_y_l = student_t_neg_log2_prob(
                    y_tilde_l.astype(jnp.float32), sigma_l, nu_l)
                nll_z = gaussian_neg_log2_prob(
                    z_tilde.astype(jnp.float32), pp["z_log_sigma"])
                x_hat_l = spatial_synthesis(pp["g_s"], y_tilde_l, act_dtype)

                # Loss assembly == rate_distortion_loss (ref model.py:75-107).
                # Terms computed redundantly across 'spatial' (nll_z, msssim)
                # are scaled by 1/n_sp so the final grad psum counts them
                # exactly once.
                num_pixels = B * H * W
                r = (lax.psum(jnp.sum(nll_y_l), (DATA_AXIS, SPATIAL_AXIS))
                     + lax.psum(jnp.sum(nll_z) / n_sp,
                                (DATA_AXIS, SPATIAL_AXIS))) / num_pixels
                r = jnp.maximum(r, 0.0)

                x_hat_f32 = x_hat_l.astype(jnp.float32)
                xl_f32 = xl.astype(jnp.float32)
                if dist == "mse":
                    d = lax.psum(jnp.sum(jnp.square(x_hat_f32 - xl_f32)),
                                 (DATA_AXIS, SPATIAL_AXIS)) / (num_pixels * 3)
                elif dist == "msssim":
                    xh_full = lax.all_gather(x_hat_f32, SPATIAL_AXIS,
                                             axis=1, tiled=True)
                    x_full = lax.all_gather(xl_f32, SPATIAL_AXIS,
                                            axis=1, tiled=True)
                    ms = jnp.sum(ms_ssim(jnp.clip(xh_full, 0.0, 1.0), x_full,
                                         data_range=1.0))
                    d = 1.0 - lax.psum(ms / n_sp,
                                       (DATA_AXIS, SPATIAL_AXIS)) / B
                else:
                    raise ValueError("dist must be 'mse' or 'msssim'")

                loss = lambda_rd * d + r
                return loss, (r, d)

            (loss, (r, d)), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params)
            # No explicit grad psum: params are unvarying (replicated) under
            # shard_map's replication tracking, so differentiating the
            # psum-assembled global loss already yields the fully-reduced
            # gradient on every device (the transpose machinery inserts the
            # cross-device sum).
            return loss, r, d, grads

        loss, r, d, grads = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SPATIAL_AXIS),
                      P(DATA_AXIS, SPATIAL_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P(), P()),
        )(state.params, x, noise_y, noise_z)

        gnorm = optax.global_norm(grads)
        new_state = state.apply_gradients(tx, grads)
        return new_state, {"loss": loss, "R": r, "D": d, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
