"""The entropy codec: real compress/decompress round-trip.

Structure mirrors the reference pipeline (eval_selfcontained_entropy.py:26-123):

encode:  g_a/h_a -> round -> per-image supports [min - tail, max + tail] ->
         z coded under the factorized Gaussian (per-channel CDF rows),
         y coded under Student-t with (sigma, nu) from h_s(z_q)
decode:  z decodes first; h_s(z_hat) regenerates (sigma, nu); then y; then g_s
         — the decoder never sees y statistics (a true codec).

TPU/host split: transforms and CDF bin probabilities run jitted on device;
integer CDF quantization and rANS coding run on host (the C++ coder). Encoder
and decoder compute (sigma, nu) and CDF tables through the SAME jitted
functions on identically-shaped batches, making the tables bitwise identical
on both sides (decodability invariant).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import CodecConfig
from dsic_tpu.codec.bitstream import Bitstream, pack_bitstream, unpack_bitstream
from dsic_tpu.codec.cdf import gaussian_cdf_rows, student_t_cdf_rows
from dsic_tpu.codec.rans import rans_encode, rans_decode


@dataclass
class CompressResult:
    data: bytes
    bpp: float  # payload bits / pixel (reference counts payload bytes only)
    bpp_container: float  # including header
    per_image_bits: list


def _channel_row_idx(h: int, w: int, c: int) -> np.ndarray:
    """Row index for NHWC-flattened symbols with one CDF row per channel."""
    return np.tile(np.arange(c, dtype=np.int32), h * w)


class Codec:
    def __init__(self, model, params, cfg: CodecConfig | None = None):
        self.model = model
        self.params = params
        self.cfg = cfg or CodecConfig()

        self._encode_latents = jax.jit(
            lambda p, x: model.apply(p, x, method=model.encode_latents))
        self._hyper = jax.jit(
            lambda p, z, hw: model.apply(p, z, hw, method=model.hyper_decode),
            static_argnums=(2,))
        self._synthesize = jax.jit(
            lambda p, y: model.apply(p, y, method=model.synthesize))

        zl = params["params"]["z_log_sigma"]
        self._sigma_z = np.asarray(jnp.exp(zl), dtype=np.float32)

    # --- encode ------------------------------------------------------------

    def compress(self, x: np.ndarray) -> CompressResult:
        """x: (B, H, W, 3) float in [0,1], H and W multiples of 16."""
        b, h, w, _ = x.shape
        if h % 16 or w % 16:
            raise ValueError("pad input to a multiple of 16 first "
                             "(ops.pad_to_multiple)")
        y_q, z_q = self._encode_latents(self.params, jnp.asarray(x))
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]
        sigma, nu = self._hyper(self.params, z_q, (yh, yw))

        y_np = np.asarray(y_q, dtype=np.int64)
        z_np = np.asarray(z_q, dtype=np.int64)
        sigma_np = np.asarray(sigma)
        nu_np = np.asarray(nu)

        tail = self.cfg.tail
        n_states = self.cfg.interleave
        bucket = self.cfg.support_bucket
        z_row_idx = _channel_row_idx(zh, zw, zc)
        y_row_idx_chan = _channel_row_idx(yh, yw, yc)
        spatial = self.model.spatial_params

        def encode_one(i: int):
            zv, yv = z_np[i], y_np[i]
            zmin, zmax = int(zv.min()) - tail, int(zv.max()) + tail
            ymin, ymax = int(yv.min()) - tail, int(yv.max()) + tail
            z_cdf = gaussian_cdf_rows(self._sigma_z, zmin, zmax, bucket)
            z_bytes = rans_encode((zv - zmin).astype(np.int32).ravel(), z_cdf,
                                  z_row_idx, n_states)
            if spatial:
                y_cdf = student_t_cdf_rows(sigma_np[i].ravel(),
                                           nu_np[i].ravel(), ymin, ymax,
                                           bucket)
                y_row_idx = np.arange(yv.size, dtype=np.int32)
            else:
                y_cdf = student_t_cdf_rows(sigma_np[i, 0, 0], nu_np[i, 0, 0],
                                           ymin, ymax, bucket)
                y_row_idx = y_row_idx_chan
            y_bytes = rans_encode((yv - ymin).astype(np.int32).ravel(), y_cdf,
                                  y_row_idx, n_states)
            return (zmin, zmax, ymin, ymax), z_bytes, y_bytes

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            results = list(pool.map(encode_one, range(b)))

        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=[r[0] for r in results],
                       z_payloads=[r[1] for r in results],
                       y_payloads=[r[2] for r in results],
                       spatial_params=spatial, n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [8 * (len(r[1]) + len(r[2])) for r in results]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    # --- decode ------------------------------------------------------------

    def decompress(self, data: bytes) -> np.ndarray:
        """bytes -> (B, H, W, 3) reconstruction in [0,1]."""
        bs = unpack_bitstream(data)
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        bucket = self.cfg.support_bucket
        z_row_idx = _channel_row_idx(zh, zw, zc)
        y_row_idx_chan = _channel_row_idx(yh, yw, yc)

        def decode_z(i: int) -> np.ndarray:
            zmin, zmax, _, _ = bs.bounds[i]
            z_cdf = gaussian_cdf_rows(self._sigma_z, zmin, zmax, bucket)
            sym = rans_decode(bs.z_payloads[i], zh * zw * zc, z_cdf,
                              z_row_idx, bs.n_states)
            return (sym.astype(np.float32) + zmin).reshape(zh, zw, zc)

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            z_hat = np.stack(list(pool.map(decode_z, range(b))), axis=0)

        # One batched hyper-decode over all images — the exact call the
        # encoder made, so (sigma, nu) and thus the y CDF tables match
        # bitwise.
        sigma, nu = self._hyper(self.params, jnp.asarray(z_hat), (yh, yw))
        sigma_np, nu_np = np.asarray(sigma), np.asarray(nu)

        def decode_y(i: int) -> np.ndarray:
            _, _, ymin, ymax = bs.bounds[i]
            if bs.spatial_params:
                y_cdf = student_t_cdf_rows(sigma_np[i].ravel(),
                                           nu_np[i].ravel(), ymin, ymax,
                                           bucket)
                y_row_idx = np.arange(yh * yw * yc, dtype=np.int32)
            else:
                y_cdf = student_t_cdf_rows(sigma_np[i, 0, 0], nu_np[i, 0, 0],
                                           ymin, ymax, bucket)
                y_row_idx = y_row_idx_chan
            sym = rans_decode(bs.y_payloads[i], yh * yw * yc, y_cdf,
                              y_row_idx, bs.n_states)
            return (sym.astype(np.float32) + ymin).reshape(yh, yw, yc)

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            y_hat = np.stack(list(pool.map(decode_y, range(b))), axis=0)

        x_hat = self._synthesize(self.params, jnp.asarray(y_hat))
        return np.asarray(jnp.clip(x_hat, 0.0, 1.0))

    # --- introspection (round-trip tests) ----------------------------------

    def latents(self, x: np.ndarray):
        y_q, z_q = self._encode_latents(self.params, jnp.asarray(x))
        return np.asarray(y_q), np.asarray(z_q)

    def decoded_latents(self, data: bytes):
        """Decode only the symbol planes (for bit-exactness tests)."""
        bs = unpack_bitstream(data)
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        bucket = self.cfg.support_bucket
        z_hat = []
        for i in range(b):
            zmin, zmax, _, _ = bs.bounds[i]
            z_cdf = gaussian_cdf_rows(self._sigma_z, zmin, zmax, bucket)
            sym = rans_decode(bs.z_payloads[i], zh * zw * zc, z_cdf,
                              _channel_row_idx(zh, zw, zc), bs.n_states)
            z_hat.append((sym.astype(np.float32) + zmin).reshape(zh, zw, zc))
        z_hat = np.stack(z_hat)
        sigma, nu = self._hyper(self.params, jnp.asarray(z_hat), (yh, yw))
        sigma_np, nu_np = np.asarray(sigma), np.asarray(nu)
        y_hat = []
        for i in range(b):
            _, _, ymin, ymax = bs.bounds[i]
            if bs.spatial_params:
                y_cdf = student_t_cdf_rows(sigma_np[i].ravel(),
                                           nu_np[i].ravel(), ymin, ymax, bucket)
                y_row_idx = np.arange(yh * yw * yc, dtype=np.int32)
            else:
                y_cdf = student_t_cdf_rows(sigma_np[i, 0, 0], nu_np[i, 0, 0],
                                           ymin, ymax, bucket)
                y_row_idx = _channel_row_idx(yh, yw, yc)
            sym = rans_decode(bs.y_payloads[i], yh * yw * yc, y_cdf,
                              y_row_idx, bs.n_states)
            y_hat.append((sym.astype(np.float32) + ymin).reshape(yh, yw, yc))
        return np.stack(y_hat), z_hat


def compress_images(model, params, x: np.ndarray,
                    cfg: CodecConfig | None = None) -> CompressResult:
    return Codec(model, params, cfg).compress(x)


def decompress_images(model, params, data: bytes,
                      cfg: CodecConfig | None = None) -> np.ndarray:
    return Codec(model, params, cfg).decompress(data)
