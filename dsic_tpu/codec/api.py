"""The entropy codec: real compress/decompress round-trip.

Structure mirrors the reference pipeline (eval_selfcontained_entropy.py:26-123):

encode:  g_a/h_a -> round -> per-image supports [min - tail, max + tail] ->
         z coded under the factorized Gaussian (per-channel CDF rows),
         y coded under Student-t with (sigma, nu) from h_s(z_q)
decode:  z decodes first; h_s(z_hat) regenerates (sigma, nu); then y; then g_s
         — the decoder never sees y statistics (a true codec).

TPU/host split and latency design:

* transforms and CDF bin probabilities run jitted on device; integer CDF
  quantization and rANS coding run on host (the C++ coder),
* all per-image CDF tables of a plane build in ONE jitted call with ONE
  device->host transfer (a shared bucketed support length per plane; the
  reference's per-image loop pays a host<->device latency per table,
  eval_selfcontained_entropy.py:36-66),
* encoder and decoder compute (sigma, nu) and CDF tables through the SAME
  jitted functions on identically-shaped batches, making the tables bitwise
  identical on both sides (the decodability invariant),
* per-image rANS coding fans out on a thread pool (the C++ calls release the
  GIL).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import CodecConfig
from dsic_tpu.codec.bitstream import Bitstream, pack_bitstream, unpack_bitstream
from dsic_tpu.codec.cdf import (
    gaussian_cdf_rows_batch, student_t_cdf_rows_batch, pad_support,
    student_t_bin_probs, quantize_pmf_to_cdf)
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
    def __init__(self, model, params, cfg: CodecConfig | None = None,
                 compute_dtype=None):
        """compute_dtype=jnp.bfloat16 runs the conv transforms in bf16 on the
        MXU (~2x analysis throughput; the hyper path stays consistent between
        encoder and decoder by construction, so round-trips remain lossless —
        only the RD point shifts marginally). Default: the model's own dtype
        (float32 unless trained with AMP)."""
        if compute_dtype is not None and compute_dtype != model.dtype:
            model = model.clone(dtype=compute_dtype)
        self.model = model
        self.params = params
        self.cfg = cfg or CodecConfig()

        self._encode_latents = jax.jit(
            lambda p, x: model.apply(p, x, method=model.encode_latents_i16))
        # global mode ships per-channel (B, M) params; spatial mode needs the
        # full maps. Encoder and decoder call the SAME jitted function.
        self._hyper_channel = jax.jit(
            lambda p, z: model.apply(p, z.astype(jnp.float32),
                                     method=model.hyper_channel_params))
        self._hyper_full = jax.jit(
            lambda p, z, hw: model.apply(p, z.astype(jnp.float32), hw,
                                         method=model.hyper_decode),
            static_argnums=(2,))
        self._synthesize = jax.jit(
            lambda p, y: model.apply(p, y.astype(jnp.float32),
                                     method=model.synthesize))
        self._synthesize_u8 = jax.jit(
            lambda p, y: model.apply(p, y, method=model.synthesize_u8))
        # Fused global-mode path: hyper-decode + Student-t bin probabilities
        # in ONE device call (one host sync instead of two). Encoder and
        # decoder both use it, preserving the bitwise-table invariant.
        self._y_pmf_from_z = jax.jit(
            lambda p, z, lo, L_pad: student_t_bin_probs(
                *model.apply(p, z.astype(jnp.float32),
                             method=model.hyper_channel_params),
                lo, L_pad),
            static_argnums=(3,))

        zl = params["params"]["z_log_sigma"]
        self._sigma_z = np.asarray(jnp.exp(zl), dtype=np.float32)

    # --- shared table construction (encoder and decoder call these with the
    # --- same arguments, yielding bitwise-identical tables) -----------------

    def _z_tables(self, z_lo: np.ndarray, L: int) -> np.ndarray:
        """(B,) per-image lo -> (B, N, L+1) Gaussian rows from the z-prior."""
        b = z_lo.shape[0]
        sigma = np.broadcast_to(self._sigma_z[None], (b, self._sigma_z.size))
        return gaussian_cdf_rows_batch(sigma, z_lo, L,
                                       self.cfg.support_bucket)

    def _y_tables(self, sigma_np: np.ndarray, nu_np: np.ndarray,
                  y_lo: np.ndarray, L: int) -> np.ndarray:
        """(B, R) hyper params -> (B, R, L+1) Student-t rows; R = channels in
        global mode, all ELEMENTS in spatial mode (can be ~50k rows per image
        — built in image chunks bounded to ~256MB of pmf)."""
        b = sigma_np.shape[0]
        sig = sigma_np.reshape(b, -1)
        nu = nu_np.reshape(b, -1)
        rows = sig.shape[1]
        l_pad = pad_support(L, self.cfg.support_bucket)
        chunk = max(1, int(256e6 / max(1, rows * l_pad * 4)))
        if chunk >= b:
            return student_t_cdf_rows_batch(sig, nu, y_lo, L,
                                            self.cfg.support_bucket)
        parts = [student_t_cdf_rows_batch(sig[i:i + chunk], nu[i:i + chunk],
                                          y_lo[i:i + chunk], L,
                                          self.cfg.support_bucket)
                 for i in range(0, b, chunk)]
        return np.concatenate(parts, axis=0)

    def _hyper_params(self, z_dev, latent_hw):
        """(sigma, nu) host arrays for the CDF tables: (B, M) in global mode,
        (B, h*w*M)-reshapeable full maps in spatial mode. One shared jitted
        path for encoder and decoder."""
        if self.model.spatial_params:
            sigma, nu = self._hyper_full(self.params, z_dev, latent_hw)
        else:
            sigma, nu = self._hyper_channel(self.params, z_dev)
        return np.asarray(sigma), np.asarray(nu)

    MAX_SUPPORT = 8192  # sane trained models need ~10-100 symbols

    @staticmethod
    def _bounds(vals: np.ndarray, tail: int, bucket: int):
        """Per-image lo and a shared bucketed support length L covering every
        image's [min - tail, max + tail] range."""
        b = vals.shape[0]
        flat = vals.reshape(b, -1)
        lo = np.floor(flat.min(axis=1)).astype(np.int64) - tail
        hi = np.ceil(flat.max(axis=1)).astype(np.int64) + tail
        L = pad_support(int((hi - lo + 1).max()), bucket)
        if L > Codec.MAX_SUPPORT:
            raise ValueError(
                f"latent symbol range {L} exceeds MAX_SUPPORT="
                f"{Codec.MAX_SUPPORT}; the checkpoint looks diverged "
                "(CDF tables would need gigabytes)")
        return lo.astype(np.int32), L

    # --- encode ------------------------------------------------------------

    def compress(self, x: np.ndarray) -> CompressResult:
        """x: (B, H, W, 3), float in [0,1] or uint8 (preferred on the wire:
        4x less host->device transfer; normalized on device). H and W must be
        multiples of 16."""
        return self._host_encode(self._device_encode(x))

    def compress_stream(self, batches):
        """Pipelined streaming encode: device transforms for batch i+1 run
        while the host builds tables and rANS-codes batch i (JAX async
        dispatch provides the overlap). Yields one CompressResult per input
        batch, in order."""
        from collections import deque
        pending = deque()
        for x in batches:
            pending.append(self._device_encode(x))
            if len(pending) >= 2:
                yield self._host_encode(pending.popleft())
        while pending:
            yield self._host_encode(pending.popleft())

    def _device_encode(self, x: np.ndarray):
        """Dispatch the device-side encoder work (non-blocking)."""
        b, h, w, _ = x.shape
        if h % 16 or w % 16:
            raise ValueError("pad input to a multiple of 16 first "
                             "(ops.pad_to_multiple)")
        y_q, z_q = self._encode_latents(self.params, jnp.asarray(x))
        if self.model.spatial_params:
            sigma, nu = self._hyper_full(self.params, z_q,
                                         (y_q.shape[1], y_q.shape[2]))
        else:
            sigma = nu = None  # global mode fuses hyper into the pmf call
        return (h, w), y_q, z_q, sigma, nu

    def _y_tables_fused(self, z_dev, y_lo: np.ndarray, L: int) -> np.ndarray:
        """Global mode: hyper-decode + Student-t pmf in one device call, then
        integer quantization on host -> (B, M, L+1) uint32 rows."""
        L_pad = pad_support(L, self.cfg.support_bucket)
        pmf = np.asarray(self._y_pmf_from_z(
            self.params, z_dev, jnp.asarray(y_lo, jnp.int32), L_pad))
        b, r, _ = pmf.shape
        return quantize_pmf_to_cdf(
            pmf[:, :, :L].reshape(b * r, L)).reshape(b, r, L + 1)

    def _host_encode(self, handles) -> CompressResult:
        (h, w), y_q, z_q, sigma, nu = handles
        b = y_q.shape[0]
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]
        y_np = np.asarray(y_q).astype(np.int64)  # int16 on the wire
        z_np = np.asarray(z_q).astype(np.int64)

        tail = self.cfg.tail
        n_states = self.cfg.interleave
        bucket = self.cfg.support_bucket
        spatial = self.model.spatial_params

        z_lo, L_z = self._bounds(z_np, tail, bucket)
        y_lo, L_y = self._bounds(y_np, tail, bucket)
        z_cdfs = self._z_tables(z_lo, L_z)  # (B, N, L_z+1)
        if spatial:
            y_cdfs = self._y_tables(np.asarray(sigma), np.asarray(nu),
                                    y_lo, L_y)
        else:
            y_cdfs = self._y_tables_fused(z_q, y_lo, L_y)

        z_row_idx = _channel_row_idx(zh, zw, zc)
        y_row_idx = (np.arange(yh * yw * yc, dtype=np.int32) if spatial
                     else _channel_row_idx(yh, yw, yc))

        def encode_one(i: int):
            z_sym = (z_np[i].ravel() - z_lo[i]).astype(np.int32)
            y_sym = (y_np[i].ravel() - y_lo[i]).astype(np.int32)
            z_bytes = rans_encode(z_sym, z_cdfs[i], z_row_idx, n_states)
            y_bytes = rans_encode(y_sym, y_cdfs[i], y_row_idx, n_states)
            return z_bytes, y_bytes

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            payloads = list(pool.map(encode_one, range(b)))

        bounds = [(int(z_lo[i]), int(z_lo[i]) + L_z - 1,
                   int(y_lo[i]), int(y_lo[i]) + L_y - 1) for i in range(b)]
        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=bounds,
                       z_payloads=[p[0] for p in payloads],
                       y_payloads=[p[1] for p in payloads],
                       spatial_params=spatial, n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [8 * (len(p[0]) + len(p[1])) for p in payloads]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    # --- decode ------------------------------------------------------------

    def _decode_planes(self, bs: Bitstream):
        """Shared decode path -> (y_hat, z_hat) float arrays."""
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        z_lo = np.asarray([bd[0] for bd in bs.bounds], np.int32)
        L_z = bs.bounds[0][1] - bs.bounds[0][0] + 1
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        L_y = bs.bounds[0][3] - bs.bounds[0][2] + 1
        for zmin, zmax, ymin, ymax in bs.bounds:  # shared-L format invariant
            if zmax - zmin + 1 != L_z or ymax - ymin + 1 != L_y:
                raise ValueError("corrupt bitstream: inconsistent symbol "
                                 "ranges across images")
        if max(L_z, L_y) > Codec.MAX_SUPPORT or min(L_z, L_y) < 1:
            raise ValueError("corrupt bitstream: implausible symbol range")

        z_cdfs = self._z_tables(z_lo, L_z)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        def decode_z(i: int) -> np.ndarray:
            sym = rans_decode(bs.z_payloads[i], zh * zw * zc, z_cdfs[i],
                              z_row_idx, bs.n_states)
            return (sym + z_lo[i]).astype(np.int16).reshape(zh, zw, zc)

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            z_hat = np.stack(list(pool.map(decode_z, range(b))), axis=0)

        # Batched hyper-decode over all images — the exact calls the encoder
        # made (fused hyper+pmf in global mode), so (sigma, nu) and thus the
        # y CDF tables match bitwise.
        if bs.spatial_params:
            sigma_np, nu_np = self._hyper_params(jnp.asarray(z_hat), (yh, yw))
            y_cdfs = self._y_tables(sigma_np, nu_np, y_lo, L_y)
        else:
            y_cdfs = self._y_tables_fused(jnp.asarray(z_hat), y_lo, L_y)
        y_row_idx = (np.arange(yh * yw * yc, dtype=np.int32)
                     if bs.spatial_params else _channel_row_idx(yh, yw, yc))

        def decode_y(i: int) -> np.ndarray:
            sym = rans_decode(bs.y_payloads[i], yh * yw * yc, y_cdfs[i],
                              y_row_idx, bs.n_states)
            return (sym + y_lo[i]).astype(np.int16).reshape(yh, yw, yc)

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            y_hat = np.stack(list(pool.map(decode_y, range(b))), axis=0)
        return y_hat, z_hat

    def decompress_stream(self, datas, quantize_output: bool = True):
        """Pipelined streaming decode over an iterable of bitstreams: two
        in-flight decodes overlap each other's host (rANS, numpy) and device
        (hyper/synthesis) phases. Yields reconstructions in order; each result
        is identical to :meth:`decompress` of the same bytes."""
        from collections import deque
        with ThreadPoolExecutor(max_workers=2) as pool:
            pending = deque()
            for data in datas:
                pending.append(pool.submit(self.decompress, data,
                                           quantize_output))
                if len(pending) >= 2:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def decompress(self, data: bytes,
                   quantize_output: bool = True) -> np.ndarray:
        """bytes -> (B, H, W, 3) float32 reconstruction in [0,1].

        quantize_output=True (default, the production path) quantizes the
        reconstruction to 8 bits ON DEVICE before the host transfer (4x less
        wire traffic; what gets written to PNG anyway). False keeps the exact
        float synthesis output."""
        bs = unpack_bitstream(data)
        y_hat, _ = self._decode_planes(bs)
        if quantize_output:
            u8 = self._synthesize_u8(self.params, jnp.asarray(y_hat))
            return np.asarray(u8).astype(np.float32) / 255.0
        x_hat = self._synthesize(self.params, jnp.asarray(y_hat))
        return np.asarray(jnp.clip(x_hat, 0.0, 1.0))

    # --- introspection (round-trip tests) ----------------------------------

    def latents(self, x: np.ndarray):
        y_q, z_q = self._encode_latents(self.params, jnp.asarray(x))
        return np.asarray(y_q), np.asarray(z_q)

    def decoded_latents(self, data: bytes):
        """Decode only the symbol planes (for bit-exactness tests)."""
        return self._decode_planes(unpack_bitstream(data))


def compress_images(model, params, x: np.ndarray,
                    cfg: CodecConfig | None = None) -> CompressResult:
    return Codec(model, params, cfg).compress(x)


def decompress_images(model, params, data: bytes,
                      cfg: CodecConfig | None = None) -> np.ndarray:
    return Codec(model, params, cfg).decompress(data)
