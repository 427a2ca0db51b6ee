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
    gaussian_bin_probs, gaussian_cdf_rows_batch, gmm_bin_probs, pad_support,
    student_t_bin_probs, quantize_pmf_to_cdf)
from dsic_tpu.codec.rans import rans_encode_batch, rans_decode_batch


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
                 compute_dtype=None, mesh=None):
        """compute_dtype=jnp.bfloat16 runs the conv transforms in bf16 on the
        MXU (~2x analysis throughput; the hyper path stays consistent between
        encoder and decoder by construction, so round-trips remain lossless —
        only the RD point shifts marginally). Default: the model's own dtype
        (float32 unless trained with AMP).

        mesh: an optional ``jax.sharding.Mesh`` with a 'data' axis. Device
        inputs (images, decoded planes, per-image support bounds) are placed
        batch-sharded over it, so every device-side phase — transforms, CDF
        table builds, synthesis — runs SPMD across the mesh with ZERO
        collectives (all codec math is per-image). This is the multi-chip
        serving path: throughput scales with chip count while the host rANS
        fan-out stays on the thread pool. The decodability invariant is
        per-TOPOLOGY: encoder and decoder must use the same mesh shape (the
        same compiled table programs), just as they must use the same
        hardware generation — sharded and single-device compilations can
        differ at the ulp level on deep table paths, so bitstreams are
        topology-bound (tests/test_codec.py::test_mesh_sharded_codec_*).
        Batch size must divide the 'data' axis size."""
        if compute_dtype is not None and compute_dtype != model.dtype:
            model = model.clone(dtype=compute_dtype)
        self.model = model
        self.cfg = cfg or CodecConfig()
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        # Pin params on device ONCE (replicated over the mesh if sharded).
        # orbax restores to host numpy; passing host params to the jitted
        # entry points re-uploads the full tree on EVERY call — over the
        # ~70 MB/s tunnel that costs seconds per dispatch, and the transfer
        # staging buffers were observed to accumulate on the host (the
        # 130 GB RSS OOM of the round-5 58-leg BD eval).
        if mesh is not None:
            from dsic_tpu.parallel.mesh import replicated
            self.params = jax.device_put(params, replicated(mesh))
        else:
            self.params = jax.device_put(params)
        # one CDF row per y ELEMENT (vs per channel); stored in the bitstream
        # header so decode picks the matching row index layout
        self._per_element_y = bool(getattr(model, "spatial_params", False))
        self._build_wire_jits()
        self._build_model_jits()

    def _build_wire_jits(self):
        """Family-independent device<->host wire helpers: per-image latent
        min/max (bounds from bytes, not planes), u8 offset packing for the
        y plane in both directions (halves the dominant latent transfer
        whenever the bucketed support fits 256 symbols — every sane trained
        model), and the inverse unpack."""
        self._minmax = jax.jit(lambda t: (
            jnp.min(t, axis=(1, 2, 3)).astype(jnp.int32),
            jnp.max(t, axis=(1, 2, 3)).astype(jnp.int32)))
        self._offset_u8 = jax.jit(lambda t, lo: (
            t.astype(jnp.int32) - lo[:, None, None, None]).astype(jnp.uint8))
        self._deoffset_i16 = jax.jit(lambda t, lo: (
            t.astype(jnp.int32) + lo[:, None, None, None]).astype(jnp.int16))

    def _bounds_from_minmax(self, mm, tail: int, bucket: int):
        """Device (min, max) handles -> per-image (lo, bucketed L); same
        values _bounds computes from the full host plane."""
        lo = np.asarray(mm[0]).astype(np.int64) - tail
        hi = np.asarray(mm[1]).astype(np.int64) + tail
        l_per = np.asarray([pad_support(int(h - l + 1), bucket)
                            for l, h in zip(lo, hi)], np.int32)
        if l_per.max() > Codec.MAX_SUPPORT:
            raise ValueError(
                f"latent symbol range {int(l_per.max())} exceeds MAX_SUPPORT="
                f"{Codec.MAX_SUPPORT}; the checkpoint looks diverged "
                "(CDF tables would need gigabytes)")
        return lo.astype(np.int32), l_per

    def _fetch_y_symbols(self, y_q, y_lo: np.ndarray, ly_per: np.ndarray):
        """Download the y plane as per-image SYMBOLS (y - lo): the u8 wire
        plane stays u8 all the way into the native batch coder when every
        image's support fits 256 symbols, else int16 minus lo on host.
        Returns (B, yh*yw*yc) uint8 or int32."""
        b = y_q.shape[0]
        if int(ly_per.max()) <= 256:
            return np.asarray(self._offset_u8(y_q,
                                              self._put(y_lo))).reshape(b, -1)
        y_np = np.asarray(y_q).astype(np.int32).reshape(b, -1)
        return y_np - y_lo[:, None]

    def _put_y_plane(self, y_vals: np.ndarray, y_lo: np.ndarray,
                     ly_per: np.ndarray):
        """Upload decoded ABSOLUTE y values: u8 offset wire when the support
        fits (deoffset back to int16 on device), else int16 directly."""
        if int(ly_per.max()) <= 256:
            off = (y_vals.astype(np.int32)
                   - y_lo[:, None, None, None]).astype(np.uint8)
            return self._deoffset_i16(self._put(off), self._put(y_lo))
        return self._put(y_vals)

    def _put(self, x) -> jax.Array:
        """Host array -> device, batch-sharded over the mesh if configured."""
        if self._batch_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self._batch_sharding)

    def _build_model_jits(self):
        """Model-family-specific jitted entry points (overridden by ZooCodec
        for the Gaussian-conditional baseline families)."""
        model = self.model
        self._encode_latents = jax.jit(
            lambda p, x: model.apply(p, x, method=model.encode_latents_i16))
        self._synthesize = jax.jit(
            lambda p, y, z: model.apply(p, y.astype(jnp.float32),
                                        method=model.synthesize))
        self._synthesize_u8 = jax.jit(
            lambda p, y, z: model.apply(p, y, method=model.synthesize_u8))
        # Fused table paths: hyper-decode + Student-t bin probabilities in
        # ONE device call per direction (one host sync instead of two-three).
        # Encoder and decoder both use them, preserving the bitwise-table
        # invariant. Global mode: one CDF row per channel; spatial mode: one
        # row per ELEMENT (the hyper maps never leave the device — only the
        # pmf block does, which had to cross anyway).
        self._y_pmf_from_z = jax.jit(
            lambda p, z, lo, L_pad: student_t_bin_probs(
                *model.apply(p, z.astype(jnp.float32),
                             method=model.hyper_channel_params),
                lo, L_pad),
            static_argnums=(3,))

        def _spatial_pmf(p, z, lo, L_pad, hw):
            sigma, nu = model.apply(p, z.astype(jnp.float32), hw,
                                    method=model.hyper_decode)
            b = sigma.shape[0]
            return student_t_bin_probs(sigma.reshape(b, -1),
                                       nu.reshape(b, -1), lo, L_pad)
        self._y_pmf_from_z_spatial = jax.jit(_spatial_pmf,
                                             static_argnums=(3, 4))

        zl = self.params["params"]["z_log_sigma"]
        self._sigma_z = np.asarray(jnp.exp(zl), dtype=np.float32)

    # --- shared table construction (encoder and decoder call these with the
    # --- same arguments, yielding bitwise-identical tables) -----------------

    @staticmethod
    def _per_image_quantize(pmf_np: np.ndarray, l_per: np.ndarray) -> list:
        """(B, R, L_max) float pmf -> per-image (R, L_i+1) uint32 CDF rows,
        each normalized over only ITS bucketed support (a wide-range outlier
        image no longer flattens every other image's tables — the reference
        uses true per-image supports, eval_selfcontained_entropy.py:39-47).
        Images sharing an L quantize as one vectorized call."""
        b, r, _ = pmf_np.shape
        out: list = [None] * b
        for L in np.unique(l_per):
            idx = np.where(l_per == L)[0]
            q = quantize_pmf_to_cdf(
                pmf_np[idx, :, :L].reshape(len(idx) * r, L)
            ).reshape(len(idx), r, L + 1)
            for j, i in enumerate(idx):
                out[i] = q[j]
        return out

    def _z_tables(self, z_lo: np.ndarray, l_per: np.ndarray) -> list:
        """(B,) per-image lo + (B,) bucketed lengths -> per-image (N, L_i+1)
        Gaussian rows from the z-prior (host erf — the plane is tiny)."""
        b = z_lo.shape[0]
        n = self._sigma_z.size
        sigma = np.broadcast_to(self._sigma_z[None], (b, n))
        out: list = [None] * b
        for L in np.unique(l_per):
            idx = np.where(l_per == L)[0]
            rows = gaussian_cdf_rows_batch(sigma[idx], z_lo[idx], int(L),
                                           self.cfg.support_bucket)
            for j, i in enumerate(idx):
                out[i] = rows[j]
        return out

    MAX_SUPPORT = 8192  # sane trained models need ~10-100 symbols

    @staticmethod
    def _bounds(vals: np.ndarray, tail: int, bucket: int):
        """Per-image lo and per-image bucketed support lengths covering each
        image's [min - tail, max + tail] range (bucketing keeps the jitted
        pmf builders to a few static shapes)."""
        b = vals.shape[0]
        flat = vals.reshape(b, -1)
        lo = np.floor(flat.min(axis=1)).astype(np.int64) - tail
        hi = np.ceil(flat.max(axis=1)).astype(np.int64) + tail
        l_per = np.asarray([pad_support(int(h - l + 1), bucket)
                            for l, h in zip(lo, hi)], np.int32)
        if l_per.max() > Codec.MAX_SUPPORT:
            raise ValueError(
                f"latent symbol range {int(l_per.max())} exceeds MAX_SUPPORT="
                f"{Codec.MAX_SUPPORT}; the checkpoint looks diverged "
                "(CDF tables would need gigabytes)")
        return lo.astype(np.int32), l_per

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
        """Dispatch the device-side encoder work (non-blocking). The hyper
        maps never come to the host — both modes fuse hyper-decode into the
        pmf call at table-build time. Per-image latent min/max reduce on
        device too, so the host can derive CDF supports from a few bytes
        instead of downloading whole latent planes to scan them."""
        b, h, w, _ = x.shape
        m = getattr(self.model, "pad_multiple", 16)
        if h % m or w % m:
            raise ValueError(f"pad input to a multiple of {m} first "
                             "(ops.pad_to_multiple)")
        y_q, z_q = self._encode_latents(self.params, self._put(x))
        return (h, w), y_q, z_q, self._minmax(y_q), self._minmax(z_q)

    def _chunked_pmf_tables(self, pmf_fn, dev_args: tuple,
                            y_lo: np.ndarray, l_per: np.ndarray,
                            rows: int) -> list:
        """THE chunked device pmf -> per-image CDF-row builder, shared by
        every codec family's table paths: one place owns the ~256MB chunk
        budget and the keep-batch-sharded-layout rule. ``pmf_fn`` is called
        as pmf_fn(params, *dev_args_chunk, lo_dev, L_pad) and must return
        (chunk, R, L_pad) bin probabilities."""
        b = int(dev_args[0].shape[0])
        L_pad = int(l_per.max())  # already bucketed
        chunk = max(1, int(256e6 / max(1, rows * L_pad * 4)))
        if self._batch_sharding is not None:
            # keep the batch-sharded layout intact: chunks must stay a
            # multiple of the 'data' axis extent, but still respect the
            # device-memory budget (a forced full-batch chunk could exceed
            # HBM for large mesh-served batches with per-element rows)
            n_data = int(self._batch_sharding.mesh.shape["data"])
            chunk = max(n_data, (min(chunk, b) // n_data) * n_data)
            if chunk > b:
                chunk = b
            if rows * L_pad * 4 * n_data > 1e9:
                raise ValueError(
                    f"CDF table build needs {rows * L_pad * 4 * n_data / 1e6:.0f}"
                    f" MB even for one {n_data}-image mesh-aligned chunk "
                    f"(rows={rows}, L={L_pad}); reduce the batch, the mesh "
                    "'data' axis, or CODEC.support_bucket")
        pmfs = []
        for i in range(0, b, chunk):
            lo_dev = self._put(np.asarray(y_lo[i:i + chunk], np.int32))
            sliced = [a[i:i + chunk] for a in dev_args]
            # pmf crosses the wire as float16 (halves the table transfer,
            # the decode leg's largest download). Encoder and decoder share
            # this exact cast, so quantized CDF tables stay bitwise equal on
            # both sides; the [1e-12, 1] clamp upstream plus the coder's
            # freq>=1 floor absorb f16 subnormal flushes (bpp cost < 0.1%).
            pmf16 = pmf_fn(self.params, *sliced, lo_dev, L_pad) \
                .astype(jnp.float16)
            pmfs.append(np.asarray(pmf16).astype(np.float32))
        pmf = pmfs[0] if len(pmfs) == 1 else np.concatenate(pmfs, axis=0)
        return self._per_image_quantize(pmf, l_per)

    def _y_tables_fused(self, z_dev, y_lo: np.ndarray, l_per: np.ndarray,
                        latent_hw) -> list:
        """hyper-decode + Student-t pmf in one device call per chunk ->
        per-image (R, L_i+1) uint32 rows. R = channels in global mode, all
        elements in spatial mode."""
        if self._per_element_y:
            rows = latent_hw[0] * latent_hw[1] * self.model.M
            hw = tuple(latent_hw)
            fn = lambda p, z, lo, L: self._y_pmf_from_z_spatial(  # noqa: E731
                p, z, lo, L, hw)
        else:
            rows = self.model.M
            fn = self._y_pmf_from_z
        return self._chunked_pmf_tables(fn, (z_dev,), y_lo, l_per, rows)

    def _host_encode(self, handles) -> CompressResult:
        (h, w), y_q, z_q, y_mm, z_mm = handles
        b = y_q.shape[0]
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]

        tail = self.cfg.tail
        n_states = self.cfg.interleave
        bucket = self.cfg.support_bucket
        spatial = self._per_element_y

        z_lo, lz_per = self._bounds_from_minmax(z_mm, tail, bucket)
        y_lo, ly_per = self._bounds_from_minmax(y_mm, tail, bucket)
        z_np = np.asarray(z_q).astype(np.int64)  # tiny plane, int16 wire
        # y crosses as u8 symbols (y - lo) when the support fits: the y
        # plane is the dominant latent transfer
        y_syms = self._fetch_y_symbols(y_q, y_lo, ly_per)
        z_cdfs = self._z_tables(z_lo, lz_per)
        y_cdfs = self._y_tables_fused(z_q, y_lo, ly_per, (yh, yw))

        z_row_idx = _channel_row_idx(zh, zw, zc)
        y_row_idx = (np.arange(yh * yw * yc, dtype=np.int32) if spatial
                     else _channel_row_idx(yh, yw, yc))

        # One native call per plane over the whole batch (contiguous u8 y
        # symbols): no per-image Python/ctypes round trips.
        z_syms = (z_np.reshape(b, -1) - z_lo[:, None]).astype(np.int32)
        z_payloads = rans_encode_batch(z_syms, z_cdfs, z_row_idx, n_states)
        y_payloads = rans_encode_batch(y_syms, y_cdfs, y_row_idx, n_states)

        bounds = [(int(z_lo[i]), int(z_lo[i]) + int(lz_per[i]) - 1,
                   int(y_lo[i]), int(y_lo[i]) + int(ly_per[i]) - 1)
                  for i in range(b)]
        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=bounds,
                       z_payloads=z_payloads,
                       y_streams=[y_payloads],
                       spatial_params=spatial, n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [8 * (len(zp) + len(yp))
                          for zp, yp in zip(z_payloads, y_payloads)]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    # --- decode ------------------------------------------------------------

    def _decode_planes(self, bs: Bitstream):
        """Shared decode path -> (y_sym, z_sym, y_hat_dev|None)."""
        if bs.n_y_streams != 1:
            raise ValueError(
                f"bitstream carries {bs.n_y_streams} y streams; this model's "
                "codec decodes exactly one (wrong --family/checkpoint?)")
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        z_lo = np.asarray([bd[0] for bd in bs.bounds], np.int32)
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        lz_per = np.asarray([bd[1] - bd[0] + 1 for bd in bs.bounds], np.int32)
        ly_per = np.asarray([bd[3] - bd[2] + 1 for bd in bs.bounds], np.int32)
        if (max(lz_per.max(), ly_per.max()) > Codec.MAX_SUPPORT
                or min(lz_per.min(), ly_per.min()) < 1):
            raise ValueError("corrupt bitstream: implausible symbol range")

        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        sym = rans_decode_batch(bs.z_payloads, zh * zw * zc, z_cdfs,
                                z_row_idx, bs.n_states)
        z_hat = (sym + z_lo[:, None]).astype(np.int16).reshape(b, zh, zw, zc)

        # Batched fused hyper-decode + pmf over all images — the exact call
        # the encoder made on identically-shaped inputs, so (sigma, nu) and
        # thus the y CDF tables match bitwise.
        y_cdfs = self._y_tables_fused(self._put(z_hat), y_lo, ly_per,
                                      (yh, yw))
        y_row_idx = (np.arange(yh * yw * yc, dtype=np.int32)
                     if bs.spatial_params else _channel_row_idx(yh, yw, yc))

        sym = rans_decode_batch(bs.y_payloads, yh * yw * yc, y_cdfs,
                                y_row_idx, bs.n_states)
        y_hat = (sym + y_lo[:, None]).astype(np.int16).reshape(b, yh, yw, yc)
        return y_hat, z_hat, None

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
        y_sym, z_sym, y_hat_dev = self._decode_planes(bs)
        if y_hat_dev is not None:
            # multi-pass codecs already built the dequantized y on device
            # during table construction — synthesize from it directly
            # instead of re-running the conditional dequant recursion
            if quantize_output:
                u8 = self._synth_cached_u8(self.params, y_hat_dev)
                return np.asarray(u8).astype(np.float32) / 255.0
            return np.asarray(jnp.clip(
                self._synth_cached(self.params, y_hat_dev), 0.0, 1.0))
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        ly_per = np.asarray([bd[3] - bd[2] + 1 for bd in bs.bounds], np.int32)
        y_dev = self._put_y_plane(y_sym, y_lo, ly_per)
        if quantize_output:
            u8 = self._synthesize_u8(self.params, y_dev, self._put(z_sym))
            return np.asarray(u8).astype(np.float32) / 255.0
        x_hat = self._synthesize(self.params, y_dev, self._put(z_sym))
        return np.asarray(jnp.clip(x_hat, 0.0, 1.0))

    # --- introspection (round-trip tests) ----------------------------------

    def latents(self, x: np.ndarray):
        y_q, z_q = self._encode_latents(self.params, self._put(x))
        return np.asarray(y_q), np.asarray(z_q)

    def decoded_latents(self, data: bytes):
        """Decode only the symbol planes (for bit-exactness tests)."""
        y_sym, z_sym, _ = self._decode_planes(unpack_bitstream(data))
        return y_sym, z_sym


def compress_images(model, params, x: np.ndarray,
                    cfg: CodecConfig | None = None) -> CompressResult:
    return make_codec(model, params, cfg).compress(x)


def decompress_images(model, params, data: bytes,
                      cfg: CodecConfig | None = None) -> np.ndarray:
    return make_codec(model, params, cfg).decompress(data)


class ZooCodec(Codec):
    """Real entropy codec for the live baseline families (models/zoo.py
    ScaleHyperprior / MeanScaleHyperprior): z under the learned factorized
    density (tables from the SAME jitted CDF on both sides), y under the
    Gaussian conditional with per-element scales (and, for mbt2018-mean,
    mean-residual symbols round(y - mu) recentered at decode). The reference
    gets this capability from compressai's coder; here the zoo shares this
    framework's rANS/bitstream machinery, so baselines produce REAL bpp too."""

    SIGMA_MIN = 0.11  # matches the training likelihood's scale floor

    def _build_zoo_common_jits(self):
        """Jits shared by all zoo families: latents, decode_y-routed
        synthesis, and the factorized z-prior pmf."""
        model = self.model
        self._per_element_y = True  # Gaussian conditional: one row/element
        self._encode_latents = jax.jit(
            lambda p, x: model.apply(p, x, method=model.encode_latents_i16))

        def _synth(p, y, z, u8):
            y_hat = model.apply(p, y.astype(jnp.float32),
                                z.astype(jnp.float32), method=model.decode_y)
            x_hat = jnp.clip(model.apply(p, y_hat, method=model.synthesize),
                             0.0, 1.0)
            return (x_hat * 255.0 + 0.5).astype(jnp.uint8) if u8 else x_hat

        self._synthesize = jax.jit(lambda p, y, z: _synth(p, y, z, False))
        self._synthesize_u8 = jax.jit(lambda p, y, z: _synth(p, y, z, True))

        def _synth_cached(p, y_hat, u8):
            x_hat = jnp.clip(model.apply(p, y_hat, method=model.synthesize),
                             0.0, 1.0)
            return (x_hat * 255.0 + 0.5).astype(jnp.uint8) if u8 else x_hat

        self._synth_cached = jax.jit(lambda p, y: _synth_cached(p, y, False))
        self._synth_cached_u8 = jax.jit(lambda p, y: _synth_cached(p, y, True))

        def _z_pmf(p, lo, L_pad):
            n = model.N
            grid = (lo[:, None].astype(jnp.float32)
                    + jnp.arange(L_pad, dtype=jnp.float32)[None, :])
            g = jnp.broadcast_to(grid[:, :, None], (lo.shape[0], L_pad, n))
            cu = model.apply(p, g + 0.5, method=model.z_cdf)
            cl = model.apply(p, g - 0.5, method=model.z_cdf)
            # f16 wire, same on both sides (see _chunked_pmf_tables)
            return jnp.clip(cu - cl, 1e-12, 1.0).transpose(0, 2, 1) \
                .astype(jnp.float16)

        self._z_pmf = jax.jit(_z_pmf, static_argnums=(2,))

    def _build_model_jits(self):
        model = self.model
        self._build_zoo_common_jits()

        def _y_pmf(p, z, lo, L_pad, hw):
            sigma, _ = model.apply(p, z.astype(jnp.float32), hw,
                                   method=model.y_scales)
            b = sigma.shape[0]
            sigma = jnp.maximum(sigma.astype(jnp.float32), self.SIGMA_MIN)
            return gaussian_bin_probs(sigma.reshape(b, -1), lo, L_pad)

        self._y_pmf_from_z_spatial = jax.jit(_y_pmf, static_argnums=(3, 4))
        self._y_pmf_from_z = None  # zoo always codes per-element rows

    def _z_tables(self, z_lo: np.ndarray, l_per: np.ndarray) -> list:
        """Factorized-density rows, evaluated through the jitted z_cdf (the
        decoder runs the identical call -> bitwise-identical tables)."""
        out: list = [None] * z_lo.shape[0]
        for L in np.unique(l_per):
            idx = np.where(l_per == L)[0]
            pmf = np.asarray(self._z_pmf(
                self.params, jnp.asarray(z_lo[idx], jnp.int32),
                int(L))).astype(np.float32)
            rows = quantize_pmf_to_cdf(
                pmf.reshape(len(idx) * self.model.N, int(L))
            ).reshape(len(idx), self.model.N, int(L) + 1)
            for j, i in enumerate(idx):
                out[i] = rows[j]
        return out


class CheckerboardCodec(ZooCodec):
    """Two-pass entropy codec for the checkerboard context family
    (models/cheng.py Cheng2020Checkerboard): anchors decode first under
    hyperprior-only Gaussian tables, then ONE dense device call turns the
    decoded anchors into the non-anchor tables (fused anchor-dequant +
    context conv + pmf). The reference's cheng2020_attn pays h*w serial
    context evaluations per image at decode (compressai's autoregressive
    loop); this pays exactly two.

    Decodability invariant: the encoder feeds the pass-2 table build the
    anchor-only symbol tensor (non-anchors zeroed on host) — byte-identical
    to what the decoder reconstructs from the anchor stream — through the
    SAME jitted function, so both sides build bitwise-identical tables."""

    def _build_model_jits(self):
        model = self.model
        self._build_zoo_common_jits()
        self._y_pmf_from_z = None
        self._y_pmf_from_z_spatial = None  # replaced by the two pass builders
        gmm = bool(getattr(model, "mixtures", 0))

        def _rows_from_params(params, sel, lo, L_pad):
            """(sigma, mu) or (w_logits, mu, sigma) -> selected-row pmf.
            GMM params carry a (..., K, M) component layout; rows must
            follow NHWC element order, so move K in front of (h, w, M)."""
            if not gmm:
                sigma = params[0]
                rows = jnp.maximum(sigma.reshape(sigma.shape[0], -1)[:, sel],
                                   self.SIGMA_MIN)
                return gaussian_bin_probs(rows, lo, L_pad)
            w_l, mu, sigma = params

            def to_rows(t):  # (B,h,w,K,M) -> (B,K,R)[:, :, sel]
                b = t.shape[0]
                t = jnp.moveaxis(t, 3, 1).reshape(b, t.shape[3], -1)
                return t[:, :, sel]

            return gmm_bin_probs(to_rows(w_l), to_rows(mu),
                                 jnp.maximum(to_rows(sigma), self.SIGMA_MIN),
                                 lo, L_pad)

        def _pmf1(p, z, lo, L_pad, sel):
            """anchor-pass tables: params from the hyperprior only; row
            selection happens ON DEVICE (halves pmf compute + transfer)."""
            params = model.apply(p, z.astype(jnp.float32),
                                 method=model.anchor_params)
            return _rows_from_params(params, sel, lo, L_pad)

        def _pmf2(p, z, y_sym_anchor, lo, L_pad, sel):
            """non-anchor-pass tables, fused: anchor dequant -> context conv
            -> entropy params -> pmf in one device call."""
            z = z.astype(jnp.float32)
            y_anchor_hat = model.apply(p, y_sym_anchor, z,
                                       method=model.decode_anchor)
            params = model.apply(p, z, y_anchor_hat,
                                 method=model.nonanchor_params)
            return _rows_from_params(params, sel, lo, L_pad)

        self._y_pmf_pass1 = jax.jit(_pmf1, static_argnums=(3,))
        self._y_pmf_pass2 = jax.jit(_pmf2, static_argnums=(4,))

    @staticmethod
    def _split_idx(yh: int, yw: int, yc: int):
        """Flat NHWC indices of the anchor ((i+j) even) and non-anchor
        halves — the fixed on-wire symbol order within each stream."""
        mask = (np.add.outer(np.arange(yh), np.arange(yw)) % 2 == 0)
        flat = np.repeat(mask.ravel(), yc)
        return (np.where(flat)[0].astype(np.int64),
                np.where(~flat)[0].astype(np.int64))

    def _pass_tables(self, pmf_fn, args, y_lo, l_per, sel_dev) -> list:
        """One pass's tables via the shared chunked builder."""
        fn = lambda p, *a: pmf_fn(p, *a, sel_dev)  # noqa: E731
        return self._chunked_pmf_tables(fn, tuple(args), y_lo, l_per,
                                        int(sel_dev.shape[0]))

    def _host_encode(self, handles) -> CompressResult:
        (h, w), y_q, z_q, y_mm, z_mm = handles
        b = y_q.shape[0]
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]
        y_np = np.asarray(y_q).astype(np.int64)
        z_np = np.asarray(z_q).astype(np.int64)

        tail = self.cfg.tail
        # adaptive interleave: each of the two y streams carries half the
        # elements; on small tiles the per-stream state-flush overhead
        # (8 bytes/state) dominates, so drop to one state there
        n_states = self.cfg.interleave \
            if yh * yw * yc // 2 >= 4096 else 1
        z_lo, lz_per = self._bounds_from_minmax(z_mm, tail,
                                                self.cfg.support_bucket)
        y_lo, ly_per = self._bounds_from_minmax(y_mm, tail,
                                                self.cfg.support_bucket)
        z_cdfs = self._z_tables(z_lo, lz_per)

        a_idx, na_idx = self._split_idx(yh, yw, yc)
        a_sel = jnp.asarray(a_idx, jnp.int32)
        na_sel = jnp.asarray(na_idx, jnp.int32)

        # pass-2 table input: anchor-only symbols, byte-identical to the
        # decoder's scatter of the decoded anchor stream
        y_anchor_only = np.asarray(y_q).copy()
        y_anchor_only.reshape(b, -1)[:, na_idx] = 0
        y_anchor_dev = self._put(y_anchor_only)

        y_cdfs_a = self._pass_tables(self._y_pmf_pass1, (z_q,),
                                     y_lo, ly_per, a_sel)
        y_cdfs_na = self._pass_tables(self._y_pmf_pass2, (z_q, y_anchor_dev),
                                      y_lo, ly_per, na_sel)

        z_row_idx = _channel_row_idx(zh, zw, zc)
        a_rows = np.arange(len(a_idx), dtype=np.int32)
        na_rows = np.arange(len(na_idx), dtype=np.int32)

        # Three batched native calls (z / anchor / non-anchor planes).
        flat = y_np.reshape(b, -1)
        z_syms = (z_np.reshape(b, -1) - z_lo[:, None]).astype(np.int32)
        a_syms = (flat[:, a_idx] - y_lo[:, None]).astype(np.int32)
        na_syms = (flat[:, na_idx] - y_lo[:, None]).astype(np.int32)
        z_payloads = rans_encode_batch(z_syms, z_cdfs, z_row_idx, n_states)
        a_payloads = rans_encode_batch(a_syms, y_cdfs_a, a_rows, n_states)
        na_payloads = rans_encode_batch(na_syms, y_cdfs_na, na_rows, n_states)

        bounds = [(int(z_lo[i]), int(z_lo[i]) + int(lz_per[i]) - 1,
                   int(y_lo[i]), int(y_lo[i]) + int(ly_per[i]) - 1)
                  for i in range(b)]
        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=bounds,
                       z_payloads=z_payloads,
                       y_streams=[a_payloads, na_payloads],
                       spatial_params=True, n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [8 * (len(zp) + len(ap) + len(np_))
                          for zp, ap, np_ in zip(z_payloads, a_payloads,
                                                 na_payloads)]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    def _decode_planes(self, bs: Bitstream):
        if not bs.two_pass:
            raise ValueError("CheckerboardCodec needs a two_pass bitstream")
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        z_lo = np.asarray([bd[0] for bd in bs.bounds], np.int32)
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        lz_per = np.asarray([bd[1] - bd[0] + 1 for bd in bs.bounds], np.int32)
        ly_per = np.asarray([bd[3] - bd[2] + 1 for bd in bs.bounds], np.int32)
        if (max(lz_per.max(), ly_per.max()) > Codec.MAX_SUPPORT
                or min(lz_per.min(), ly_per.min()) < 1):
            raise ValueError("corrupt bitstream: implausible symbol range")

        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        sym = rans_decode_batch(bs.z_payloads, zh * zw * zc, z_cdfs,
                                z_row_idx, bs.n_states)
        z_hat = (sym + z_lo[:, None]).astype(np.int16).reshape(b, zh, zw, zc)
        z_dev = self._put(z_hat)

        a_idx, na_idx = self._split_idx(yh, yw, yc)
        a_sel = jnp.asarray(a_idx, jnp.int32)
        na_sel = jnp.asarray(na_idx, jnp.int32)
        a_rows = np.arange(len(a_idx), dtype=np.int32)
        na_rows = np.arange(len(na_idx), dtype=np.int32)

        # pass 1: anchors under hyper-only tables
        y_cdfs_a = self._pass_tables(self._y_pmf_pass1, (z_dev,),
                                     y_lo, ly_per, a_sel)
        a_syms = rans_decode_batch(bs.y_payloads, len(a_idx), y_cdfs_a,
                                   a_rows, bs.n_states)

        y_flat = np.zeros((b, yh * yw * yc), np.int16)
        y_flat[:, a_idx] = (a_syms + y_lo[:, None]).astype(np.int16)
        y_anchor_dev = self._put(y_flat.reshape(b, yh, yw, yc))

        # pass 2: non-anchors under context tables from the decoded anchors
        y_cdfs_na = self._pass_tables(self._y_pmf_pass2,
                                      (z_dev, y_anchor_dev),
                                      y_lo, ly_per, na_sel)
        na_syms = rans_decode_batch(bs.y2_payloads, len(na_idx), y_cdfs_na,
                                    na_rows, bs.n_states)
        y_flat[:, na_idx] = (na_syms + y_lo[:, None]).astype(np.int16)
        return y_flat.reshape(b, yh, yw, yc), z_hat, None


class ChannelCodec(ZooCodec):
    """K-pass entropy codec for the channel-conditional family
    (models/charm.py ChannelARHyperprior): slice k decodes under Gaussian
    tables conditioned on the hyperprior AND the decoded slices 0..k-1, so
    the y plane is K rANS streams. Both sides run the SAME per-slice jitted
    functions (slice_pmf_params / slice_dequant) on identically-shaped
    inputs — the bitwise-identical-tables invariant. JAX async dispatch
    keeps it to ~one host sync per slice (the pmf transfer); the decoded
    prefix never leaves the device between slices."""

    def _build_model_jits(self):
        model = self.model
        self._build_zoo_common_jits()
        self._y_pmf_from_z = None
        self._y_pmf_from_z_spatial = None

        def _pmf_k(p, z, prefix, lo, L_pad):
            sigma, _ = model.apply(p, z.astype(jnp.float32), prefix,
                                   method=model.slice_pmf_params)
            rows = jnp.maximum(sigma.reshape(sigma.shape[0], -1),
                               self.SIGMA_MIN)
            return gaussian_bin_probs(rows, lo, L_pad)

        def _dequant_k(p, z, prefix, syms):
            return model.apply(p, z.astype(jnp.float32), prefix, syms,
                               method=model.slice_dequant)

        self._pmf_k = jax.jit(_pmf_k, static_argnums=(4,))
        self._dequant_k = jax.jit(_dequant_k)

    def _slice_tables(self, z_dev, prefix_dev, y_lo: np.ndarray,
                      l_per: np.ndarray, rows: int) -> list:
        """One slice's tables via the shared chunked builder."""
        return self._chunked_pmf_tables(self._pmf_k, (z_dev, prefix_dev),
                                        y_lo, l_per, rows)

    def _host_encode(self, handles) -> CompressResult:
        (h, w), y_q, z_q, y_mm, z_mm = handles
        b = y_q.shape[0]
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]
        y_np = np.asarray(y_q).astype(np.int64)
        z_np = np.asarray(z_q).astype(np.int64)
        sl = self.model.slice_size
        n_slices = self.model.num_slices

        tail = self.cfg.tail
        # adaptive interleave: K small per-slice streams pay K*states flush
        # overhead — one state per stream on small tiles
        n_states = self.cfg.interleave if yh * yw * sl >= 4096 else 1
        z_lo, lz_per = self._bounds_from_minmax(z_mm, tail,
                                                self.cfg.support_bucket)
        y_lo, ly_per = self._bounds_from_minmax(y_mm, tail,
                                                self.cfg.support_bucket)
        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)
        rows_k = yh * yw * sl
        row_idx = np.arange(rows_k, dtype=np.int32)

        z_payloads = []
        y_streams: list = [[] for _ in range(n_slices)]
        prefix = self._put(np.zeros((b, yh, yw, 0), np.float32))
        for k in range(n_slices):
            cdfs_k = self._slice_tables(z_q, prefix, y_lo, ly_per, rows_k)
            syms_dev = jax.lax.slice_in_dim(y_q, k * sl, (k + 1) * sl, axis=3)
            prefix = self._dequant_k(self.params, z_q, prefix, syms_dev)

            s_k = (y_np[:, :, :, k * sl:(k + 1) * sl].reshape(b, -1)
                   - y_lo[:, None]).astype(np.int32)
            y_streams[k] = rans_encode_batch(s_k, cdfs_k, row_idx, n_states)

        z_syms = (z_np.reshape(b, -1) - z_lo[:, None]).astype(np.int32)
        z_payloads = rans_encode_batch(z_syms, z_cdfs, z_row_idx, n_states)

        bounds = [(int(z_lo[i]), int(z_lo[i]) + int(lz_per[i]) - 1,
                   int(y_lo[i]), int(y_lo[i]) + int(ly_per[i]) - 1)
                  for i in range(b)]
        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=bounds, z_payloads=z_payloads,
                       y_streams=y_streams, spatial_params=True,
                       n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [
            8 * (len(z_payloads[i]) + sum(len(st[i]) for st in y_streams))
            for i in range(b)]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    def _decode_planes(self, bs: Bitstream):
        n_slices = self.model.num_slices
        if bs.n_y_streams != n_slices:
            raise ValueError(f"bitstream has {bs.n_y_streams} y streams; "
                             f"this model decodes {n_slices}")
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        sl = self.model.slice_size
        z_lo = np.asarray([bd[0] for bd in bs.bounds], np.int32)
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        lz_per = np.asarray([bd[1] - bd[0] + 1 for bd in bs.bounds], np.int32)
        ly_per = np.asarray([bd[3] - bd[2] + 1 for bd in bs.bounds], np.int32)
        if (max(lz_per.max(), ly_per.max()) > Codec.MAX_SUPPORT
                or min(lz_per.min(), ly_per.min()) < 1):
            raise ValueError("corrupt bitstream: implausible symbol range")

        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        sym = rans_decode_batch(bs.z_payloads, zh * zw * zc, z_cdfs,
                                z_row_idx, bs.n_states)
        z_hat = (sym + z_lo[:, None]).astype(np.int16).reshape(b, zh, zw, zc)
        z_dev = self._put(z_hat)

        rows_k = yh * yw * sl
        row_idx = np.arange(rows_k, dtype=np.int32)
        y_out = np.zeros((b, yh, yw, yc), np.int16)
        prefix = self._put(np.zeros((b, yh, yw, 0), np.float32))
        for k in range(n_slices):
            cdfs_k = self._slice_tables(z_dev, prefix, y_lo, ly_per, rows_k)
            sym = rans_decode_batch(bs.y_streams[k], rows_k, cdfs_k,
                                    row_idx, bs.n_states)
            syms_k = (sym + y_lo[:, None]).astype(np.int16) \
                .reshape(b, yh, yw, sl)
            y_out[..., k * sl:(k + 1) * sl] = syms_k
            prefix = self._dequant_k(self.params, z_dev, prefix,
                                     self._put(syms_k))
        # `prefix` is the fully dequantized y (all K slices, LRP applied) —
        # hand it to decompress so synthesis skips a second K-pass recursion
        return y_out, z_hat, prefix


class ElicCodec(ZooCodec):
    """2K-pass entropy codec for the joint space-channel context family
    (models/elic.py ElicHyperprior): per channel slice, anchors decode
    first (tables from hyper features + decoded prefix), then non-anchors
    (tables additionally conditioned on the slice's decoded anchors via the
    masked context conv) — 2K rANS streams per image, 2K dense device
    passes total, the TPU-native equivalent of mbt2018's serial joint
    context (SURVEY.md section 2 #19; He 2022 SCCTX).

    Decodability invariant: both sides build tables through the SAME jitted
    slice functions. The anchor-dequant masks its symbol input internally
    (mask * (sym + mu)), so the encoder may feed the full slice symbols
    while the decoder feeds anchor-scattered ones — finite values at masked
    positions multiply to exactly 0.0, leaving the conditioning tensor (and
    therefore every downstream table) bitwise identical."""

    def _build_model_jits(self):
        model = self.model
        self._build_zoo_common_jits()
        self._y_pmf_from_z = None
        self._y_pmf_from_z_spatial = None

        def _pmf_a(p, z, prefix, lo, L_pad, sel):
            sigma, _ = model.apply(p, z.astype(jnp.float32), prefix,
                                   method=model.slice_anchor_params)
            rows = jnp.maximum(sigma.reshape(sigma.shape[0], -1)[:, sel],
                               self.SIGMA_MIN)
            return gaussian_bin_probs(rows, lo, L_pad)

        def _pmf_na(p, z, prefix, y_anchor_hat, lo, L_pad, sel):
            sigma, _ = model.apply(p, z.astype(jnp.float32), prefix,
                                   y_anchor_hat,
                                   method=model.slice_nonanchor_params)
            rows = jnp.maximum(sigma.reshape(sigma.shape[0], -1)[:, sel],
                               self.SIGMA_MIN)
            return gaussian_bin_probs(rows, lo, L_pad)

        def _deq_a(p, z, prefix, syms):
            return model.apply(p, z.astype(jnp.float32), prefix, syms,
                               method=model.slice_anchor_dequant)

        def _deq_joint(p, z, prefix, y_anchor_hat, syms_na):
            return model.apply(p, z.astype(jnp.float32), prefix,
                               y_anchor_hat, syms_na,
                               method=model.slice_joint_dequant)

        self._pmf_a = jax.jit(_pmf_a, static_argnums=(4,))
        self._pmf_na = jax.jit(_pmf_na, static_argnums=(5,))
        self._deq_a = jax.jit(_deq_a)
        self._deq_joint = jax.jit(_deq_joint)

    def _pass_tables(self, pmf_jit, args, y_lo, l_per, sel_dev) -> list:
        fn = lambda p, *a: pmf_jit(p, *a, sel_dev)  # noqa: E731
        return self._chunked_pmf_tables(fn, tuple(args), y_lo, l_per,
                                        int(sel_dev.shape[0]))

    def _host_encode(self, handles) -> CompressResult:
        (h, w), y_q, z_q, y_mm, z_mm = handles
        b = y_q.shape[0]
        yh, yw, yc = y_q.shape[1:]
        zh, zw, zc = z_q.shape[1:]
        y_np = np.asarray(y_q).astype(np.int64)
        z_np = np.asarray(z_q).astype(np.int64)
        sl = self.model.slice_size
        n_slices = self.model.num_slices

        tail = self.cfg.tail
        # 2K half-slice streams: drop to one rANS state on small tiles
        n_states = self.cfg.interleave if yh * yw * sl // 2 >= 4096 else 1
        z_lo, lz_per = self._bounds_from_minmax(z_mm, tail,
                                                self.cfg.support_bucket)
        y_lo, ly_per = self._bounds_from_minmax(y_mm, tail,
                                                self.cfg.support_bucket)
        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        a_idx, na_idx = CheckerboardCodec._split_idx(yh, yw, sl)
        a_sel = jnp.asarray(a_idx, jnp.int32)
        na_sel = jnp.asarray(na_idx, jnp.int32)
        a_rows = np.arange(len(a_idx), dtype=np.int32)
        na_rows = np.arange(len(na_idx), dtype=np.int32)

        y_streams: list = []
        prefix = self._put(np.zeros((b, yh, yw, 0), np.float32))
        for k in range(n_slices):
            syms_dev = jax.lax.slice_in_dim(y_q, k * sl, (k + 1) * sl,
                                            axis=3)
            cdfs_a = self._pass_tables(self._pmf_a, (z_q, prefix),
                                       y_lo, ly_per, a_sel)
            # full slice symbols: the internal mask zeroes non-anchors
            y_anchor_hat = self._deq_a(self.params, z_q, prefix, syms_dev)
            cdfs_na = self._pass_tables(self._pmf_na,
                                        (z_q, prefix, y_anchor_hat),
                                        y_lo, ly_per, na_sel)
            prefix = self._deq_joint(self.params, z_q, prefix, y_anchor_hat,
                                     syms_dev)

            flat = y_np[:, :, :, k * sl:(k + 1) * sl].reshape(b, -1)
            s_a = (flat[:, a_idx] - y_lo[:, None]).astype(np.int32)
            s_na = (flat[:, na_idx] - y_lo[:, None]).astype(np.int32)
            y_streams.append(rans_encode_batch(s_a, cdfs_a, a_rows,
                                               n_states))
            y_streams.append(rans_encode_batch(s_na, cdfs_na, na_rows,
                                               n_states))

        z_syms = (z_np.reshape(b, -1) - z_lo[:, None]).astype(np.int32)
        z_payloads = rans_encode_batch(z_syms, z_cdfs, z_row_idx, n_states)

        bounds = [(int(z_lo[i]), int(z_lo[i]) + int(lz_per[i]) - 1,
                   int(y_lo[i]), int(y_lo[i]) + int(ly_per[i]) - 1)
                  for i in range(b)]
        bs = Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                       bounds=bounds, z_payloads=z_payloads,
                       y_streams=y_streams, spatial_params=True,
                       n_states=n_states, tail=tail)
        data = pack_bitstream(bs)
        per_image_bits = [
            8 * (len(z_payloads[i]) + sum(len(st[i]) for st in y_streams))
            for i in range(b)]
        payload_bits = float(sum(per_image_bits))
        return CompressResult(
            data=data,
            bpp=payload_bits / (b * h * w),
            bpp_container=8.0 * len(data) / (b * h * w),
            per_image_bits=per_image_bits)

    def _decode_planes(self, bs: Bitstream):
        n_slices = self.model.num_slices
        if bs.n_y_streams != 2 * n_slices:
            raise ValueError(f"bitstream has {bs.n_y_streams} y streams; "
                             f"this model decodes {2 * n_slices}")
        b, yh, yw, yc = bs.y_shape
        _, zh, zw, zc = bs.z_shape
        sl = self.model.slice_size
        z_lo = np.asarray([bd[0] for bd in bs.bounds], np.int32)
        y_lo = np.asarray([bd[2] for bd in bs.bounds], np.int32)
        lz_per = np.asarray([bd[1] - bd[0] + 1 for bd in bs.bounds], np.int32)
        ly_per = np.asarray([bd[3] - bd[2] + 1 for bd in bs.bounds], np.int32)
        if (max(lz_per.max(), ly_per.max()) > Codec.MAX_SUPPORT
                or min(lz_per.min(), ly_per.min()) < 1):
            raise ValueError("corrupt bitstream: implausible symbol range")

        z_cdfs = self._z_tables(z_lo, lz_per)
        z_row_idx = _channel_row_idx(zh, zw, zc)

        sym = rans_decode_batch(bs.z_payloads, zh * zw * zc, z_cdfs,
                                z_row_idx, bs.n_states)
        z_hat = (sym + z_lo[:, None]).astype(np.int16).reshape(b, zh, zw, zc)
        z_dev = self._put(z_hat)

        a_idx, na_idx = CheckerboardCodec._split_idx(yh, yw, sl)
        a_sel = jnp.asarray(a_idx, jnp.int32)
        na_sel = jnp.asarray(na_idx, jnp.int32)
        a_rows = np.arange(len(a_idx), dtype=np.int32)
        na_rows = np.arange(len(na_idx), dtype=np.int32)

        y_out = np.zeros((b, yh, yw, yc), np.int16)
        prefix = self._put(np.zeros((b, yh, yw, 0), np.float32))
        for k in range(n_slices):
            cdfs_a = self._pass_tables(self._pmf_a, (z_dev, prefix),
                                       y_lo, ly_per, a_sel)

            a_syms = rans_decode_batch(bs.y_streams[2 * k], len(a_idx),
                                       cdfs_a, a_rows, bs.n_states)
            slice_flat = np.zeros((b, yh * yw * sl), np.int16)
            slice_flat[:, a_idx] = (a_syms + y_lo[:, None]).astype(np.int16)
            y_anchor_hat = self._deq_a(
                self.params, z_dev, prefix,
                self._put(slice_flat.reshape(b, yh, yw, sl)))

            cdfs_na = self._pass_tables(self._pmf_na,
                                        (z_dev, prefix, y_anchor_hat),
                                        y_lo, ly_per, na_sel)

            na_syms = rans_decode_batch(bs.y_streams[2 * k + 1], len(na_idx),
                                        cdfs_na, na_rows, bs.n_states)
            slice_flat[:, na_idx] = (na_syms + y_lo[:, None]).astype(np.int16)
            slice_syms = slice_flat.reshape(b, yh, yw, sl)
            prefix = self._deq_joint(self.params, z_dev, prefix,
                                     y_anchor_hat, self._put(slice_syms))
            y_out[..., k * sl:(k + 1) * sl] = slice_syms
        # `prefix` is the fully dequantized y — synthesis skips the 2K-pass
        # recursion
        return y_out, z_hat, prefix


def make_codec(model, params, cfg: CodecConfig | None = None,
               compute_dtype=None, mesh=None) -> Codec:
    """Model-family dispatch: the Student-t DSIC codec, the zoo's
    Gaussian-conditional codec (any model exposing the zoo codec protocol:
    z_cdf / y_scales / decode_y), the two-pass checkerboard codec
    (anchor_params / nonanchor_params / decode_anchor), the K-pass
    channel-conditional codec (slice_pmf_params / slice_dequant), or the
    2K-pass joint space-channel codec (slice_anchor_params /
    slice_joint_dequant)."""
    if hasattr(model, "slice_anchor_params"):
        cls = ElicCodec
    elif hasattr(model, "slice_pmf_params"):
        cls = ChannelCodec
    elif hasattr(model, "anchor_params"):
        cls = CheckerboardCodec
    elif hasattr(model, "z_cdf"):
        cls = ZooCodec
    else:
        cls = Codec
    return cls(model, params, cfg, compute_dtype, mesh=mesh)
