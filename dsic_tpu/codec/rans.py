"""ctypes binding to the native rANS coder (codec/native/rans.cpp), with a
lazy g++ build. The coder fills the torchac slot of the reference
(SURVEY.md section 2 #13): host-side bitstream assembly against TPU-computed
CDF tables. A pure-numpy fallback coder keeps the pipeline functional where no
C++ toolchain exists (slow; tests assert both agree bit-for-bit)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native", "rans.cpp")
_BUILD_DIR = os.path.join(_DIR, "native", "build")

PROB_BITS = 16
PROB_SCALE = 1 << PROB_BITS
_RANS_L = 1 << 31
_MASK64 = (1 << 64) - 1

_lib = None
_lib_lock = threading.Lock()
_build_failed: str | None = None


def _src_tag() -> str:
    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()[:16]


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed is not None:
            return _lib
        so_path = os.path.join(_BUILD_DIR, f"librans-{_src_tag()}.so")
        if not os.path.exists(so_path):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", "-o", so_path, _SRC]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as exc:
                _build_failed = str(exc)
                return None
        lib = ctypes.CDLL(so_path)
        lib.rans_encode.restype = ctypes.c_int64
        lib.rans_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
        lib.rans_decode.restype = ctypes.c_int64
        lib.rans_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64]
        lib.rans_encode_batch.restype = ctypes.c_int64
        lib.rans_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.rans_decode_batch.restype = ctypes.c_int64
        lib.rans_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
        _lib = lib
        return _lib


def rans_available() -> bool:
    return _load() is not None


def _check_inputs(symbols, cdfs, row_idx):
    symbols = np.ascontiguousarray(symbols, dtype=np.int32)
    cdfs = np.ascontiguousarray(cdfs, dtype=np.uint32)
    if cdfs.ndim == 1:
        cdfs = cdfs[None, :]
    if row_idx is not None:
        row_idx = np.ascontiguousarray(row_idx, dtype=np.int32)
        if row_idx.shape != symbols.shape:
            raise ValueError("row_idx must match symbols shape")
        if row_idx.size and (row_idx.min() < 0 or row_idx.max() >= cdfs.shape[0]):
            raise ValueError("row_idx out of range")
    return symbols.ravel(), cdfs, None if row_idx is None else row_idx.ravel()


def rans_encode(symbols: np.ndarray, cdfs: np.ndarray,
                row_idx: np.ndarray | None = None, n_states: int = 4) -> bytes:
    """Encode int symbols in [0, L) against uint32 CDF rows (R, L+1) with
    cdf[:, 0] == 0 and cdf[:, L] == 65536. row_idx maps each symbol to a row."""
    symbols, cdfs, row_idx = _check_inputs(symbols, cdfs, row_idx)
    L = cdfs.shape[1] - 1
    lib = _load()
    if lib is None:
        return _py_encode(symbols, cdfs, row_idx, n_states)
    cap = 4 * (symbols.size + 4) + 8 * n_states
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rans_encode(
        symbols.ctypes.data, symbols.size, cdfs.ctypes.data, L,
        None if row_idx is None else row_idx.ctypes.data,
        n_states, out.ctypes.data, cap)
    if n < 0:
        raise ValueError("rans_encode failed (symbol out of range or overflow)")
    return out[:n].tobytes()


def rans_decode(data: bytes, n_symbols: int, cdfs: np.ndarray,
                row_idx: np.ndarray | None = None,
                n_states: int = 4) -> np.ndarray:
    """Inverse of :func:`rans_encode`. Returns int32 symbols (n_symbols,)."""
    cdfs = np.ascontiguousarray(cdfs, dtype=np.uint32)
    if cdfs.ndim == 1:
        cdfs = cdfs[None, :]
    if row_idx is not None:
        row_idx = np.ascontiguousarray(row_idx, dtype=np.int32).ravel()
    L = cdfs.shape[1] - 1
    lib = _load()
    if lib is None:
        return _py_decode(data, n_symbols, cdfs, row_idx, n_states)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.int32)
    rc = lib.rans_decode(
        buf.ctypes.data, buf.size, cdfs.ctypes.data, L,
        None if row_idx is None else row_idx.ctypes.data,
        cdfs.shape[0], n_states, out.ctypes.data, n_symbols)
    if rc != 0:
        raise ValueError("rans_decode failed (malformed bitstream)")
    return out


# ---------------------------------------------------------------------------
# Batch API: B independent per-image streams in ONE native call — removes the
# per-image Python/ctypes/thread-pool overhead of the production codec path
# (the host paired with the TPU exposes a single core, so batching beats
# threading). Bit-identical to per-stream rans_encode/rans_decode.
# ---------------------------------------------------------------------------

def _batch_cdfs(cdfs_list):
    """Per-image (R, L_i+1) uint32 tables -> (concat words, offsets, Ls)."""
    n_rows = cdfs_list[0].shape[0]
    offs = np.zeros(len(cdfs_list), np.int64)
    ls = np.zeros(len(cdfs_list), np.int32)
    total = 0
    for i, c in enumerate(cdfs_list):
        if c.ndim != 2 or c.shape[0] != n_rows:
            raise ValueError("batch requires equal row counts per image")
        offs[i] = total
        ls[i] = c.shape[1] - 1
        total += c.size
    concat = np.empty(total, np.uint32)
    for i, c in enumerate(cdfs_list):
        concat[offs[i]:offs[i] + c.size] = \
            np.ascontiguousarray(c, np.uint32).ravel()
    return concat, offs, ls, n_rows


def rans_encode_batch(symbols: np.ndarray, cdfs_list: list,
                      row_idx: np.ndarray | None = None,
                      n_states: int = 4) -> list[bytes]:
    """Encode B equal-length streams: symbols (B, n) int32 or uint8 planes,
    cdfs_list[i] = (R, L_i+1) uint32 rows for image i, one SHARED row_idx
    (length n). Returns the B payloads. Bit-identical to calling
    :func:`rans_encode` per image."""
    symbols = np.ascontiguousarray(symbols)
    if symbols.dtype not in (np.dtype(np.uint8), np.dtype(np.int32)):
        symbols = symbols.astype(np.int32)
    b, n = symbols.shape
    if row_idx is not None:
        row_idx = np.ascontiguousarray(row_idx, dtype=np.int32).ravel()
        if row_idx.size != n:
            raise ValueError("shared row_idx must match per-image length")
    lib = _load()
    if lib is None:
        return [_py_encode(symbols[i].astype(np.int32).ravel(),
                           np.ascontiguousarray(cdfs_list[i], np.uint32),
                           row_idx, n_states) for i in range(b)]
    concat, cdf_off, ls, n_rows = _batch_cdfs(cdfs_list)
    if row_idx is not None and row_idx.size and \
            (row_idx.min() < 0 or row_idx.max() >= n_rows):
        raise ValueError("row_idx out of range")
    sym_off = (np.arange(b + 1, dtype=np.int64) * n)
    stride = 4 * (n + 4) + 8 * n_states
    out = np.empty(b * stride, np.uint8)
    out_len = np.empty(b, np.int64)
    rc = lib.rans_encode_batch(
        symbols.ctypes.data, int(symbols.dtype == np.uint8),
        sym_off.ctypes.data, b, concat.ctypes.data, cdf_off.ctypes.data,
        ls.ctypes.data, n_rows,
        None if row_idx is None else row_idx.ctypes.data,
        n_states, out.ctypes.data, stride, out_len.ctypes.data)
    if rc != 0:
        raise ValueError("rans_encode_batch failed (symbol out of range)")
    return [out[i * stride:i * stride + out_len[i]].tobytes()
            for i in range(b)]


def rans_decode_batch(payloads: list[bytes], n_symbols: int, cdfs_list: list,
                      row_idx: np.ndarray | None = None, n_states: int = 4,
                      u8: bool = False) -> np.ndarray:
    """Inverse of :func:`rans_encode_batch`: returns (B, n_symbols) symbols,
    uint8 when ``u8`` (requires every L_i <= 256) else int32."""
    b = len(payloads)
    if row_idx is not None:
        row_idx = np.ascontiguousarray(row_idx, dtype=np.int32).ravel()
    lib = _load()
    if lib is None:
        rows = [_py_decode(payloads[i], n_symbols,
                           np.ascontiguousarray(cdfs_list[i], np.uint32),
                           row_idx, n_states) for i in range(b)]
        out = np.stack(rows, axis=0)
        return out.astype(np.uint8) if u8 else out
    concat, cdf_off, ls, n_rows = _batch_cdfs(cdfs_list)
    if u8 and ls.max(initial=0) > 256:
        raise ValueError("u8 decode requires L <= 256")
    in_off = np.zeros(b + 1, np.int64)
    for i, p in enumerate(payloads):
        in_off[i + 1] = in_off[i] + len(p)
    buf = np.empty(in_off[-1], np.uint8)
    for i, p in enumerate(payloads):
        buf[in_off[i]:in_off[i + 1]] = np.frombuffer(p, np.uint8)
    sym_off = (np.arange(b + 1, dtype=np.int64) * n_symbols)
    out = np.empty(b * n_symbols, np.uint8 if u8 else np.int32)
    rc = lib.rans_decode_batch(
        buf.ctypes.data, in_off.ctypes.data, b, concat.ctypes.data,
        cdf_off.ctypes.data, ls.ctypes.data, n_rows,
        None if row_idx is None else row_idx.ctypes.data,
        n_states, out.ctypes.data, int(u8), sym_off.ctypes.data)
    if rc != 0:
        raise ValueError("rans_decode_batch failed (malformed bitstream)")
    return out.reshape(b, n_symbols)


# ---------------------------------------------------------------------------
# Pure-python fallback (bit-compatible with the C++ coder; used when g++ is
# unavailable and as a cross-check oracle in tests).
# ---------------------------------------------------------------------------

def _py_encode(symbols, cdfs, row_idx, n_states: int) -> bytes:
    n_states = max(1, min(8, n_states))
    L = cdfs.shape[1] - 1
    states = [_RANS_L] * n_states
    words: list[int] = []
    for i in range(symbols.size - 1, -1, -1):
        s = int(symbols[i])
        if s < 0 or s >= L:
            raise ValueError("symbol out of range")
        row = cdfs[0 if row_idx is None else int(row_idx[i])]
        start, freq = int(row[s]), int(row[s + 1]) - int(row[s])
        k = i % n_states
        x = states[k]
        x_max = ((_RANS_L >> PROB_BITS) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        states[k] = (((x // freq) << PROB_BITS) + (x % freq) + start) & _MASK64
    for k in range(n_states - 1, -1, -1):
        words.append(states[k] & 0xFFFFFFFF)
        words.append((states[k] >> 32) & 0xFFFFFFFF)
    return np.asarray(words[::-1], dtype=np.uint32).tobytes()


def _py_decode(data, n_symbols, cdfs, row_idx, n_states: int) -> np.ndarray:
    n_states = max(1, min(8, n_states))
    L = cdfs.shape[1] - 1
    words = np.frombuffer(data, dtype=np.uint32)
    pos = 0
    states = []
    for _ in range(n_states):
        hi, lo = int(words[pos]), int(words[pos + 1])
        pos += 2
        states.append((hi << 32) | lo)
    out = np.empty(n_symbols, dtype=np.int32)
    for i in range(n_symbols):
        k = i % n_states
        x = states[k]
        slot = x & (PROB_SCALE - 1)
        row = cdfs[0 if row_idx is None else int(row_idx[i])]
        s = int(np.searchsorted(row, slot, side="right")) - 1
        start, freq = int(row[s]), int(row[s + 1]) - int(row[s])
        x = freq * (x >> PROB_BITS) + slot - start
        if x < _RANS_L:
            x = (x << 32) | int(words[pos])
            pos += 1
        states[k] = x
        out[i] = s
    return out
