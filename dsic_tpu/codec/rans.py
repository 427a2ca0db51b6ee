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
