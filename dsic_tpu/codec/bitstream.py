"""Bitstream container: header + per-image z/y payloads.

Capability-equivalent of the reference's compressed dict
(eval_selfcontained_entropy.py:68-74): per-batch shapes, per-image symbol
bounds (min/max with tail), and the two byte strings per image — serialized to
one self-describing byte buffer.

Layout (little-endian):
    magic   4s   b"DSTC"
    version u8
    flags   u8   bit0: spatial_params
    n_states u8  rANS interleave factor
    tail    u8
    B, y_h, y_w, y_c, z_h, z_w, z_c   u16 x7
    per image: zmin, zmax, ymin, ymax  i32 x4;  len_z, len_y  u32 x2
    payloads: (z bytes, y bytes) per image, concatenated
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC = b"DSTC"
VERSION = 1
_HEAD = struct.Struct("<4sBBBB7H")
_IMG = struct.Struct("<4i2I")

FILE_SUFFIX = ".dsic"


def save_bitstream(path: str, data: bytes) -> str:
    import os
    if not path.endswith(FILE_SUFFIX):
        path = path + FILE_SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def load_bitstream(path: str) -> bytes:
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC:
        raise ValueError(f"{path} is not a DSTC bitstream")
    return data


@dataclass
class Bitstream:
    y_shape: tuple  # (B, h, w, M)
    z_shape: tuple  # (B, h, w, N)
    bounds: list  # per image (zmin, zmax, ymin, ymax)
    z_payloads: list = field(default_factory=list)  # bytes per image
    y_payloads: list = field(default_factory=list)
    spatial_params: bool = False
    n_states: int = 4
    tail: int = 10

    @property
    def num_bytes(self) -> int:
        payload = sum(len(z) + len(y)
                      for z, y in zip(self.z_payloads, self.y_payloads))
        return _HEAD.size + _IMG.size * len(self.bounds) + payload


def pack_bitstream(bs: Bitstream) -> bytes:
    b, yh, yw, yc = bs.y_shape
    _, zh, zw, zc = bs.z_shape
    flags = 1 if bs.spatial_params else 0
    parts = [_HEAD.pack(MAGIC, VERSION, flags, bs.n_states, bs.tail,
                        b, yh, yw, yc, zh, zw, zc)]
    for (zmin, zmax, ymin, ymax), zp, yp in zip(bs.bounds, bs.z_payloads,
                                                bs.y_payloads):
        parts.append(_IMG.pack(zmin, zmax, ymin, ymax, len(zp), len(yp)))
    for zp, yp in zip(bs.z_payloads, bs.y_payloads):
        parts.append(zp)
        parts.append(yp)
    return b"".join(parts)


def unpack_bitstream(data: bytes) -> Bitstream:
    if len(data) < _HEAD.size:
        raise ValueError("truncated bitstream (no header)")
    magic, version, flags, n_states, tail, b, yh, yw, yc, zh, zw, zc = \
        _HEAD.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("not a DSTC bitstream")
    if version != VERSION:
        raise ValueError(f"unsupported bitstream version {version}")
    if len(data) < _HEAD.size + _IMG.size * b:
        raise ValueError("truncated bitstream (image table)")
    off = _HEAD.size
    bounds, lens = [], []
    for _ in range(b):
        zmin, zmax, ymin, ymax, lz, ly = _IMG.unpack_from(data, off)
        off += _IMG.size
        bounds.append((zmin, zmax, ymin, ymax))
        lens.append((lz, ly))
    if off + sum(lz + ly for lz, ly in lens) > len(data):
        raise ValueError("truncated bitstream (payloads)")
    z_payloads, y_payloads = [], []
    for lz, ly in lens:
        z_payloads.append(data[off:off + lz]); off += lz
        y_payloads.append(data[off:off + ly]); off += ly
    if off != len(data):
        raise ValueError("trailing bytes in bitstream")
    return Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                     bounds=bounds, z_payloads=z_payloads,
                     y_payloads=y_payloads, spatial_params=bool(flags & 1),
                     n_states=n_states, tail=tail)
