"""Bitstream container: header + per-image z/y payloads.

Capability-equivalent of the reference's compressed dict
(eval_selfcontained_entropy.py:68-74): per-batch shapes, per-image symbol
bounds (min/max with tail), and the two byte strings per image — serialized to
one self-describing byte buffer.

Layout (little-endian):
    magic   4s   b"DSTC"
    version u8
    flags   u8   bit0: spatial_params; bit1: two_pass (checkerboard context)
    n_states u8  rANS interleave factor
    tail    u8
    B, y_h, y_w, y_c, z_h, z_w, z_c   u16 x7
    per image: zmin, zmax, ymin, ymax  i32 x4;  len_z, len_y  u32 x2
               (+ len_y2 u32 when two_pass)
    payloads: (z bytes, y bytes[, y2 bytes]) per image, concatenated

two_pass carries the checkerboard context model's two y streams per image
(anchors, then non-anchors — models/cheng.py): the non-anchor stream's
tables depend on the decoded anchor stream, so they cannot share one rANS
stream.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC = b"DSTC"
VERSION = 1
_HEAD = struct.Struct("<4sBBBB7H")
_IMG = struct.Struct("<4i2I")
_IMG2 = struct.Struct("<4i3I")  # two_pass: adds len_y2

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
    two_pass: bool = False  # checkerboard: y_payloads=anchors, y2=non-anchors
    y2_payloads: list = field(default_factory=list)

    @property
    def num_bytes(self) -> int:
        payload = sum(len(z) + len(y)
                      for z, y in zip(self.z_payloads, self.y_payloads))
        payload += sum(len(p) for p in self.y2_payloads)
        img = _IMG2 if self.two_pass else _IMG
        return _HEAD.size + img.size * len(self.bounds) + payload


def pack_bitstream(bs: Bitstream) -> bytes:
    b, yh, yw, yc = bs.y_shape
    _, zh, zw, zc = bs.z_shape
    flags = (1 if bs.spatial_params else 0) | (2 if bs.two_pass else 0)
    parts = [_HEAD.pack(MAGIC, VERSION, flags, bs.n_states, bs.tail,
                        b, yh, yw, yc, zh, zw, zc)]
    y2 = bs.y2_payloads if bs.two_pass else [b""] * b
    for (zmin, zmax, ymin, ymax), zp, yp, yp2 in zip(
            bs.bounds, bs.z_payloads, bs.y_payloads, y2):
        if bs.two_pass:
            parts.append(_IMG2.pack(zmin, zmax, ymin, ymax,
                                    len(zp), len(yp), len(yp2)))
        else:
            parts.append(_IMG.pack(zmin, zmax, ymin, ymax, len(zp), len(yp)))
    for zp, yp, yp2 in zip(bs.z_payloads, bs.y_payloads, y2):
        parts.append(zp)
        parts.append(yp)
        if bs.two_pass:
            parts.append(yp2)
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
    two_pass = bool(flags & 2)
    img = _IMG2 if two_pass else _IMG
    if len(data) < _HEAD.size + img.size * b:
        raise ValueError("truncated bitstream (image table)")
    off = _HEAD.size
    bounds, lens = [], []
    for _ in range(b):
        rec = img.unpack_from(data, off)
        off += img.size
        bounds.append(rec[:4])
        lens.append(rec[4:] if two_pass else (*rec[4:], 0))
    if off + sum(sum(l) for l in lens) > len(data):
        raise ValueError("truncated bitstream (payloads)")
    z_payloads, y_payloads, y2_payloads = [], [], []
    for lz, ly, ly2 in lens:
        z_payloads.append(data[off:off + lz]); off += lz
        y_payloads.append(data[off:off + ly]); off += ly
        if two_pass:
            y2_payloads.append(data[off:off + ly2]); off += ly2
    if off != len(data):
        raise ValueError("trailing bytes in bitstream")
    return Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                     bounds=bounds, z_payloads=z_payloads,
                     y_payloads=y_payloads, spatial_params=bool(flags & 1),
                     n_states=n_states, tail=tail, two_pass=two_pass,
                     y2_payloads=y2_payloads)
