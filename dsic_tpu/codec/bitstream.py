"""Bitstream container: header + per-image z payload and N y streams.

Capability-equivalent of the reference's compressed dict
(eval_selfcontained_entropy.py:68-74): per-batch shapes, per-image symbol
bounds (min/max with tail), and the per-image byte strings — serialized to
one self-describing byte buffer.

The y plane is carried as ``n_y_streams`` independent rANS streams per
image because conditional entropy models decode in passes whose tables
depend on previously-decoded passes, so the passes cannot share one stream:

* 1 stream — hyperprior-only models (DSIC Student-t, bmshj2018/mbt2018-mean)
* 2 streams — checkerboard context (models/cheng.py): anchors, non-anchors
* K streams — channel-conditional models (models/charm.py): one per slice

Layout (little-endian):
    magic   4s   b"DSTC"
    version u8   3  (v3: f16-wire CDF tables -> tables differ from v2;
                     old streams must fail loudly, not decode garbage)
    flags   u8   bit0: spatial_params
    n_states u8  rANS interleave factor
    tail    u8
    n_y_streams u8
    B, y_h, y_w, y_c, z_h, z_w, z_c   u16 x7
    orig_h, orig_w u16 x2   (0,0 = unknown; single-image files store the
                             pre-padding size so decode can crop)
    per image: zmin, zmax, ymin, ymax  i32 x4;
               len_z u32; len_y[s] u32 x n_y_streams
    payloads per image: z bytes, then y stream 0..S-1, concatenated
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC = b"DSTC"
VERSION = 3
_HEAD = struct.Struct("<4sBBBBB7H2H")

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
    y_streams: list = field(default_factory=list)  # [stream][image] bytes
    spatial_params: bool = False
    n_states: int = 4
    tail: int = 10
    orig_hw: tuple = (0, 0)  # pre-padding image size; (0,0) = unknown

    # --- convenience views ---------------------------------------------------

    @property
    def n_y_streams(self) -> int:
        return len(self.y_streams)

    @property
    def y_payloads(self) -> list:
        """Stream 0 (the only stream for single-pass models)."""
        return self.y_streams[0]

    @property
    def y2_payloads(self) -> list:
        """Stream 1 (the checkerboard non-anchor stream)."""
        return self.y_streams[1]

    @property
    def two_pass(self) -> bool:
        return len(self.y_streams) == 2

    @property
    def num_bytes(self) -> int:
        payload = sum(len(p) for p in self.z_payloads)
        payload += sum(len(p) for s in self.y_streams for p in s)
        img = struct.calcsize(f"<4i{1 + self.n_y_streams}I")
        return _HEAD.size + img * len(self.bounds) + payload


def pack_bitstream(bs: Bitstream) -> bytes:
    b, yh, yw, yc = bs.y_shape
    _, zh, zw, zc = bs.z_shape
    s = bs.n_y_streams
    if not 1 <= s <= 255:
        raise ValueError(f"need 1..255 y streams, have {s}")
    img = struct.Struct(f"<4i{1 + s}I")
    flags = 1 if bs.spatial_params else 0
    parts = [_HEAD.pack(MAGIC, VERSION, flags, bs.n_states, bs.tail, s,
                        b, yh, yw, yc, zh, zw, zc,
                        bs.orig_hw[0], bs.orig_hw[1])]
    for i, (zmin, zmax, ymin, ymax) in enumerate(bs.bounds):
        lens = [len(bs.z_payloads[i])] + [len(st[i]) for st in bs.y_streams]
        parts.append(img.pack(zmin, zmax, ymin, ymax, *lens))
    for i in range(b):
        parts.append(bs.z_payloads[i])
        for st in bs.y_streams:
            parts.append(st[i])
    return b"".join(parts)


def unpack_bitstream(data: bytes) -> Bitstream:
    if len(data) < _HEAD.size:
        raise ValueError("truncated bitstream (no header)")
    (magic, version, flags, n_states, tail, s,
     b, yh, yw, yc, zh, zw, zc, oh, ow) = _HEAD.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("not a DSTC bitstream")
    if version != VERSION:
        raise ValueError(f"unsupported bitstream version {version}")
    if s < 1:
        raise ValueError("bitstream has no y streams")
    img = struct.Struct(f"<4i{1 + s}I")
    if len(data) < _HEAD.size + img.size * b:
        raise ValueError("truncated bitstream (image table)")
    off = _HEAD.size
    bounds, lens = [], []
    for _ in range(b):
        rec = img.unpack_from(data, off)
        off += img.size
        bounds.append(rec[:4])
        lens.append(rec[4:])
    if off + sum(sum(l) for l in lens) > len(data):
        raise ValueError("truncated bitstream (payloads)")
    z_payloads = []
    y_streams: list = [[] for _ in range(s)]
    for rec in lens:
        z_payloads.append(data[off:off + rec[0]]); off += rec[0]
        for k in range(s):
            y_streams[k].append(data[off:off + rec[1 + k]]); off += rec[1 + k]
    if off != len(data):
        raise ValueError("trailing bytes in bitstream")
    return Bitstream(y_shape=(b, yh, yw, yc), z_shape=(b, zh, zw, zc),
                     bounds=bounds, z_payloads=z_payloads,
                     y_streams=y_streams, spatial_params=bool(flags & 1),
                     n_states=n_states, tail=tail, orig_hw=(oh, ow))
