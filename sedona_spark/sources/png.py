"""PNG codec — pure stdlib (zlib + struct), public spec (RFC 2083 /
ISO 15948): 8-bit greyscale/RGB/RGBA, non-interlaced, all five scanline
filters on decode, filter 0 on encode.

Reference capability: ``RS_AsPNG`` (``RasterOutputs.java``, ImageIO).
A real PNG writer needs nothing beyond zlib and CRC32, both stdlib, so
the engine emits genuine PNGs; 16-bit/palette/interlaced variants raise
(the documented external seam)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}    # bands -> PNG color type
_BANDS = {0: 1, 4: 2, 2: 3, 6: 4}         # color type -> bands


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3|4) -> PNG bytes (filter 0 scanlines)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported band count {c} (1, 2, 3 or 4)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, bands). 8-bit non-interlaced only.

    Filter 0 (what :func:`encode_png` writes) and filter 2 (Up) decode
    vectorized; filters 1/3/4 fall back to a per-byte Python loop because
    of their serial left-neighbor dependency — correct for any baseline
    PNG, but large externally-produced Sub/Average/Paeth images decode
    slowly (the engine's own tiles never hit that path)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    o = 8
    w = h = None
    color = bitdepth = interlace = None
    idat = b""
    while o < len(buf):
        ln, tag = struct.unpack_from(">I4s", buf, o)
        payload = buf[o + 8:o + 8 + ln]
        o += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bitdepth != 8 or color not in _BANDS or interlace:
        raise NotImplementedError(
            "only 8-bit gray/RGB/RGBA non-interlaced PNG supported")
    c = _BANDS[color]
    raw = zlib.decompress(idat)
    stride = w * c
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 1:      # Sub
            for x in range(c, stride):
                line[x] = (line[x] + line[x - c]) & 0xFF
        elif f == 2:    # Up
            line = (line.astype(np.int32) + prev) % 256
            line = line.astype(np.uint8)
        elif f == 3:    # Average
            for x in range(stride):
                left = int(line[x - c]) if x >= c else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:    # Paeth
            for x in range(stride):
                left = int(line[x - c]) if x >= c else 0
                ul = int(prev[x - c]) if x >= c else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        elif f != 0:
            raise NotImplementedError(f"PNG filter {f}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, c)
