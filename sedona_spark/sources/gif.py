"""GIF87a/89a codec: stdlib LZW decode + uncompressed-style encode.

Web corpora carry GIFs alongside JPEG/PNG; the reference reads them
through ImageIO (``common/src/main/java/org/apache/sedona/common/raster/
RasterConstructors.java``). This module implements the published GIF
spec directly so the image tier needs no external library:

* :func:`decode_gif` — full variable-width LZW decompression (clear/end
  codes, 12-bit cap), global + local color tables, interlaced row
  order, 89a extension blocks skipped structurally. Returns the FIRST
  frame as uint8 (h, w, 3); :func:`decode_gif_frames` returns every
  frame's raw pixels without disposal compositing (animated-GIF
  compositing is a documented seam — training pipelines almost always
  want frame extraction, not playback state).
* :func:`encode_gif` — the classic patent-free "uncompressed" LZW
  writer: 8-bit root codes emitted at 9-bit width with a CLEAR every
  254 codes so the width never grows. Byte-exact decodable by any
  conforming reader, and by :func:`decode_gif`.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_color_table(buf: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    if len(buf) < pos + 3 * n:
        raise ValueError("GIF: truncated color table")
    tbl = np.frombuffer(buf[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    return tbl, pos + 3 * n


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos:pos + n]
        if len(buf) < pos + n:
            raise ValueError("GIF: truncated sub-block")
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader, LSB first
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return end  # ran off the stream: treat as end
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0:byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    def reset_table():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF: pixel data ended early")
    return out


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.int64)
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    for src, dst in enumerate(order):
        rows[dst] = src
    return idx.reshape(h, w)[rows].reshape(-1)


def decode_gif_frames(buf: bytes) -> list[np.ndarray]:
    """GIF bytes → list of uint8 (h, w, 3) frames (raw per-frame pixels,
    frame rectangle placed on the logical screen, no disposal
    compositing between frames)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(buf, pos, 2 << (flags & 7))

    frames: list[np.ndarray] = []
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    while pos < len(buf):
        intro = buf[pos]
        pos += 1
        if intro == _TRAILER:
            break
        if intro == _EXTENSION:
            pos += 1  # label
            _, pos = _read_subblocks(buf, pos)
            continue
        if intro != _IMAGE_SEP:
            raise ValueError(f"GIF: unexpected block 0x{intro:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            ct, pos = _read_color_table(buf, pos, 2 << (iflags & 7))
        if ct is None:
            raise ValueError("GIF: image without any color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = _lzw_decode(data, min_code, w * h)
        if iflags & 0x40:
            idx = _deinterlace(idx, w, h)
        rgb = ct[np.minimum(idx, len(ct) - 1)].reshape(h, w, 3)
        frame = screen.copy()
        # clip rects that overhang the logical screen (real-world GIFs
        # do this; browsers clip rather than reject)
        ch, cw = min(h, sh - y), min(w, sw - x)
        if ch > 0 and cw > 0:
            frame[y:y + ch, x:x + cw] = rgb[:ch, :cw]
        frames.append(frame)
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame as uint8 (h, w, 3)."""
    return decode_gif_frames(buf)[0]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Palette-indexed uint8 (h, w) + (n≤256, 3) palette → GIF89a bytes
    (non-interlaced, single frame, uncompressed-style LZW: 9-bit codes,
    CLEAR every 254 roots — valid for every conforming decoder)."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)

    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    head += pal.tobytes()
    head += bytes([_IMAGE_SEP]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
    head += bytes([8])  # LZW minimum code size

    clear, end = 256, 257
    flat = idx.reshape(-1).astype(np.uint16)
    # CLEAR before every 254-pixel chunk keeps the table small and the
    # code width pinned at 9 — assembled chunk-wise, no per-pixel loop
    chunks: list[np.ndarray] = []
    for i in range(0, max(len(flat), 1), 254):
        chunks.append(np.array([clear], dtype=np.uint16))
        chunks.append(flat[i:i + 254])
    chunks.append(np.array([end], dtype=np.uint16))
    codes = np.concatenate(chunks)

    # vectorized 9-bit LSB-first packing: 8 codes -> 9 bytes
    n = len(codes)
    pad = (-n) % 8
    c = np.concatenate([codes, np.zeros(pad, dtype=np.uint16)])
    c = c.reshape(-1, 8).astype(np.uint32)
    g = np.empty((c.shape[0], 9), dtype=np.uint8)
    g[:, 0] = c[:, 0] & 0xFF
    for k in range(1, 8):
        g[:, k] = ((c[:, k - 1] >> (9 - k)) | (c[:, k] << k)) & 0xFF
    g[:, 8] = (c[:, 7] >> 1) & 0xFF
    bits = g.reshape(-1)[: (9 * n + 7) // 8].tobytes()

    body = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        body += bytes([len(chunk)]) + chunk
    body += b"\x00"
    return head + bytes(body) + bytes([_TRAILER])


# ---------------------------------------------------------------------------
# deterministic fixture: palette GIFs keyed on `part` (oracle-mirrorable)
# ---------------------------------------------------------------------------

GIF_W, GIF_H = 24, 18


def gif_palette() -> np.ndarray:
    """Fixed 256-color palette, closed-form per index (mirrored in SQL)."""
    j = np.arange(256, dtype=np.int64)
    return np.stack([(j * 31 + 5) % 256, (j * 59 + 7) % 256,
                     (j * 83 + 11) % 256], axis=1).astype(np.uint8)


def gif_indices(i: int, w: int = GIF_W, h: int = GIF_H) -> np.ndarray:
    """Palette-index plane for image id ``i`` (mirrored in SQL)."""
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    return ((i * 7 + xs * 3 + ys * 11) % 256).astype(np.uint8)


def gifs_from_part(spark, sf_dir: str, id_mod: int | None = None):
    """Deterministic palette-GIF table keyed off the driver ``part``
    table (same scaffold as the JPEG/EXIF fixtures)."""
    import pandas as pd
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    from sedona_spark.sources.images import keyed_fixture_table

    pal = gif_palette()

    def rows(ids) -> "pd.DataFrame":
        recs = [(f"img_{int(i):012d}", encode_gif(gif_indices(int(i)), pal))
                for i in ids]
        return pd.DataFrame(recs, columns=["image_id", "bytes"])

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
    ])
    return keyed_fixture_table(spark, rows, schema, sf_dir=sf_dir,
                               id_mod=id_mod)
