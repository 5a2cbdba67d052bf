"""BMP (Windows DIB) codec: 24/32-bit BI_RGB, stdlib only.

The same bottom-up BGR DIB layout the AVI 'raw' codec already decodes
(``sources/video.py``), wrapped in the BITMAPFILEHEADER container —
the remaining everyday raster interchange format after JPEG/PNG/GIF/
TIFF. Palette, RLE, and compression variants raise the documented
external-library seam.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → 24-bit BI_RGB BMP bytes (bottom-up rows, BGR,
    4-byte row padding per the published BITMAPINFOHEADER layout)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    h, w, c = a.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    payload = rows.tobytes()
    off = 14 + 40
    head = (b"BM" + struct.pack("<IHHI", off + len(payload), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(payload), 2835, 2835, 0, 0))
    return head + payload


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3). 24/32-bit BI_RGB, bottom-up or
    top-down (negative height); anything else raises the seam."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP requires a library")
    w, h, _planes, bpp, comp = struct.unpack_from("<iiHHI", buf, 18)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp} requires an image library")
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    need = off + stride * h
    if len(buf) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf[off:need], dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
