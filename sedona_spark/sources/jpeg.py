"""Baseline JPEG codec — pure numpy/stdlib, public spec (ITU-T T.81).

The last real external-format seam: the GeoTIFF/PNG/NetCDF/HDF5/ArcGrid
codecs landed earlier; this closes JFIF. Scope is the profile ~all
camera/web JPEGs use:

* decoder: baseline + extended sequential DCT (SOF0/SOF1), 8-bit,
  1- or 3-component, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0
  via nearest-neighbor upsample), multiple DQT/DHT segments, restart
  markers (DRI/RSTn). Progressive (SOF2) and arithmetic coding raise
  ``NotImplementedError`` — the documented seam.
* encoder: SOF0 4:4:4 with the Annex-K example quantization and huffman
  tables (quality-scaled), JFIF APP0 — enough to fixture the decoder
  and to emit real JPEGs other tools read.

Reference capability frame: the reference decodes imagery through
ImageIO/GDAL bindings (``RasterConstructors.java``); this engine keeps
codecs in-process so image bytes never leave the executor.

Fidelity: round trip PSNR ≥ 35 dB at quality 90 on the synthetic image
model (pytest-gated) — above the ≥ 40 dB bar only for smooth content,
as JPEG is lossy by design; the pipeline's PSNR gate applies to the
fjpg canonical codec, not this interop path.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants (ITU-T T.81 Annex K) ---------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QL = np.array([  # K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([  # K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    return ql, qc


def _build_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, values):
    """(bits, values) -> {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1



def _encode_block(bw: _BitWriter, blk: np.ndarray, qt: np.ndarray,
                  dct: dict, act: dict, pred: int) -> int:
    coef = _C @ blk @ _C.T
    q = np.round(coef / qt).astype(np.int64).ravel()[ZIGZAG]
    diff = int(q[0]) - pred
    cat, bits = _magnitude(diff)
    bw.put(*dct[cat])
    if cat:
        bw.put(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for i in range(1, 64):
        v = int(q[i])
        if i > last_nz:
            bw.put(*act[0x00])  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*act[0xF0])  # ZRL
            run -= 16
        cat, bits = _magnitude(v)
        bw.put(*act[(run << 4) | cat])
        bw.put(bits, cat)
        run = 0
    return int(q[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) or (h, w) -> baseline JFIF bytes (SOF0).
    ``subsampling``: '444' or '420' (chroma box-averaged 2×2);
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("jpeg: 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("jpeg: subsampling '444' or '420'")
    sub = 2 if (subsampling == "420" and nc == 3) else 1
    ql, qc = _quality_tables(quality)
    qts = [ql] + ([qc] if nc == 3 else [])

    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [a[..., 0]]

    # sampling factors per component; chroma planes box-averaged
    samp = [(sub, sub)] + [(1, 1)] * (nc - 1)
    mcu_h, mcu_w = 8 * sub, 8 * sub
    mcux, mcuy = -(-w // mcu_w), -(-h // mcu_h)
    padded = []
    for ci, p in enumerate(planes):
        if ci > 0 and sub == 2:
            ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge")
            p = (ph[0::2, 0::2] + ph[0::2, 1::2]
                 + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
        th = mcuy * samp[ci][1] * 8
        tw = mcux * samp[ci][0] * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        padded.append(p - 128.0)

    dc_tabs = [_build_codes(*_DC_L)] + (
        [_build_codes(*_DC_C)] if nc == 3 else [])
    ac_tabs = [_build_codes(*_AC_L)] + (
        [_build_codes(*_AC_C)] if nc == 3 else [])

    bw = _BitWriter()
    pred = [0] * nc
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                while bw.n:
                    bw.put(1, 1)
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            n_mcu += 1
            for ci in range(nc):
                hs, vs = samp[ci]
                t = min(ci, 1)
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, blk, qts[t].reshape(8, 8),
                            dc_tabs[t], ac_tabs[t], pred[ci])
    while bw.n:  # pad final byte with 1s
        bw.put(1, 1)

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    for cls, tid, (bits, vals) in (
            (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)):
        if nc == 1 and tid == 1:
            continue
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        t = min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3F\x00"
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.d):
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: caller handles
                else:
                    return  # EOI / next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.n < k:  # past EOI: pad with zeros (T.81 allows)
            self.acc <<= (k - self.n)
            self.n = k
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bits(1)
            ln += 1
            s = table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("jpeg: bad huffman code")

    def restart(self) -> None:
        """Consume a RSTn marker: byte-align, skip the 2 marker bytes."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.d) and not (
                self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JFIF bytes -> uint8 (h, w, 3) (grayscale replicated to 3)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: no SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = []  # (id, hs, vs, qt_id)
    h = w = 0
    interval = 0
    scan = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2:pos + ln]
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit DQT")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[o + 1:o + 65], dtype=np.uint8).astype(np.int64)
                qts[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), \
                seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: precision != 8")
            comps = [(seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                      seg[7 + 3 * i] & 0x0F, seg[8 + 3 * i])
                     for i in range(nc)]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline/extended sequential (SOF0/SOF1)")
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17:o + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _build_decode(
                    bits, vals)
                o += 17 + nv
        elif marker == 0xDD:
            interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                     seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            pos += ln
            break
        pos += ln
    if scan is None or not comps:
        raise ValueError("jpeg: missing SOS/SOF")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8))

    br = _BitReader(buf[pos:])
    pred = {c[0]: 0 for c in comps}
    sid = {c[0]: (c[1], c[2], c[3]) for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if interval and n_mcu and n_mcu % interval == 0:
                br.restart()
                pred = {c[0]: 0 for c in comps}
            n_mcu += 1
            for cid, td, ta in scan:
                hs, vs, tq = sid[cid]
                for by in range(vs):
                    for bx in range(hs):
                        z = np.zeros(64, dtype=np.int64)
                        cat = br.huff(dc_tabs[td])
                        diff = _extend(br.bits(cat), cat)
                        pred[cid] += diff
                        z[0] = pred[cid]
                        i = 1
                        while i < 64:
                            rs = br.huff(ac_tabs[ta])
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                i += 16
                                continue
                            i += rs >> 4
                            if i > 63:
                                raise ValueError("jpeg: AC overflow")
                            z[i] = _extend(br.bits(rs & 0x0F), rs & 0x0F)
                            i += 1
                        # de-zigzag into natural order, then dequantize
                        dq = np.zeros(64)
                        dq[ZIGZAG] = z
                        dq = dq.reshape(8, 8) * qts[tq]
                        px = _C.T @ dq @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px

    # upsample to full res, crop, color-convert
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs,
                      axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)
