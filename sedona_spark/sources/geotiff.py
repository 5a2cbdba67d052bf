"""GeoTIFF codec — pure stdlib, public spec (TIFF 6.0 + GeoTIFF 1.1:
baseline IFD, chunky RGB/gray strips AND tiles; georeference via
ModelPixelScaleTag 33550 + ModelTiepointTag 33922 and the EPSG code via
GeoKeyDirectoryTag 34735 / GeographicTypeGeoKey 2048 or
ProjectedCSTypeGeoKey 3072).

Reference capability: ``RS_FromGeoTiff`` / ``RS_AsGeoTiff``
(``RasterConstructors.java:68`` / ``RasterOutputs.java``, ImageIO-backed
there). Decode accepts Compression 1 (none), 5 (LZW), 7 (new-style JPEG
via ``sources/jpeg.py``, incl. shared JPEGTables), 8/32946 (DEFLATE,
Predictor 2), 32773 (PackBits RLE), classic and BigTIFF containers,
strip or tile layouts;
encode emits uncompressed, deflate+predictor, or JPEG single-strip. The
remaining seam (old-style JPEG, non-8-bit samples, planar config 2)
raises with a clear message instead of guessing.

Layout written by :func:`encode_geotiff` (and accepted, among other
baseline layouts, by :func:`decode_geotiff`): little-endian, one strip,
uint8 samples, band-interleaved-by-pixel.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids (public constants)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTE_COUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_GEO_KEYS = 34735

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12

_TYPE_LONG8 = 16
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8, 16: 8, 17: 8, 18: 8}

_GK_MODEL_TYPE = 1024          # 1=projected, 2=geographic
_GK_RASTER_TYPE = 1025         # 1=PixelIsArea
_GK_GEOGRAPHIC_TYPE = 2048
_GK_PROJECTED_CS_TYPE = 3072


def encode_geotiff(
    arr: np.ndarray,
    ulx: float = 0.0,
    uly: float = 0.0,
    sx: float = 1.0,
    sy: float = -1.0,
    srid: int = 4326,
    compress: str | None = None,
) -> bytes:
    """uint8 (h, w, bands) + north-up georeference -> GeoTIFF bytes
    (little-endian, single strip, chunky). ``compress="deflate"`` writes
    Compression=8 with horizontal Predictor=2 (the layout most real
    GeoTIFFs in the wild use); the default stays uncompressed
    Compression=1."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nb = a.shape
    if compress is None:
        pix = a.tobytes()
        comp_id, predictor = 1, None
    elif compress == "deflate":
        # predictor 2: per row, per band, horizontal byte differencing
        # (uint8 wraparound), THEN zlib over the strip
        d = a.astype(np.int16)
        d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
        pix = zlib.compress((d & 0xFF).astype(np.uint8).tobytes(), 6)
        comp_id, predictor = 8, 2
    elif compress == "jpeg":
        # Compression=7 (new-style JPEG, TIFF TechNote 2): the strip is
        # a complete JFIF stream from the stdlib baseline codec
        from sedona_spark.sources.jpeg import encode_jpeg

        pix = encode_jpeg(a[:, :, 0] if nb == 1 else a, quality=95)
        comp_id, predictor = 7, None
    elif compress == "packbits":
        # TIFF 6.0 §9: writers must pack each row separately (runs may
        # not span rows) so row-at-a-time readers stay in sync
        rows = a.reshape(h, w * nb)
        pix = b"".join(_packbits_encode(rows[r].tobytes())
                       for r in range(h))
        comp_id, predictor = 32773, None
    else:
        raise ValueError(f"unknown compress mode {compress!r}")

    geographic = srid == 4326 or 4000 <= srid < 5000
    geo_keys = [
        (_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
        (_GK_RASTER_TYPE, 0, 1, 1),
        (_GK_GEOGRAPHIC_TYPE if geographic else _GK_PROJECTED_CS_TYPE,
         0, 1, int(srid)),
    ]
    gk = struct.pack("<4H", 1, 1, 0, len(geo_keys))
    for kid, loc, cnt, val in geo_keys:
        gk += struct.pack("<4H", kid, loc, cnt, val)
    scale = struct.pack("<3d", abs(float(sx)), abs(float(sy)), 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0,
                           float(ulx), float(uly), 0.0)

    entries: list[tuple[int, int, int, bytes | int]] = [
        (_T_WIDTH, _TYPE_LONG, 1, w),
        (_T_HEIGHT, _TYPE_LONG, 1, h),
        (_T_BITS, _TYPE_SHORT, nb,
         struct.pack(f"<{nb}H", *([8] * nb)) if nb > 2 else
         int.from_bytes(struct.pack(f"<{nb}H", *([8] * nb)).ljust(4, b"\0"),
                        "little")),
        (_T_COMPRESSION, _TYPE_SHORT, 1, comp_id),
        (_T_PHOTOMETRIC, _TYPE_SHORT, 1,
         (6 if compress == "jpeg" else 2) if nb >= 3 else 1),
        (_T_STRIP_OFFSETS, _TYPE_LONG, 1, None),      # patched below
        (_T_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, nb),
        (_T_ROWS_PER_STRIP, _TYPE_LONG, 1, h),
        (_T_STRIP_BYTE_COUNTS, _TYPE_LONG, 1, len(pix)),
        (_T_PLANAR, _TYPE_SHORT, 1, 1),
        *([(_T_PREDICTOR, _TYPE_SHORT, 1, predictor)]
          if predictor else []),
        (_T_SAMPLE_FORMAT, _TYPE_SHORT, nb,
         struct.pack(f"<{nb}H", *([1] * nb)) if nb > 2 else
         int.from_bytes(struct.pack(f"<{nb}H", *([1] * nb)).ljust(4, b"\0"),
                        "little")),
        (_T_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale),
        (_T_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, tiepoint),
        (_T_GEO_KEYS, _TYPE_SHORT, len(gk) // 2, gk),
    ]
    # layout: header(8) | IFD | out-of-line values | pixel strip
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size
    blobs = []
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if isinstance(val, bytes) and len(val) > 4:
            blobs.append((i, val))
    blob_pos = {}
    off = data_off
    for i, b in blobs:
        blob_pos[i] = off
        off += len(b)
    strip_off = off

    out = bytearray(struct.pack("<2sHL", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if tag == _T_STRIP_OFFSETS:
            v = struct.pack("<L", strip_off)
        elif isinstance(val, bytes):
            if len(val) > 4:
                v = struct.pack("<L", blob_pos[i])
            else:
                v = val.ljust(4, b"\0")
        elif typ == _TYPE_SHORT and cnt == 1:
            v = struct.pack("<HH", int(val), 0)
        else:
            v = struct.pack("<L", int(val))
        out += struct.pack("<HHL", tag, typ, cnt) + v
    out += struct.pack("<L", 0)  # no next IFD
    for _, b in blobs:
        out += b
    out += pix
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits RLE encode (TIFF spec §9): repeat runs ≥3 become
    (257-n, byte); everything else rides as literal runs ≤128."""
    out = bytearray()
    i = 0
    L = len(data)
    while i < L:
        # measure the repeat run at i
        j = i + 1
        while j < L and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run: until the next ≥3 repeat or 128 bytes
        k = i
        while k < L and k - i < 128:
            if k + 2 < L and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF spec §9 / Compression=32773): control byte
    n in 0..127 → copy n+1 literals; n in -127..-1 → repeat the next
    byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    L = len(data)
    while i < L:
        n = data[i]
        i += 1
        if n < 128:                      # literal run
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                    # repeat run (two's complement)
            if i < L:
                out += bytes([data[i]]) * (257 - n)
                i += 1
        # n == 128: no-op
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit packing, ClearCode=256, EOI=257,
    early code-width change — TIFF 6.0 §13). Decode-only: the engine
    never EMITS LZW (deflate is the compressed emit path), but real-world
    GeoTIFFs frequently arrive LZW-compressed."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:  # ClearCode
                reset()
                prev = None
                continue
            if code == 257:  # EndOfInformation
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # TIFF's "early change": the decoder lags the encoder's table
            # by one add, so it must widen one code EARLY (libtiff's
            # maxcode = (1 << bits) - 1 convention)
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def decode_geotiff(buf: bytes):
    """GeoTIFF bytes -> (uint8 (h, w, bands), ulx, uly, sx, sy, srid).
    Classic and BigTIFF containers; uncompressed, DEFLATE (+predictor 2)
    and LZW strips; uint8 samples only — the remaining tail (JPEG
    compression, tiled layout, non-8-bit samples) raises as the
    documented external seam."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic = struct.unpack(bo + "H", buf[2:4])[0]
    if magic == 42:
        big = False
        ifd_off = struct.unpack(bo + "L", buf[4:8])[0]
    elif magic == 43:
        # BigTIFF (version 43): 8-byte offsets throughout — header is
        # (bytesize=8, pad=0, uint64 first-IFD offset), IFDs carry a
        # uint64 entry count and 20-byte entries with 8-byte
        # count/value slots; types 16/17/18 are (S)LONG8/IFD8
        big = True
        osize, pad = struct.unpack(bo + "HH", buf[4:8])
        if osize != 8 or pad != 0:
            raise ValueError("malformed BigTIFF header")
        ifd_off = struct.unpack(bo + "Q", buf[8:16])[0]
    else:
        raise NotImplementedError(f"unknown TIFF version {magic}")
    if big:
        n = struct.unpack(bo + "Q", buf[ifd_off:ifd_off + 8])[0]
        head, entry, inline = 8, 20, 8
    else:
        n = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])[0]
        head, entry, inline = 2, 12, 4
    tags = {}
    for i in range(n):
        e = ifd_off + head + entry * i
        tag, typ = struct.unpack(bo + "HH", buf[e:e + 4])
        cnt = struct.unpack(bo + ("Q" if big else "L"),
                            buf[e + 4:e + 4 + inline])[0]
        vslot = e + 4 + inline
        size = _TYPE_SIZE.get(typ, 1) * cnt
        raw = buf[vslot:vslot + inline]
        if size > inline:
            off = struct.unpack(bo + ("Q" if big else "L"), raw)[0]
            raw = buf[off:off + size]
        else:
            raw = raw[:size]
        if typ == _TYPE_SHORT:
            vals = struct.unpack(bo + f"{cnt}H", raw)
        elif typ == _TYPE_LONG:
            vals = struct.unpack(bo + f"{cnt}L", raw)
        elif typ == _TYPE_LONG8:
            vals = struct.unpack(bo + f"{cnt}Q", raw)
        elif typ == _TYPE_DOUBLE:
            vals = struct.unpack(bo + f"{cnt}d", raw)
        else:
            vals = (raw,)
        tags[tag] = vals
    w = int(tags[_T_WIDTH][0])
    h = int(tags[_T_HEIGHT][0])
    nb = int(tags.get(_T_SAMPLES_PER_PIXEL, (1,))[0])
    comp = int(tags.get(_T_COMPRESSION, (1,))[0])
    # 5 = LZW, 7 = new-style JPEG, 8 = deflate, 32946 = legacy deflate,
    # 32773 = PackBits (the Macintosh RLE legacy TIFFs carry)
    if comp not in (1, 5, 7, 8, 32946, 32773):
        raise NotImplementedError(
            "only uncompressed, LZW, JPEG, DEFLATE and PackBits GeoTIFF "
            f"supported (Compression={comp} requires an image library)")
    if any(b != 8 for b in tags.get(_T_BITS, (8,))):
        raise NotImplementedError("only 8-bit samples supported")
    # SampleFormat (tag 339): anything but unsigned int would decode to
    # wrong values if read as uint8 — raise like the other variants
    if any(f != 1 for f in tags.get(_T_SAMPLE_FORMAT, (1,))):
        raise NotImplementedError(
            "only unsigned-int samples supported (SampleFormat="
            f"{tags[_T_SAMPLE_FORMAT]})")
    if int(tags.get(_T_PLANAR, (1,))[0]) != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    predictor = int(tags.get(_T_PREDICTOR, (1,))[0])
    if predictor not in (1, 2):
        raise NotImplementedError(f"Predictor={predictor} not supported")
    inflate = (lambda b: b) if comp in (1, 7) else \
        (_lzw_decode if comp == 5
         else _packbits_decode if comp == 32773
         else zlib.decompress)

    def jpeg_chunk(raw: bytes) -> np.ndarray:
        """One Compression=7 strip/tile -> (rows, cols, nb). Abbreviated
        streams (TIFF TechNote 2) carry shared tables in the JPEGTables
        tag (347): splice its table segments after the chunk's SOI."""
        from sedona_spark.sources.jpeg import decode_jpeg

        jt = tags.get(347)
        if jt:
            tbl = bytes(jt[0]) if isinstance(jt[0], (bytes, bytearray)) \
                else bytes(jt)
            if len(tbl) > 4 and raw[2:4] not in (b"\xff\xdb",):
                raw = raw[:2] + tbl[2:-2] + raw[2:]
        out = decode_jpeg(bytes(raw))
        return out[:, :, :nb] if nb < 3 else out

    def unpredict(sa):
        if predictor == 2:
            # undo horizontal differencing: cumulative sum across the
            # row per band, uint8 wraparound
            return np.cumsum(sa.astype(np.uint32), axis=1).astype(np.uint8)
        return sa

    if _T_TILE_OFFSETS in tags:
        # tiled layout (TIFF 6.0 §15): fixed tw×tl tiles in row-major
        # order, right/bottom edge tiles padded to full tile size
        tw = int(tags[_T_TILE_WIDTH][0])
        tl = int(tags[_T_TILE_LENGTH][0])
        offsets = tags[_T_TILE_OFFSETS]
        counts = tags.get(_T_TILE_BYTE_COUNTS,
                          (tw * tl * nb,) * len(offsets))
        ntx = (w + tw - 1) // tw
        arr = np.zeros((h, w, nb), dtype=np.uint8)
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            raw = inflate(buf[o:o + c])
            if comp == 7:
                ta = jpeg_chunk(raw)
                pad_y, pad_x = tl - ta.shape[0], tw - ta.shape[1]
                if pad_y or pad_x:
                    ta = np.pad(ta, ((0, pad_y), (0, pad_x), (0, 0)),
                                mode="edge")
            else:
                ta = unpredict(np.frombuffer(raw, dtype=np.uint8)[
                    : tw * tl * nb].reshape(tl, tw, nb))
            ty, tx = divmod(ti, ntx)
            y0, x0 = ty * tl, tx * tw
            ch, cw = min(tl, h - y0), min(tw, w - x0)
            arr[y0:y0 + ch, x0:x0 + cw] = ta[:ch, :cw]
    else:
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags.get(_T_STRIP_BYTE_COUNTS, (w * h * nb,))
        rps = int(tags.get(_T_ROWS_PER_STRIP, (h,))[0])
        if comp == 1:
            pix = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
            arr = np.frombuffer(pix, dtype=np.uint8)[: w * h * nb].reshape(
                h, w, nb)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(
                    np.uint8)
        elif comp == 7:
            rows = []
            for si, (o, c) in enumerate(zip(offsets, counts)):
                nrows = min(rps, h - si * rps)
                rows.append(jpeg_chunk(buf[o:o + c])[:nrows, :w])
            arr = np.concatenate(rows, axis=0)
        else:
            strips = [inflate(buf[o:o + c]) for o, c in zip(offsets, counts)]
            rows = []
            for si, raw in enumerate(strips):
                nrows = min(rps, h - si * rps)
                rows.append(unpredict(np.frombuffer(raw, dtype=np.uint8)[
                    : nrows * w * nb].reshape(nrows, w, nb)))
            arr = np.concatenate(rows, axis=0)
    sx, sy = 1.0, -1.0
    if _T_MODEL_PIXEL_SCALE in tags:
        s = tags[_T_MODEL_PIXEL_SCALE]
        sx, sy = float(s[0]), -abs(float(s[1]))
    ulx = uly = 0.0
    if _T_MODEL_TIEPOINT in tags:
        t = tags[_T_MODEL_TIEPOINT]
        # world coords of raster point (t0, t1): upper-left anchor
        ulx = float(t[3]) - float(t[0]) * sx
        uly = float(t[4]) - float(t[1]) * sy
    srid = 0
    if _T_GEO_KEYS in tags:
        gk = tags[_T_GEO_KEYS]
        nk = gk[3]
        for k in range(nk):
            kid, loc, cnt, val = gk[4 + 4 * k:8 + 4 * k]
            if kid in (_GK_GEOGRAPHIC_TYPE, _GK_PROJECTED_CS_TYPE) \
                    and loc == 0:
                srid = int(val)
    return arr.copy(), ulx, uly, sx, sy, srid
