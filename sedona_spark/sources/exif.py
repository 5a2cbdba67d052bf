"""EXIF APP1 codec: GPS geotags + ImageDescription inside real JPEG bytes.

The graft's north star is an Iceberg table of *geotagged* image+caption
rows. The reference reads image geotags through external libraries
(GeoTools/ImageIO in ``common/src/main/java/org/apache/sedona/common/raster/
RasterConstructors.java``); this module parses the EXIF APP1 segment
directly — a marker scan over the JFIF container, then a TIFF IFD walk
(both byte orders) into the GPS sub-IFD — so geotag extraction is a
vectorized Arrow-batched pass with no image library.

Layout written by :func:`build_exif_app1` (all offsets computed, never
searched):

    FFE1 <len> "Exif\\0\\0"
      TIFF header (II*\\0 / MM\\0*) at base
      IFD0: ImageDescription (0x010E, ASCII) + GPSInfo pointer (0x8825)
      GPS IFD: VersionID, LatitudeRef/Latitude, LongitudeRef/Longitude
      trailing value area (description bytes, rational arrays)

Geotags are stored as degree-only RATIONALs ``(abs_e7, 10_000_000)`` —
integer-exact both when written and when the DuckDB oracle mirrors the
decode (one IEEE division), sidestepping the D/M/S re-quantization that
would break value-hash equality. D/M/S triples are still *decoded*
(``deg + min/60 + sec/3600``) for interop with real camera files.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EXIF_MAGIC = b"Exif\x00\x00"

_T_DESCRIPTION = 0x010E  # IFD0, ASCII
_T_ORIENTATION = 0x0112  # IFD0, SHORT 1-8 (TIFF/EXIF orientation)
_T_GPS_IFD = 0x8825      # IFD0, LONG pointer to the GPS sub-IFD
_G_VERSION = 0x0000      # BYTE x4
_G_LAT_REF = 0x0001      # ASCII "N"/"S"
_G_LAT = 0x0002          # RATIONAL x3
_G_LON_REF = 0x0003      # ASCII "E"/"W"
_G_LON = 0x0004          # RATIONAL x3

_TY_BYTE, _TY_ASCII, _TY_SHORT, _TY_LONG, _TY_RATIONAL = 1, 2, 3, 4, 5
_TY_SIZE = {_TY_BYTE: 1, _TY_ASCII: 1, _TY_SHORT: 2, _TY_LONG: 4,
            _TY_RATIONAL: 8}

GPS_DEN = 10_000_000  # degree-only rational denominator (1e-7 deg)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def build_exif_app1(lat_e7: int, lon_e7: int,
                    description: str | None = None,
                    orientation: int | None = None) -> bytes:
    """Build a little-endian EXIF APP1 segment carrying a GPS geotag
    (signed 1e-7-degree integers → exact rationals), an optional
    ImageDescription string, and an optional Orientation (tag 0x0112,
    values 1-8). Returns the full FFE1 segment bytes."""
    desc = (description or "").encode("ascii", "replace") + b"\x00"

    # --- IFD0 -------------------------------------------------------------
    n0 = (1 + (description is not None) + (orientation is not None))
    ifd0_off = 8                       # right after the TIFF header
    ifd0_size = 2 + 12 * n0 + 4
    gps_off = ifd0_off + ifd0_size
    n_gps = 5
    gps_size = 2 + 12 * n_gps + 4
    val_off = gps_off + gps_size       # trailing value area

    vals = bytearray()

    def _store(data: bytes) -> int:
        nonlocal vals
        off = val_off + len(vals)
        vals += data
        if len(data) % 2:              # TIFF: word-align value slots
            vals += b"\x00"
        return off

    def _entry(tag: int, typ: int, cnt: int, payload: bytes) -> bytes:
        if len(payload) <= 4:
            return struct.pack("<HHL", tag, typ, cnt) + payload.ljust(4, b"\x00")
        return struct.pack("<HHLL", tag, typ, cnt, _store(payload))

    def _rational3(abs_e7: int) -> bytes:
        # degree-only: (abs_e7 / 1e7, 0/1, 0/1)
        return struct.pack("<6L", abs_e7, GPS_DEN, 0, 1, 0, 1)

    gps_entries = [
        _entry(_G_VERSION, _TY_BYTE, 4, bytes((2, 3, 0, 0))),
        _entry(_G_LAT_REF, _TY_ASCII, 2, (b"S" if lat_e7 < 0 else b"N") + b"\x00"),
        _entry(_G_LAT, _TY_RATIONAL, 3, _rational3(abs(int(lat_e7)))),
        _entry(_G_LON_REF, _TY_ASCII, 2, (b"W" if lon_e7 < 0 else b"E") + b"\x00"),
        _entry(_G_LON, _TY_RATIONAL, 3, _rational3(abs(int(lon_e7)))),
    ]

    ifd0_entries = []
    if description is not None:
        ifd0_entries.append(_entry(_T_DESCRIPTION, _TY_ASCII, len(desc), desc))
    if orientation is not None:
        ifd0_entries.append(_entry(_T_ORIENTATION, _TY_SHORT, 1,
                                   struct.pack("<H", int(orientation))))
    ifd0_entries.append(
        struct.pack("<HHLL", _T_GPS_IFD, _TY_LONG, 1, gps_off))
    # IFD entries must be sorted by tag id (TIFF 6.0 requirement)
    ifd0_entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])

    tiff = bytearray(b"II*\x00" + struct.pack("<L", ifd0_off))
    tiff += struct.pack("<H", n0) + b"".join(ifd0_entries) + b"\x00\x00\x00\x00"
    tiff += struct.pack("<H", n_gps) + b"".join(gps_entries) + b"\x00\x00\x00\x00"
    assert len(tiff) == val_off, (len(tiff), val_off)
    tiff += vals

    payload = _EXIF_MAGIC + bytes(tiff)
    return b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment into JFIF bytes — after the APP0/JFIF
    segment when present (canonical order), else right after SOI."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    if jpeg[2:4] == b"\xFF\xE0":
        pos = 4 + struct.unpack(">H", jpeg[4:6])[0]
    return jpeg[:pos] + app1 + jpeg[pos:]


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _parse_tiff_exif(tiff: bytes):
    """TIFF-structured EXIF payload -> (lat, lon, description)."""
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return None, None, None
    if struct.unpack(bo + "H", tiff[2:4])[0] != 42:
        return None, None, None

    def read_ifd(off: int) -> dict:
        if off + 2 > len(tiff):
            return {}
        n = struct.unpack(bo + "H", tiff[off:off + 2])[0]
        out = {}
        for k in range(n):
            e = off + 2 + 12 * k
            if e + 12 > len(tiff):
                break
            tag, typ, cnt = struct.unpack(bo + "HHL", tiff[e:e + 8])
            size = _TY_SIZE.get(typ, 1) * cnt
            if size <= 4:
                raw = tiff[e + 8:e + 8 + size]
            else:
                voff = struct.unpack(bo + "L", tiff[e + 8:e + 12])[0]
                raw = tiff[voff:voff + size]
            out[tag] = (typ, cnt, raw)
        return out

    ifd0 = read_ifd(struct.unpack(bo + "L", tiff[4:8])[0])

    desc = None
    if _T_DESCRIPTION in ifd0:
        desc = ifd0[_T_DESCRIPTION][2].split(b"\x00", 1)[0].decode(
            "ascii", "replace")

    lat = lon = None
    if _T_GPS_IFD in ifd0:
        typ, cnt, raw = ifd0[_T_GPS_IFD]
        gps = read_ifd(struct.unpack(bo + "L", raw[:4].ljust(4, b"\x00"))[0])

        def angle(tag: int, ref_tag: int, neg: bytes):
            if tag not in gps:
                return None
            _, c, r = gps[tag]
            if c < 1 or len(r) < 8 * c:
                return None
            v = 0.0
            for j, scale in zip(range(min(int(c), 3)), (1.0, 60.0, 3600.0)):
                num, den = struct.unpack(bo + "LL", r[8 * j:8 * j + 8])
                if den == 0:
                    return None
                v += num / den / scale
            ref = gps.get(ref_tag, (0, 0, b""))[2][:1]
            return -v if ref == neg else v

        lat = angle(_G_LAT, _G_LAT_REF, b"S")
        lon = angle(_G_LON, _G_LON_REF, b"W")
    return lat, lon, desc


def extract_exif(jpeg: bytes):
    """JPEG bytes -> (lat, lon, description); Nones when absent.
    Marker scan stops at SOS — EXIF lives in the header segments only."""
    if jpeg[:2] != b"\xFF\xD8":
        return None, None, None
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xDA or marker == 0xD9:   # SOS / EOI
            break
        if marker == 0xFF:                     # fill byte (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2                           # standalone TEM/RST, no length
            continue
        seglen = struct.unpack(">H", jpeg[pos + 2:pos + 4])[0]
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == _EXIF_MAGIC:
            return _parse_tiff_exif(jpeg[pos + 10:pos + 2 + seglen])
        pos += 2 + seglen
    return None, None, None


def exif_orientation(jpeg: bytes) -> int:
    """TIFF/EXIF Orientation (tag 0x0112) from the APP1 segment; 1
    (upright) when absent — the value every viewer assumes."""
    if jpeg[:2] != b"\xff\xd8":
        return 1
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xDA or marker == 0xD9:
            break
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", jpeg[pos + 2:pos + 4])[0]
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == _EXIF_MAGIC:
            tiff = jpeg[pos + 10:pos + 2 + seglen]
            if tiff[:2] == b"II":
                bo = "<"
            elif tiff[:2] == b"MM":
                bo = ">"
            else:
                return 1
            try:
                off = struct.unpack(bo + "L", tiff[4:8])[0]
                n = struct.unpack(bo + "H", tiff[off:off + 2])[0]
                for k in range(n):
                    e = off + 2 + 12 * k
                    tag, typ, _cnt = struct.unpack(bo + "HHL",
                                                   tiff[e:e + 8])
                    if tag == _T_ORIENTATION and typ == _TY_SHORT:
                        v = struct.unpack(bo + "H", tiff[e + 8:e + 10])[0]
                        return v if 1 <= v <= 8 else 1
            except struct.error:
                return 1
            return 1
        pos += 2 + seglen
    return 1


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Upright a decoded (h, w, c) array per the EXIF orientation value
    (the transform a viewer applies so the image displays correctly):
    1=identity, 2=flip-H, 3=rot180, 4=flip-V, 5=transpose,
    6=rot90 CW, 7=transverse, 8=rot90 CCW."""
    o = int(orientation)
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    if o == 5:
        return np.swapaxes(arr, 0, 1)
    if o == 6:
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if o == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.swapaxes(arr, 0, 1)[::-1, :]
    return arr


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def _exif_struct():
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType)

    return StructType([
        StructField("exif_lat", DoubleType()),
        StructField("exif_lon", DoubleType()),
        StructField("description", StringType()),
    ])


def _exif_batch(b: pd.Series) -> pd.DataFrame:
    lats, lons, descs = [], [], []
    for buf in b:
        # NULL bytes (failed download) → all-NULL row, never a crash
        la, lo, de = ((None, None, None) if buf is None
                      else extract_exif(bytes(buf)))
        lats.append(la)
        lons.append(lo)
        descs.append(de)
    # nullable Float64 extension arrays: a missing geotag must reach
    # Spark as NULL (filterable, aggregate-safe), never as NaN
    return pd.DataFrame(
        {"exif_lat": pd.array(lats, dtype="Float64"),
         "exif_lon": pd.array(lons, dtype="Float64"),
         "description": descs})


def _make_exif_udf():
    return pandas_udf(_exif_batch, _exif_struct())


_exif_udf = _make_exif_udf()  # shared by with_exif and the SQL spelling


def with_exif(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add ``exif_lat`` / ``exif_lon`` / ``description`` columns decoded
    from the JPEG bytes. One Arrow-batched pass; no shuffle — at 100 TB
    this pipelines with the scan (narrow map stage).
    (SQL spelling: ``RS_Exif(bytes)`` → struct.)"""
    e = _exif_udf(F.col(bytes_col))
    return (df.withColumn("_e", e)
              .withColumn("exif_lat", F.col("_e.exif_lat"))
              .withColumn("exif_lon", F.col("_e.exif_lon"))
              .withColumn("description", F.col("_e.description"))
              .drop("_e"))


# ---------------------------------------------------------------------------
# deterministic fixture: real JFIF bytes + APP1 geotags keyed on `part`
# ---------------------------------------------------------------------------


def geotag_e7(i: int) -> tuple[int, int]:
    """Signed 1e-7-degree integers for fixture id ``i`` — the images
    lattice geotag (sources/images.py ``_geotag``) re-centered onto the
    world domain: lat in ±50, lon in ±100, exact in int64."""
    gx = (i * 2654435761) % 1000
    gy = (i * 2246822519) % 1000
    lon_e7 = gx * 2_000_000 + 1_000_000 - 1_000_000_000
    lat_e7 = gy * 1_000_000 + 500_000 - 500_000_000
    return lat_e7, lon_e7


def _exif_rows_for_ids(ids: np.ndarray) -> pd.DataFrame:
    from sedona_spark.sources.images import _caption, make_pixels
    from sedona_spark.sources.jpeg import encode_jpeg

    recs = []
    for i in map(int, ids):
        arr = make_pixels(i, 16, 16)
        lat_e7, lon_e7 = geotag_e7(i)
        buf = inject_app1(
            encode_jpeg(arr, quality=90),
            build_exif_app1(lat_e7, lon_e7, _caption(i)))
        recs.append((f"img_{i:012d}", buf, _caption(i)))
    return pd.DataFrame(recs, columns=["image_id", "bytes", "caption"])


def exif_jpegs_from_part(spark, sf_dir: str,
                         id_mod: int | None = None) -> DataFrame:
    """Geotagged real-JFIF fixture keyed off the driver ``part`` table
    (same posture as ``images_from_part``: prune ids before the
    CPU-heavy encode, spread across the cluster first)."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    from sedona_spark.sources.images import keyed_fixture_table

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("caption", StringType()),
    ])
    return keyed_fixture_table(
        spark, _exif_rows_for_ids, schema, sf_dir=sf_dir, id_mod=id_mod)
