"""ST_GeoHash / neighbors — pure Column bit interleaving + base32.

Reference: ``common/.../Functions.java:743`` (ST_GeoHash via
``GeoHashEncoder``), ``Catalog.scala:189-190``. A geohash of precision p is
5p bits: even bit positions (MSB-first) subdivide longitude, odd subdivide
latitude — equivalently gx = floor((lon+180)/360·2^ceil(5p/2)) interleaved
with gy = floor((lat+90)/180·2^floor(5p/2)), then base32 ("0-9b-z" minus
a,i,l,o) per 5-bit group.

Everything is integer Column arithmetic (whole-stage codegen, no Python)
with an op-for-op ``sql_*`` DuckDB twin for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits(precision: int) -> tuple[int, int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return total, lon_bits, lat_bits


def _grid(lon: Column, lat: Column, precision: int) -> tuple[Column, Column]:
    _, lon_bits, lat_bits = _bits(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    gx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx)))
    gy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny)))
    gx = F.least(F.lit(nx - 1), F.greatest(F.lit(0), gx)).cast("long")
    gy = F.least(F.lit(ny - 1), F.greatest(F.lit(0), gy)).cast("long")
    return gx, gy


def _interleave(gx: Column, gy: Column, precision: int) -> Column:
    """(gx, gy) → 5p-bit geohash integer (MSB-first interleave, lon first)."""
    total, lon_bits, lat_bits = _bits(precision)
    code = F.lit(0).cast("long")
    for j in range(lon_bits):
        bit = F.shiftrightunsigned(gx, lon_bits - 1 - j).bitwiseAND(F.lit(1))
        code = code + bit * F.lit(1 << (total - 1 - 2 * j))
    for j in range(lat_bits):
        bit = F.shiftrightunsigned(gy, lat_bits - 1 - j).bitwiseAND(F.lit(1))
        code = code + bit * F.lit(1 << (total - 1 - (2 * j + 1)))
    return code


def _base32(code: Column, precision: int) -> Column:
    alph = F.array(*[F.lit(c) for c in ALPHABET])
    chars = [
        F.element_at(
            alph,
            (
                F.shiftrightunsigned(code, 5 * (precision - 1 - c)).bitwiseAND(
                    F.lit(31)
                )
                + 1
            ).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def st_geohash(lon: Column, lat: Column, precision: int) -> Column:
    """Geohash string of a point (ST_GeoHash analog)."""
    gx, gy = _grid(lon, lat, precision)
    return _base32(_interleave(gx, gy, precision), precision)


def st_geohash_neighbors(lon: Column, lat: Column, precision: int) -> Column:
    """Sorted array of the 8 neighbor geohashes of the point's cell —
    longitude wraps at the antimeridian, latitude clamps at the poles
    (duplicates at the clamp collapse via array_distinct). The k-ring
    primitive of the geohash family."""
    _, lon_bits, lat_bits = _bits(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    gx, gy = _grid(lon, lat, precision)
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            ngx = F.pmod(gx + F.lit(dx), F.lit(nx))
            ngy = F.least(F.lit(ny - 1), F.greatest(F.lit(0), gy + F.lit(dy)))
            out.append(_base32(_interleave(ngx, ngy, precision), precision))
    home = _base32(_interleave(gx, gy, precision), precision)
    return F.array_sort(
        F.array_distinct(F.filter(F.array(*out), lambda h: h != home))
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins (op-for-op integer arithmetic)
# ---------------------------------------------------------------------------


def _sql_grid(lon_expr: str, lat_expr: str, precision: int) -> tuple[str, str]:
    _, lon_bits, lat_bits = _bits(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    gx = (
        f"least({nx - 1}, greatest(0, cast(floor(({lon_expr} + 180e0) / 360e0 "
        f"* {nx}e0) as bigint)))"
    )
    gy = (
        f"least({ny - 1}, greatest(0, cast(floor(({lat_expr} + 90e0) / 180e0 "
        f"* {ny}e0) as bigint)))"
    )
    return gx, gy


def _sql_interleave(gx_expr: str, gy_expr: str, precision: int) -> str:
    total, lon_bits, lat_bits = _bits(precision)
    terms = []
    for j in range(lon_bits):
        terms.append(
            f"(({gx_expr} >> {lon_bits - 1 - j}) & 1) * {1 << (total - 1 - 2 * j)}"
        )
    for j in range(lat_bits):
        terms.append(
            f"(({gy_expr} >> {lat_bits - 1 - j}) & 1) * "
            f"{1 << (total - 1 - (2 * j + 1))}"
        )
    return "(" + " + ".join(terms) + ")"


def _sql_base32(code_expr: str, precision: int) -> str:
    chars = [
        f"substr('{ALPHABET}', cast((({code_expr} >> {5 * (precision - 1 - c)}) "
        f"& 31) as int) + 1, 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def sql_geohash(lon_expr: str, lat_expr: str, precision: int) -> str:
    """DuckDB mirror of :func:`st_geohash`. Wrap the inputs in a CTE so the
    grid expressions are named columns (keeps the text tractable)."""
    gx, gy = _sql_grid(lon_expr, lat_expr, precision)
    return _sql_base32(_sql_interleave(f"({gx})", f"({gy})", precision), precision)


# ---------------------------------------------------------------------------
# Decode: geohash string → cell bbox / center (ST_GeomFromGeoHash /
# ST_PointFromGeoHash, Catalog.scala ST_GeomFromGeoHash tier). Arrow-batched
# numpy (strings → bit deinterleave → box) — the inverse of st_geohash.
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd

_CHAR_VAL = {c: i for i, c in enumerate(ALPHABET)}


def np_geohash_bbox(hashes) -> np.ndarray:
    """(n, 4) [lon0, lat0, lon1, lat1] per geohash (mixed precisions ok)."""
    out = np.empty((len(hashes), 4), dtype=np.float64)
    for k, h in enumerate(hashes):
        p = len(h)
        total, lon_bits, lat_bits = _bits(p)
        code = 0
        for c in h:
            code = (code << 5) | _CHAR_VAL[c]
        gx = gy = 0
        for b in range(total):  # MSB-first: even bit → lon, odd → lat
            bit = (code >> (total - 1 - b)) & 1
            if b % 2 == 0:
                gx = (gx << 1) | bit
            else:
                gy = (gy << 1) | bit
        wx, wy = 360.0 / (1 << lon_bits), 180.0 / (1 << lat_bits)
        out[k] = (-180.0 + gx * wx, -90.0 + gy * wy,
                  -180.0 + (gx + 1) * wx, -90.0 + (gy + 1) * wy)
    return out


def geohash_bbox_ring(hashes: pd.Series) -> pd.Series:
    """Packed CCW rect ring of each geohash's cell."""
    b = np_geohash_bbox(hashes.to_numpy())
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    rings = np.stack([x0, y0, x1, y0, x1, y1, x0, y1], axis=1)
    return pd.Series(list(rings))


def geohash_center(hashes: pd.Series) -> pd.Series:
    b = np_geohash_bbox(hashes.to_numpy())
    return pd.Series(list(np.stack(
        [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2], axis=1)))


def np_geohash_neighbors(lon, lat, precision: int):
    """Numpy twin of :func:`st_geohash_neighbors` (same wrap/clamp/sort
    conventions) — powers the SQL registration, where a runtime-precision
    Column dispatch would be prohibitively large."""
    total, lon_bits, lat_bits = _bits(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * nx), 0,
                 nx - 1).astype(np.int64)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * ny), 0,
                 ny - 1).astype(np.int64)

    def b32(code: np.ndarray) -> list[str]:
        out = []
        for v in code:
            s = "".join(
                ALPHABET[(int(v) >> (5 * (precision - 1 - c))) & 31]
                for c in range(precision)
            )
            out.append(s)
        return out

    def interleave(ax: np.ndarray, ay: np.ndarray) -> np.ndarray:
        code = np.zeros(len(ax), dtype=np.int64)
        for j in range(lon_bits):
            code |= ((ax >> (lon_bits - 1 - j)) & 1) << (total - 1 - 2 * j)
        for j in range(lat_bits):
            code |= (((ay >> (lat_bits - 1 - j)) & 1)
                     << (total - 1 - (2 * j + 1)))
        return code

    home = b32(interleave(gx, gy))
    cols = [
        b32(interleave((gx + dx) % nx,
                       np.clip(gy + dy, 0, ny - 1)))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    ]
    out = []
    for i in range(len(gx)):
        s = sorted({c[i] for c in cols} - {home[i]})
        out.append(s)
    return out
