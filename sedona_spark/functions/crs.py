"""CRS handling: ST_Transform (EPSG:4326 ↔ EPSG:3857) + join-time checks.

Reference: ``FunctionsGeoTools.java`` (ST_Transform via proj), and the
join-time CRS verification in ``JoinQuery.java:51-66`` (two RDDs joined
with mismatched CRS raise). This engine implements the spherical-Mercator
pair as pure Column math (the projection every web-tile pipeline needs) and
a lightweight CRS tag carried in column metadata; projections beyond 3857
are a documented seam (no proj library in this sandbox).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_R = 6378137.0  # WGS84 semi-major axis (spherical Mercator, EPSG:3857)
_RAD = math.pi / 180.0
_QPI = math.pi / 4.0


def st_transform_to_mercator(lon: Column, lat: Column) -> tuple[Column, Column]:
    """EPSG:4326 (lon, lat degrees) → EPSG:3857 meters (x, y).

    x = R·λ,  y = R·ln(tan(π/4 + φ/2)). Latitude is clamped to the Web
    Mercator validity band ±85.05112878° like every tile engine."""
    lat_c = F.least(F.lit(85.05112878), F.greatest(F.lit(-85.05112878), lat))
    x = F.lit(_R) * (lon * F.lit(_RAD))
    y = F.lit(_R) * F.log(F.tan(F.lit(_QPI) + lat_c * F.lit(_RAD) / 2))
    return x, y


def st_transform_from_mercator(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3857 meters → EPSG:4326 degrees (exact inverse of the forward
    map: φ = 2·atan(exp(y/R)) − π/2)."""
    lon = (x / F.lit(_R)) / F.lit(_RAD)
    lat = (F.lit(2.0) * F.atan(F.exp(y / F.lit(_R))) - F.lit(math.pi / 2.0)) / F.lit(
        _RAD
    )
    return lon, lat


def sql_to_mercator(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`st_transform_to_mercator` (op-for-op)."""
    lat_c = f"least(85.05112878e0, greatest(-85.05112878e0, {lat_expr}))"
    x = f"{_R!r} * ({lon_expr} * {_RAD!r})"
    y = f"{_R!r} * ln(tan({_QPI!r} + {lat_c} * {_RAD!r} / 2))"
    return x, y


# ---------------------------------------------------------------------------
# CRS tags (join-time verification, JoinQuery.java:51-66 analog)
# ---------------------------------------------------------------------------


def tag_crs(df: DataFrame, crs: str, cols: tuple[str, ...]) -> DataFrame:
    """Attach a CRS tag to the named coordinate columns (column metadata —
    survives projections/joins that keep the column)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c).alias(c, metadata={"crs": crs}))
    return out


def get_crs(df: DataFrame, col: str) -> str | None:
    md = df.schema[col].metadata
    return md.get("crs") if md else None


def require_same_crs(left: DataFrame, lcol: str, right: DataFrame, rcol: str) -> None:
    """Raise if both sides carry CRS tags and they differ — the reference's
    pre-join CRS check. Untagged columns pass (opt-in, like the reference's
    default CheckingCRS=false path)."""
    a, b = get_crs(left, lcol), get_crs(right, rcol)
    if a is not None and b is not None and a != b:
        raise ValueError(
            f"CRS mismatch: left {lcol!r} is {a}, right {rcol!r} is {b}; "
            "ST_Transform one side first"
        )
