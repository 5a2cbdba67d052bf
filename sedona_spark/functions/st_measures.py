"""ST_ measure functions over packed rings — pure Column implementations.

Analogs of the reference's ``Functions.java`` measures (``ST_Area``,
``ST_Length``/``ST_Perimeter``, ``ST_Centroid``, ``ST_DistanceSphere``,
``ST_MakeEnvelope``, envelope expand ≅ ``ST_Buffer`` of the envelope).
All are higher-order-function folds over the ``array<double>`` ring —
whole-stage codegen, no Python. A ring is [x0, y0, x1, y1, ...], open or
closed (a closing duplicate vertex contributes zero to every fold).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _n_verts(ring: Column) -> Column:
    return (F.size(ring) / 2).cast("int")


def _vx(ring: Column, i: Column) -> Column:
    return F.element_at(ring, (i * 2 + 1).cast("int"))


def _vy(ring: Column, i: Column) -> Column:
    return F.element_at(ring, (i * 2 + 2).cast("int"))


def _edge_fold(ring: Column, term) -> Column:
    """Σ over edges (i → i+1 mod n) of term(ax, ay, bx, by)."""
    n = _n_verts(ring)
    idx = F.sequence(F.lit(0), n - 1)
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + term(
            _vx(ring, i),
            _vy(ring, i),
            _vx(ring, (i + 1) % n),
            _vy(ring, (i + 1) % n),
        ),
    )


def st_area(ring: Column) -> Column:
    """Unsigned planar polygon area (shoelace). ST_Area analog."""
    signed2 = _edge_fold(ring, lambda ax, ay, bx, by: ax * by - bx * ay)
    return F.abs(signed2) / F.lit(2.0)


def st_perimeter(ring: Column) -> Column:
    """Ring perimeter (ST_Perimeter / ST_Length of the boundary)."""
    return _edge_fold(
        ring,
        lambda ax, ay, bx, by: F.sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay)),
    )


def st_centroid(ring: Column) -> tuple[Column, Column]:
    """Area-weighted polygon centroid (cx, cy). ST_Centroid analog."""
    signed2 = _edge_fold(ring, lambda ax, ay, bx, by: ax * by - bx * ay)
    sx = _edge_fold(
        ring, lambda ax, ay, bx, by: (ax + bx) * (ax * by - bx * ay)
    )
    sy = _edge_fold(
        ring, lambda ax, ay, bx, by: (ay + by) * (ax * by - bx * ay)
    )
    return (sx / (F.lit(3.0) * signed2)).alias("cx"), (
        sy / (F.lit(3.0) * signed2)
    ).alias("cy")


def st_make_envelope(x0: Column, y0: Column, x1: Column, y1: Column) -> Column:
    """Rectangle ring from corners (ST_MakeEnvelope / ST_PolygonFromEnvelope)."""
    return F.array(x0, y0, x1, y0, x1, y1, x0, y1)


def st_expand_envelope(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, d: float
) -> tuple[Column, Column, Column, Column]:
    """Envelope expanded by d — the distance-join rewrite primitive
    (``JoinedGeometry.geometryToExpandedEnvelope``)."""
    dd = F.lit(float(d))
    return xmin - dd, ymin - dd, xmax + dd, ymax + dd


_EARTH_RADIUS_M = 6371008.8  # mean earth radius, same constant family as
# the reference's Haversine (common/.../sphere/Haversine.java)


def st_distance_sphere(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Haversine great-circle distance in meters (ST_DistanceSphere)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(a))
