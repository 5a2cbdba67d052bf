"""ST_* accessor / editor functions over packed rings — pure Column.

The accessor block of the reference catalog (``Functions.java`` /
``Catalog.scala``): ST_NPoints, ST_X/Y, ST_PointN, ST_StartPoint,
ST_EndPoint, ST_IsClosed, ST_Reverse, ST_ExteriorRing, ST_NumGeometries,
ST_Azimuth, ST_AddPoint, ST_RemovePoint, ST_FlipCoordinates. All are array
arithmetic over the packed ``array<double>`` ring (whole-stage codegen) —
no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def st_npoints(ring: Column) -> Column:
    """ST_NPoints: vertex count of a packed ring/line."""
    return (F.size(ring) / 2).cast("int")


def st_point_n(ring: Column, n: int) -> tuple[Column, Column]:
    """ST_PointN (1-based) → (x, y)."""
    return F.element_at(ring, 2 * n - 1), F.element_at(ring, 2 * n)


def st_start_point(ring: Column) -> tuple[Column, Column]:
    return st_point_n(ring, 1)


def st_end_point(ring: Column) -> tuple[Column, Column]:
    sz = F.size(ring)
    return F.element_at(ring, sz - 1), F.element_at(ring, sz)


def st_is_closed(ring: Column) -> Column:
    """ST_IsClosed: first vertex == last vertex."""
    sx, sy = st_start_point(ring)
    ex, ey = st_end_point(ring)
    return (sx == ex) & (sy == ey)


def st_reverse(ring: Column) -> Column:
    """ST_Reverse: vertices in reverse order (x,y pairs kept intact)."""
    n = st_npoints(ring)
    idx = F.sequence(F.lit(1), n)
    return F.flatten(
        F.transform(
            idx,
            lambda i: F.array(
                F.element_at(ring, ((n - i) * 2 + 1).cast("int")),
                F.element_at(ring, ((n - i) * 2 + 2).cast("int")),
            ),
        )
    )


def st_flip_coordinates(ring: Column) -> Column:
    """ST_FlipCoordinates: (x, y) → (y, x) per vertex."""
    n = st_npoints(ring)
    idx = F.sequence(F.lit(0), n - 1)
    return F.flatten(
        F.transform(
            idx,
            lambda i: F.array(
                F.element_at(ring, (i * 2 + 2).cast("int")),
                F.element_at(ring, (i * 2 + 1).cast("int")),
            ),
        )
    )


def st_add_point(ring: Column, x: Column, y: Column) -> Column:
    """ST_AddPoint (append)."""
    return F.concat(ring, F.array(x, y))


def st_remove_point(ring: Column, n: int) -> Column:
    """ST_RemovePoint (1-based vertex index)."""
    return F.concat(
        F.slice(ring, 1, 2 * (n - 1)),
        F.slice(ring, 2 * n + 1, F.greatest(F.lit(0), F.size(ring) - 2 * n)),
    )


def st_exterior_ring(geom: Column) -> Column:
    """ST_ExteriorRing of a multi-ring geometry (array<array<double>>):
    ring 1 is the shell by convention."""
    return F.element_at(geom, 1)


def st_num_geometries(geom: Column) -> Column:
    """ST_NumGeometries / ST_NumInteriorRings+1 for array-of-rings input."""
    return F.size(geom)


def st_azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """ST_Azimuth: clockwise angle from north, radians in [0, 2π) —
    atan2(dx, dy) normalized (Functions.java azimuth semantics)."""
    import math

    a = F.atan2(x2 - x1, y2 - y1)
    return F.when(a < 0, a + F.lit(2.0 * math.pi)).otherwise(a)
