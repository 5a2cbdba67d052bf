"""ST_* column functions.

Mirrors the needed subset of the reference's ~340-function catalog
(``spark/common/src/main/scala/org/apache/sedona/sql/UDF/Catalog.scala``):
predicates (``Predicates.scala``), measures (``Functions.scala``),
constructors. Design rule: anything expressible as Column arithmetic stays
JVM-side (whole-stage codegen); only general-polygon exact tests cross into
Python, as ONE Arrow-batched ternary classifier (:func:`pip_class`) from
which all boundary-sensitive predicates derive as cheap Column comparisons —
the same CONTAINS/COVERS/INTERSECTS split the reference encodes in
``SpatialPredicateEvaluators.java:25-80``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, ByteType, StringType

from sedona_spark.geometry import kernels, wkb

# ---------------------------------------------------------------------------
# Pure-Column predicates & measures (JVM-side, codegen'd)
# ---------------------------------------------------------------------------


def st_distance_sq(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Squared planar distance (avoid sqrt on the hot path; compare against
    r² — same trick as comparing JTS distance to a literal)."""
    dx = x1 - x2
    dy = y1 - y2
    return dx * dx + dy * dy


def st_dwithin(x1: Column, y1: Column, x2: Column, y2: Column, r: float) -> Column:
    """Planar ST_DWithin(point, point, r) — inclusive, matching the
    reference's distance-join <= semantics (``JoinQuery.java:433-533``)."""
    return st_distance_sq(x1, y1, x2, y2) <= F.lit(float(r) * float(r))


def env_contains_point(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, px: Column, py: Column
) -> Column:
    return (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)


def env_intersects(
    axmin: Column, aymin: Column, axmax: Column, aymax: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
) -> Column:
    return (axmin <= bxmax) & (bxmin <= axmax) & (aymin <= bymax) & (bymin <= aymax)


def st_envelope_cols(ring: Column) -> list[Column]:
    """Envelope of a packed ring ``array<double>`` as four Columns — pure
    SQL (aggregate over the array), no Python. Analog of ``ST_Envelope``."""
    xs = F.filter(F.transform(ring, lambda v, i: F.when(i % 2 == 0, v)), lambda v: v.isNotNull())
    ys = F.filter(F.transform(ring, lambda v, i: F.when(i % 2 == 1, v)), lambda v: v.isNotNull())
    return [
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    ]


# ---------------------------------------------------------------------------
# Arrow-batched exact predicates (the only Python on the hot path)
# ---------------------------------------------------------------------------


@F.pandas_udf(ByteType())
def _pip_class_udf(ring: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    res = kernels.point_in_polygon_batch(
        ring.to_numpy(), px.to_numpy(), py.to_numpy()
    )
    return pd.Series(res)


def pip_class(ring: Column, px: Column, py: Column) -> Column:
    """Ternary point-vs-polygon classification: 0 out / 1 boundary / 2 in."""
    return _pip_class_udf(ring, px, py)


def st_contains_point(ring: Column, px: Column, py: Column) -> Column:
    """ST_Contains(polygon, point): interior only (boundary excluded)."""
    return pip_class(ring, px, py) == F.lit(2)


def st_covers_point(ring: Column, px: Column, py: Column) -> Column:
    """ST_Covers(polygon, point) ≡ ST_Intersects for point RHS: boundary in."""
    return pip_class(ring, px, py) >= F.lit(1)


@F.pandas_udf(BooleanType())
def _poly_intersects_udf(ring_a: pd.Series, ring_b: pd.Series) -> pd.Series:
    res = kernels.polygons_intersect_batch(ring_a.to_numpy(), ring_b.to_numpy())
    return pd.Series(res)


def st_intersects_polygons(ring_a: Column, ring_b: Column) -> Column:
    """Exact polygon×polygon INTERSECTS (touch counts)."""
    return _poly_intersects_udf(ring_a, ring_b)


# ---------------------------------------------------------------------------
# WKB interop (constructors / output, cf. Catalog.scala constructor block)
# ---------------------------------------------------------------------------


@F.pandas_udf(BinaryType())
def st_point_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series([wkb.wkb_point(a, b) for a, b in zip(x, y)])


@F.pandas_udf(BinaryType())
def st_polygon_wkb(ring: pd.Series) -> pd.Series:
    return pd.Series([wkb.wkb_polygon(r) for r in ring])


@F.pandas_udf(StringType())
def st_astext(buf: pd.Series) -> pd.Series:
    return pd.Series([wkb.wkt(b) for b in buf])
