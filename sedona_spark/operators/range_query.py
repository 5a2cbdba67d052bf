"""Range query: filter a point table by a literal query window.

Semantics of ``RangeQuery.SpatialRangeQuery``
(``core/spatialOperator/RangeQuery.java:49-104``): envelope prefilter, then
exact predicate refine; predicate ∈ {contains, covers, intersects, within}
with the reference's boundary conventions
(``core/rangeJudgement/JudgementBase.java:59-67``).

Scale design: the prefilter is plain min/max comparisons on the x/y columns
— Catalyst pushes them into the parquet/Iceberg scan (PushedFilters), so at
100 TB the scan prunes row groups / files before any compute. The exact
refine for a general polygon window is one Arrow-batched kernel over the
(tiny) surviving rows. The window is a literal: covering it with cells adds
nothing that the bbox pushdown doesn't already do, so no shuffle, no UDF for
rectangular windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType

from sedona_spark.geometry import kernels


def _rect_class(px: Column, py: Column, x0, y0, x1, y1) -> Column:
    """Ternary classification vs an axis-aligned rectangle, pure SQL."""
    inside = (px > x0) & (px < x1) & (py > y0) & (py < y1)
    on = (
        ((px == x0) | (px == x1)) & (py >= y0) & (py <= y1)
    ) | (((py == y0) | (py == y1)) & (px >= x0) & (px <= x1))
    return F.when(inside, F.lit(2)).when(on, F.lit(1)).otherwise(F.lit(0))


def _predicate_filter(cls: Column, predicate: str) -> Column:
    if predicate in ("contains",):  # window strictly contains point
        return cls == 2
    if predicate in ("covers", "intersects", "within", "covered_by"):
        # for point-vs-area these coincide: boundary counts
        return cls >= 1
    raise ValueError(f"unsupported predicate {predicate!r}")


def range_query(
    points: DataFrame,
    window_ring,
    predicate: str = "intersects",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Rows of ``points`` whose (x, y) satisfies ``predicate`` against the
    literal polygon ``window_ring`` ([x0, y0, x1, y1, ...]).

    Rectangle windows (axis-aligned 4-vertex rings) stay 100% JVM-side.
    """
    ring = np.asarray(window_ring, dtype=np.float64).reshape(-1, 2)
    if len(ring) >= 2 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    x0, y0 = ring.min(axis=0)
    x1, y1 = ring.max(axis=0)
    px, py = F.col(x), F.col(y)

    # envelope prefilter — pushed down to the scan
    pre = points.filter((px >= x0) & (px <= x1) & (py >= y0) & (py <= y1))

    is_rect = len(ring) == 4 and all(
        (cx in (x0, x1)) and (cy in (y0, y1)) for cx, cy in ring
    )
    if is_rect:
        cls = _rect_class(px, py, x0, y0, x1, y1)
        return pre.filter(_predicate_filter(cls, predicate))

    flat = ring.reshape(-1).tolist()

    @F.pandas_udf(ByteType())
    def _cls(sx: pd.Series, sy: pd.Series) -> pd.Series:
        res = kernels.points_in_one_polygon(
            np.asarray(flat), sx.to_numpy(), sy.to_numpy()
        )
        return pd.Series(res)

    return pre.filter(_predicate_filter(_cls(px, py), predicate))
