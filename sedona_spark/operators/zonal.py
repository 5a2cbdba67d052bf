"""Zonal statistics + keyed join aggregations.

Reference analogs:

* ``RS_ZonalStats(All)`` (``RasterBandAccessors.java``): per-zone aggregates
  of raster values — here: tile→cell assignment joined to zone cover cells,
  then a plain groupBy (partial aggregation map-side, one shuffle);
* ``JoinQuery.SpatialJoinQueryCountByKey`` (``JoinQuery.java:116-134,
  321-373``): flat join → counts per window — here: the join output grouped
  by the zone key (Catalyst plans the same partial/final count);
* ``JoinQuery.SpatialJoinQuery`` non-flat (``JoinQuery.java:97-114``):
  pairs grouped per window geometry — here: ``collect_list`` per zone key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark.operators.spatial_join import pip_join_rect


def join_count_by_key(
    points: DataFrame,
    rects: DataFrame,
    key: str,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-zone matched-point counts (CountByKey join)."""
    j = pip_join_rect(points, rects, predicate, level=level, x=x, y=y)
    return j.groupBy(key).agg(F.count(F.lit(1)).alias("n_matches"))


def join_collect_by_key(
    points: DataFrame,
    rects: DataFrame,
    key: str,
    collect_col: str,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-zone sorted list of matched ids (non-flat GroupByKey join;
    sorted for deterministic output)."""
    j = pip_join_rect(points, rects, predicate, level=level, x=x, y=y)
    return j.groupBy(key).agg(
        F.array_sort(F.collect_list(collect_col)).alias("matches")
    )


def zonal_stats(
    points: DataFrame,
    rects: DataFrame,
    key: str,
    value_col: str,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-zone count/sum/min/max of a value column over contained points —
    the vector form of RS_ZonalStats (the raster form feeds tile rows
    through the same shape)."""
    j = pip_join_rect(points, rects, predicate, level=level, x=x, y=y)
    return j.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("val_sum"),
        F.min(value_col).alias("val_min"),
        F.max(value_col).alias("val_max"),
    )
