"""Getis-Ord G* hotspot detection.

Reference: ``spark/common/src/main/scala/org/apache/sedona/stats/
hotspotDetection/GetisOrd.scala`` (G/G* over a distance-band weight matrix,
binary weights) — the composition the reference itself uses: a distance
self-join builds the neighbor band, then per-point aggregates feed the
closed-form statistic.

    G*_i = (Σ_j∈band(i) x_j − X̄·n_i) / (S·sqrt((N·n_i − n_i²)/(N−1)))

with the band including i itself (the * variant). Global N/X̄/S are three
scalars — computed once and inlined as literals (constant-size driver data,
valid at any scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark.operators.distance_join import distance_join


def getis_ord_gstar(
    points: DataFrame,
    radius: float,
    value_col: str = "val",
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
    level: int = 8,
) -> DataFrame:
    """→ (id_col, n_band, band_sum, g_star) per point. Binary weights over
    the inclusive distance band; self included (G*).

    Global mean/std are derived from count/sum/sum-of-squares: for an
    integer-valued attribute all three aggregates are EXACT (order-free), so
    the statistic is bit-reproducible across engines — the trick that turns
    the driver check from rows-only into full value parity."""
    stats = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sv"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("sx2"),
    ).collect()[0]
    n_total = int(stats["n"])
    mean = stats["sv"] / n_total
    sd = math.sqrt(stats["sx2"] / n_total - mean * mean)

    a = points.select(
        F.col(id_col).alias("_ida"), F.col(x).alias("_xa"), F.col(y).alias("_ya")
    )
    b = points.select(
        F.col(id_col).alias("_idb"),
        F.col(x).alias("_xb"),
        F.col(y).alias("_yb"),
        F.col(value_col).alias("_vb"),
    )
    band = distance_join(
        a, b, radius, level=level,
        probe_x="_xa", probe_y="_ya", build_x="_xb", build_y="_yb",
    )  # includes the self-pair (distance 0) → G*
    agg = band.groupBy("_ida").agg(
        F.count(F.lit(1)).alias("n_band"), F.sum("_vb").alias("band_sum")
    )
    nb = F.col("n_band").cast("double")
    denom = F.lit(sd) * F.sqrt(
        (F.lit(float(n_total)) * nb - nb * nb) / F.lit(float(n_total - 1))
    )
    g = (F.col("band_sum") - F.lit(mean) * nb) / denom
    return agg.select(
        F.col("_ida").alias(id_col), "n_band", "band_sum", g.alias("g_star")
    )
