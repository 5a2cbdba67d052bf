"""Getis-Ord G* hotspot detection.

Reference: ``spark/common/src/main/scala/org/apache/sedona/stats/
hotspotDetection/GetisOrd.scala`` (G/G* over a distance-band weight matrix,
binary weights).

    G*_i = (Σ_j∈band(i) x_j − X̄·n_i) / (S·sqrt((N·n_i − n_i²)/(N−1)))

with the band including i itself (the * variant). Global N/X̄/S are three
scalars — computed once and inlined as literals (constant-size driver data,
valid at any scale).

Algorithm (cell-level pre-aggregation — the r2 point-disk self-join exploded
every point to its cell disk and re-joined the full point table; this shape
aggregates count/sum PER CELL first, so:

* cell pairs whose farthest corners are within ``radius`` contribute their
  whole (count, sum) with NO point-pair work (one broadcast-size cell
  table);
* only the boundary ring of *partial* cell pairs reaches the exact
  point-pair refine, and each side of that join carries its pre-computed
  home cell — candidate volume is O(points · band perimeter), not
  O(points · band area).

Both contribution streams are exact integer aggregates, so the statistic
stays bit-reproducible (the full-value oracle parity is unchanged).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark import cells


def getis_ord_gstar(
    points: DataFrame,
    radius: float,
    value_col: str = "val",
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
    level: int | None = None,
) -> DataFrame:
    """→ (id_col, n_band, band_sum, g_star) per point. Binary weights over
    the inclusive distance band; self included (G*).

    Global mean/std are derived from count/sum/sum-of-squares: for an
    integer-valued attribute all three aggregates are EXACT (order-free), so
    the statistic is bit-reproducible across engines — the trick that turns
    the driver check from rows-only into full value parity.

    ``level=None`` derives the cell grain from the radius
    (``cells.level_for_extent``) so the band spans ~2 cells per axis —
    fixing the r2 level-7/level-8 mismatch between query and operator."""
    if level is None:
        level = min(
            cells.MAX_LEVEL,
            cells.level_for_extent(radius, max_cells_per_side=2) + 1,
        )
    stats = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sv"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("sx2"),
    ).collect()[0]
    n_total = int(stats["n"])
    mean = stats["sv"] / n_total
    sd = math.sqrt(stats["sx2"] / n_total - mean * mean)

    n_side = 1 << level
    cw, chh = cells.cell_width(level), cells.cell_height(level)
    r2 = float(radius) * float(radius)
    kx, ky = cells.disk_radii_for_distance(radius, level)

    pts_c = points.withColumn(
        "_home", cells.cell_id(F.col(x), F.col(y), level)
    )
    cagg = pts_c.groupBy("_home").agg(
        F.count(F.lit(1)).alias("_ccnt"), F.sum(value_col).alias("_csum")
    )

    # occupied-cell disk explode: |occupied| · (2kx+1)(2ky+1) rows — tiny
    # next to the point table (the r2 shape exploded every POINT instead)
    cgx, cgy = cells.cell_x(F.col("_home")), cells.cell_y(F.col("_home"))
    pairs = (
        cagg.select("_home", cgx.alias("_cgx"), cgy.alias("_cgy"))
        .withColumn(
            "_bgx",
            F.explode(F.sequence(
                F.greatest(F.lit(0), F.col("_cgx") - kx),
                F.least(F.lit(n_side - 1), F.col("_cgx") + kx),
            )),
        )
        .withColumn(
            "_bgy",
            F.explode(F.sequence(
                F.greatest(F.lit(0), F.col("_cgy") - ky),
                F.least(F.lit(n_side - 1), F.col("_cgy") + ky),
            )),
        )
    )
    dx = F.abs(F.col("_bgx") - F.col("_cgx")).cast("double")
    dy = F.abs(F.col("_bgy") - F.col("_cgy")).cast("double")
    # exact min/max separation of any A-point/B-point for cells (dx, dy)
    # grid steps apart: [max(dx-1,0)·cw, (dx+1)·cw] per axis
    min2 = (
        F.pow(F.greatest(dx - 1, F.lit(0.0)) * cw, 2)
        + F.pow(F.greatest(dy - 1, F.lit(0.0)) * chh, 2)
    )
    max2 = F.pow((dx + 1) * cw, 2) + F.pow((dy + 1) * chh, 2)
    pairs = (
        pairs.filter(min2 <= F.lit(r2))
        .withColumn("_bcell", cells.cell_of(F.col("_bgx"), F.col("_bgy"), level))
        .withColumn("_full", max2 <= F.lit(r2))
        .select("_home", "_bcell", "_full")
    )
    cagg_b = cagg.select(
        F.col("_home").alias("_bcell"), "_ccnt", "_csum"
    )
    pb = pairs.join(cagg_b, "_bcell")

    # stream 1: fully-covered cells — whole (count, sum) per A-cell, then
    # one broadcast join back to the points
    full = pb.filter(F.col("_full")).groupBy("_home").agg(
        F.sum("_ccnt").alias("_fcnt"), F.sum("_csum").alias("_fsum")
    )

    # stream 2: partial cells — exact point-pair refine restricted to the
    # boundary ring
    part = pb.filter(~F.col("_full")).select("_home", "_bcell")
    pa = pts_c.select(
        F.col(id_col).alias("_ida"), F.col(x).alias("_xa"),
        F.col(y).alias("_ya"), "_home",
    )
    pbp = pts_c.select(
        F.col(x).alias("_xb"), F.col(y).alias("_yb"),
        F.col(value_col).alias("_vb"), F.col("_home").alias("_bcell"),
    )
    cand = pa.join(part, "_home").join(pbp, "_bcell")
    ddx = F.col("_xa") - F.col("_xb")
    ddy = F.col("_ya") - F.col("_yb")
    cand = cand.filter(ddx * ddx + ddy * ddy <= F.lit(r2))
    pagg = cand.groupBy("_ida", "_home").agg(
        F.count(F.lit(1)).alias("_pcnt"), F.sum("_vb").alias("_psum")
    )

    res = (
        pts_c.select(F.col(id_col).alias("_ida"), "_home")
        .join(full, "_home", "left")
        .join(pagg, ["_ida", "_home"], "left")
        .select(
            "_ida",
            (F.coalesce(F.col("_fcnt"), F.lit(0))
             + F.coalesce(F.col("_pcnt"), F.lit(0))).alias("n_band"),
            (F.coalesce(F.col("_fsum"), F.lit(0))
             + F.coalesce(F.col("_psum"), F.lit(0))).alias("band_sum"),
        )
    )
    nb = F.col("n_band").cast("double")
    denom = F.lit(sd) * F.sqrt(
        (F.lit(float(n_total)) * nb - nb * nb) / F.lit(float(n_total - 1))
    )
    g = (F.col("band_sum") - F.lit(mean) * nb) / denom
    return res.select(
        F.col("_ida").alias(id_col), "n_band", "band_sum", g.alias("g_star")
    )
