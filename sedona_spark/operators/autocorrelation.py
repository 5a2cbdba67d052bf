"""Global Moran's I spatial autocorrelation.

Reference: ``spark/common/src/main/scala/org/apache/sedona/stats/
autocorrelation/Moran.scala`` with the distance-band binary weighting of
``Weighting.scala`` — again the engine's distance self-join + closed-form
aggregate shape:

    I = (N / W) · Σ_ij w_ij·z_i·z_j / Σ_i z_i²,   z = x − x̄, w binary band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark.operators.distance_join import distance_join


def morans_i(
    points: DataFrame,
    radius: float,
    value_col: str = "val",
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
    level: int = 8,
) -> DataFrame:
    """→ one row (n, w_sum, moran_i). Binary weights over the inclusive
    distance band, self-pairs excluded.

    The z-product sum is EXPANDED into raw moments so every distributed
    aggregate is an exact integer for integer-valued attributes (order-free
    ⇒ engine-bit-reproducible):

        Σ zᵢzⱼ = Σ xᵢxⱼ − x̄·Σ(xᵢ+xⱼ) + W·x̄²,   Σ zᵢ² = Σ xᵢ² − n·x̄².
    """
    stats = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sv"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("sx2"),
    ).collect()[0]
    n, sv, sx2 = int(stats["n"]), stats["sv"], stats["sx2"]
    mean = sv / n

    a = points.select(
        F.col(id_col).alias("_ida"), F.col(x).alias("_xa"), F.col(y).alias("_ya"),
        F.col(value_col).alias("_va"),
    )
    b = points.select(
        F.col(id_col).alias("_idb"), F.col(x).alias("_xb"), F.col(y).alias("_yb"),
        F.col(value_col).alias("_vb"),
    )
    band = distance_join(
        a, b, radius, level=level,
        probe_x="_xa", probe_y="_ya", build_x="_xb", build_y="_yb",
    ).filter(F.col("_ida") != F.col("_idb"))

    num = band.agg(
        F.sum(F.col("_va") * F.col("_vb")).alias("p1"),
        F.sum(F.col("_va") + F.col("_vb")).alias("p2"),
        F.count(F.lit(1)).alias("w_sum"),
    ).collect()[0]
    w = int(num["w_sum"])
    spark = points.sparkSession
    if w == 0:
        # empty distance band (no pair within radius — possible at very
        # sparse densities): the sums are NULL and I is undefined; emit
        # NaN, matching the SQL mirror's 0-division/NULL fold (the old
        # code raised on None arithmetic here)
        i_val = float("nan")
    else:
        cross = num["p1"] - mean * num["p2"] + w * mean * mean
        denom = sx2 - n * mean * mean
        i_val = (n / w) * cross / denom
    return spark.createDataFrame(
        [(n, w, float(i_val))], "n long, w_sum long, moran_i double"
    )
