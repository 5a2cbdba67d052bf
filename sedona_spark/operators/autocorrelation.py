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
    distance band, self-pairs excluded."""
    stats = points.agg(
        F.count(F.lit(1)).alias("n"), F.avg(value_col).alias("mean")
    ).collect()[0]
    n, mean = int(stats["n"]), float(stats["mean"])

    a = points.select(
        F.col(id_col).alias("_ida"), F.col(x).alias("_xa"), F.col(y).alias("_ya"),
        (F.col(value_col) - F.lit(mean)).alias("_za"),
    )
    b = points.select(
        F.col(id_col).alias("_idb"), F.col(x).alias("_xb"), F.col(y).alias("_yb"),
        (F.col(value_col) - F.lit(mean)).alias("_zb"),
    )
    band = distance_join(
        a, b, radius, level=level,
        probe_x="_xa", probe_y="_ya", build_x="_xb", build_y="_yb",
    ).filter(F.col("_ida") != F.col("_idb"))

    num = band.agg(
        F.sum(F.col("_za") * F.col("_zb")).alias("cross"),
        F.count(F.lit(1)).alias("w_sum"),
    ).collect()[0]
    denom = points.agg(
        F.sum((F.col(value_col) - F.lit(mean)) * (F.col(value_col) - F.lit(mean)))
    ).collect()[0][0]

    spark = points.sparkSession
    i_val = (n / float(num["w_sum"])) * float(num["cross"]) / float(denom)
    return spark.createDataFrame(
        [(n, int(num["w_sum"]), float(i_val))], "n long, w_sum long, moran_i double"
    )
