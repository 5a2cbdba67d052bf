"""Local Outlier Factor (LOF).

Reference: ``spark/common/src/main/scala/org/apache/sedona/stats/
outlierDetection/LocalOutlierFactor.scala`` — the classic composition over a
kNN self-join: k-distance → reachability distance → local reachability
density → LOF ratio. Ours rides the engine's exact ``knn_join`` (adaptive
k-ring), so every step is a DataFrame aggregate/join on int keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark.operators.knn import knn_join


def local_outlier_factor(
    points: DataFrame,
    k: int,
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
    level: int = 7,
) -> DataFrame:
    """→ (id_col, lof). LOF ≈ 1 for inliers, ≫ 1 for outliers."""
    qs = points.select(
        F.col(id_col).alias("_qid"), F.col(x).alias("_qx"), F.col(y).alias("_qy")
    )
    objs = points.select(
        F.col(id_col).alias("_oid"), F.col(x).alias("_ox"), F.col(y).alias("_oy")
    )
    # k+1 then drop self: the kNN self-join includes the zero-distance self
    knn = (
        knn_join(qs, objs, k=k + 1, level=level,
                 query_id="_qid", qx="_qx", qy="_qy", obj_x="_ox", obj_y="_oy")
        .filter(F.col("_qid") != F.col("_oid"))
        .select("_qid", "_oid", F.sqrt(F.col("dist_sq")).alias("_d"))
    ).persist()

    kdist = knn.groupBy("_qid").agg(F.max("_d").alias("_kdist"))

    reach = (
        knn.join(kdist.withColumnsRenamed({"_qid": "_oid", "_kdist": "_okd"}), "_oid")
        .withColumn("_reach", F.greatest(F.col("_d"), F.col("_okd")))
    )
    lrd = reach.groupBy("_qid").agg(
        (F.lit(float(k)) / F.sum("_reach")).alias("_lrd")
    )
    lof = (
        knn.join(lrd.withColumnsRenamed({"_qid": "_oid", "_lrd": "_olrd"}), "_oid")
        .join(lrd, "_qid")
        .groupBy("_qid")
        .agg((F.sum(F.col("_olrd") / F.col("_lrd")) / F.lit(float(k))).alias("lof"))
    )
    out = lof.withColumnRenamed("_qid", id_col)
    return out
