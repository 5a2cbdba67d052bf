"""Reference-parity Gi/Gi* over a weights column
(``stats/hotspotDetection/GetisOrd.scala:66-105``; python wrapper
``python/sedona/spark/stats/hotspot_detection/getis_ord.py:29``).

Formula-for-formula port of the reference's Column math — G, E[G],
V[G], Z, P with ``removeSelf = 0/1`` for star/non-star. Two deltas,
both from the columnar weights model:

* the engine's weight structs carry ``neighbor_id`` (not an embedded
  copy of the neighbor row), so Σ w·x over neighbors is one explode +
  equi-join on the id — at scale that is the same shuffle the
  reference's struct embedding paid earlier, at weighting time;
* P uses the Zelen–Severo 26.2.17 polynomial normal CDF (|ε| < 7.5e-8)
  as a pure Column instead of a JVM NormalDistribution UDF.

(The radius-based, exact-integer ``operators/hotspot.getis_ord_gstar``
remains the oracle-verified fast path; this spelling exists for users
who already built a weights column.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_cdf(z: Column) -> Column:
    """Φ(z) via Zelen & Severo 26.2.17 (pure Column, |ε| < 7.5e-8)."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (F.lit(0.319381530)
                + t * (F.lit(-0.356563782)
                       + t * (F.lit(1.781477937)
                              + t * (F.lit(-1.821255978)
                                     + t * F.lit(1.330274429)))))
    pdf = F.exp(az * az / F.lit(-2.0)) / F.lit(2.5066282746310002)
    upper = F.lit(1.0) - pdf * poly
    return F.when(z >= 0, upper).otherwise(F.lit(1.0) - upper)


def g_local(
    dataframe: DataFrame,
    x: str,
    weights: str = "weights",
    permutations: int = 0,
    star: bool = False,
    island_weight: float = 0.0,
    id_col: str = "id",
) -> DataFrame:
    """Adds G, EG, VG, Z, P (reference column names) to ``dataframe``.
    ``weights`` is the array<struct<neighbor_id, weight>> column from
    :mod:`sedona_spark.stats.weighting`."""
    if permutations:
        raise NotImplementedError(
            "permutation tests are not implemented (the reference's "
            "python wrapper documents the same)")
    r = F.lit(1.0) if not star else F.lit(0.0)

    g = dataframe.agg(
        F.sum(F.col(x)).alias("_sum_all"),
        F.sum(F.col(x) * F.col(x)).alias("_sumsq_all"),
        F.count(F.lit(1)).cast("double").alias("_n_all"))

    vals = dataframe.select(
        F.col(id_col).alias("_nid2"), F.col(x).alias("_nx"))
    # a weight whose neighbor_id matches no row would silently deflate
    # G while W (→ EG/VG) still counts it — refuse loudly instead (the
    # reference can't hit this: it embeds neighbor values at weighting
    # time; here, re-derive weights AFTER any row filtering)
    nx_checked = F.assert_true(
        F.col("_w").isNull() | F.col("_nx").isNotNull(),
        F.lit("g_local: weights reference ids absent from the "
              "dataframe — rebuild weights after filtering rows"),
    ).cast("double")  # null; folded into the sum as a no-op
    wx = (
        dataframe.select(
            F.col(id_col).alias("_wid"),
            F.explode_outer(F.col(weights)).alias("_w"))
        .join(vals, F.col("_w.neighbor_id") == F.col("_nid2"), "left")
        .groupBy("_wid")
        .agg(
            F.coalesce(
                F.sum(F.col("_w.weight") * F.col("_nx")
                      + F.coalesce(nx_checked, F.lit(0.0))),
                F.lit(0.0)).alias("_wx_sum"),
            F.coalesce(F.sum(F.col("_w.weight")), F.lit(0.0)).alias("_w"))
    )

    j = (dataframe.join(wx, F.col(id_col) == F.col("_wid"))
         .drop("_wid").crossJoin(F.broadcast(g)))
    xi = F.col(x)
    n = F.col("_n_all")
    denom = F.col("_sum_all") - r * xi
    y1 = denom / (n - r)
    y2 = (F.col("_sumsq_all") - r * xi * xi) / (n - r) - y1 * y1
    w = F.col("_w")
    # degenerate guards (ANSI mode turns double /0 into a job-killing
    # DIVIDE_BY_ZERO): islands (W=0 → VG=0), constant-x (y1=0), and
    # tiny n yield NULL Z/P instead of aborting the whole frame.
    # NESTED whens, not one AND: Spark does not short-circuit AND
    # conjuncts in vectorized eval, so (y1 != 0) — which itself divides
    # by n-r — must only be evaluated under the n-guard branch
    vg = F.when(
        n - 1 - r > 0,
        F.when(
            y1 != 0,
            (w * (n - r - w) * y2) / ((n - r) * (n - r) * (n - 1 - r)
                                      * y1 * y1)))
    out = (
        j.withColumn("G", F.when(denom != 0, F.col("_wx_sum") / denom))
        .withColumn("EG", F.when(n - r != 0, w / (n - r)))
        .withColumn("VG", vg)
        .withColumn("Z", F.when(F.col("VG") > 0,
                                (F.col("G") - F.col("EG"))
                                / F.sqrt(F.col("VG"))))
        .withColumn("P", F.lit(1.0) - norm_cdf(F.abs(F.col("Z"))))
    )
    return out.drop("_wx_sum", "_w", "_sum_all", "_sumsq_all", "_n_all")
