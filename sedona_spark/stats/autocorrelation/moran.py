"""Reference-parity global Moran's I over a weights column
(``stats/autocorrelation/Moran.scala:22-130``; python wrapper
``python/sedona/spark/stats/autocorrelation/moran.py:31``).

Same statistic, same normality inference: I = (n/S0)·Σ w z_i z_j / Σz²,
E[I] = −1/(n−1), V_norm[I] = (n²S1 − nS2 + 3S0²)/((n−1)(n+1)S0²) −
E[I]², z = (I−E[I])/√V, with S1 computed over symmetrized pairs exactly
as the reference does (self-join on reciprocal edges). Only the scalar
normal CDF differs (Zelen–Severo polynomial instead of commons-math).

Parity caveat, matched bug-for-bug: the reference's S1/S2 self-join
(``Moran.scala:63-70``) is *inner*, so an edge with no reciprocal (KNN
asymmetry: A lists B, B doesn't list A) drops out of S1/S2 while S0
still counts it. V[I] is therefore only textbook-correct for symmetric
weights (distance-band), the weights the reference's own tests use —
this port reproduces the reference's numbers either way.

Distribution shape: two aggregates over the exploded weights (an
equi-join for neighbor values / reciprocal weights, then fixed-width
sums) — only five scalars ever reach the driver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MoranResult:
    i: float
    p_norm: float
    z_norm: float


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


class Moran:
    @staticmethod
    def get_global(
        df: DataFrame,
        two_tailed: bool = True,
        id_column: str = "id",
        value_column: str = "value",
        weights_column: str = "weights",
    ) -> MoranResult:
        y_mean, n = df.select(
            F.avg(value_column), F.count(F.lit(1))).first()
        n = int(n)

        ew = df.select(
            F.col(id_column).alias("id"),
            F.explode(F.col(weights_column)).alias("_w"),
        ).select(
            "id", F.col("_w.neighbor_id").alias("n_id"),
            F.col("_w.weight").alias("wv"))

        # S1 over reciprocal pairs + S2 over row in/out degree sums —
        # the reference's self-join, verbatim
        rcp = ew.alias("l").join(
            ew.alias("r"),
            (F.col("l.n_id") == F.col("r.id"))
            & (F.col("r.n_id") == F.col("l.id")))
        s1 = rcp.select(
            ((F.col("l.wv") + F.col("r.wv"))
             * (F.col("l.wv") + F.col("r.wv"))).alias("c")
        ).agg(F.sum("c") / 2.0).first()[0] or 0.0
        s2 = (rcp.groupBy("l.id")
              .agg((F.sum("r.wv") + F.sum("l.wv")).alias("deg"))
              .agg(F.sum(F.col("deg") * F.col("deg"))).first()[0]) or 0.0

        vals = df.select(
            F.col(id_column).alias("n_id2"),
            (F.col(value_column) - F.lit(y_mean)).alias("zn"))
        zrow = df.select(
            F.col(id_column).alias("id"),
            (F.col(value_column) - F.lit(y_mean)).alias("z"))
        # z2ss sums over EVERY row (Moran.scala's z2ss_comp) — rows with
        # empty weights contribute z² here even though they vanish from
        # the exploded inum/s0 pipeline (their zl is 0 anyway)
        z2ss = df.select(
            (F.col(value_column) - F.lit(y_mean)).alias("z")
        ).agg(F.sum(F.col("z") * F.col("z"))).first()[0]
        inum, s0 = (
            ew.join(vals, F.col("n_id") == F.col("n_id2"))
            .groupBy("id")
            .agg(F.sum(F.col("wv") * F.col("zn")).alias("zl"),
                 F.sum("wv").alias("w_sum"))
            .join(zrow, "id")
            .agg(F.sum(F.col("z") * F.col("zl")),
                 F.sum("w_sum"))
            .first())

        i = n / s0 * inum / z2ss
        ei = -1.0 / (n - 1)
        s02 = s0 * s0
        v_num = n * n * s1 - n * s2 + 3 * s02
        v_den = (n - 1) * (n + 1) * s02
        vi = v_num / v_den - (1.0 / (n - 1)) ** 2
        z_norm = (i - ei) / math.sqrt(vi)
        p = 1.0 - _phi(z_norm) if z_norm > 0 else _phi(z_norm)
        return MoranResult(i, p * 2.0 if two_tailed else p, z_norm)
