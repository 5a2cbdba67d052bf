"""Distance-band spatial weighting (the reference's
``Weighting.scala addDistanceBandColumn / addBinaryDistanceBandColumn /
addWeightedDistanceBandColumn``, surfaced in SQL as
ST_BinaryDistanceBandColumn / ST_WeightedDistanceBandColumn and consumed by
the Getis-Ord / Moran pipelines).

The reference joins the table to itself with a raw
``ST_Distance(l, r) <= threshold`` theta predicate — a full cross product
at plan level. Here the self-join goes through the engine's cell-blocked
``distance_join`` (grid-disk explode on one side, cell equi-join, exact
refine), so candidate volume is O(points x band area), shuffles on the
cell key, and survives the 10^12-row table the theta join cannot.

Weight semantics mirrored exactly (Weighting.scala:66-211):

* binary: weight 1 for every neighbor within ``threshold``;
* weighted: weight = dist^alpha (alpha < 0, default -1);
* ``include_zero`` adds 0-distance neighbors (weighted: infinity per IEEE
  division, as the reference documents);
* ``include_self`` appends the row itself with ``self_weight``;
* rows with no neighbors keep an empty weights list (reference's left
  join back to the input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark.operators.distance_join import distance_join


def add_distance_band_column(
    points: DataFrame,
    threshold: float,
    binary: bool = True,
    alpha: float = -1.0,
    include_zero: bool = False,
    include_self: bool = False,
    self_weight: float = 1.0,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    level: int = 7,
    result_name: str = "weights",
) -> DataFrame:
    """points(id, x, y, ...) -> same rows + ``weights``:
    array<struct<neighbor_id, weight>> sorted by neighbor id (the
    reference's list order is join-dependent; sorting makes the column
    deterministic and oracle-comparable)."""
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if alpha >= 0:
        raise ValueError("alpha must be < 0")
    right = points.select(
        F.col(id_col).alias("_nid"),
        F.col(x).alias("_nx"),
        F.col(y).alias("_ny"),
    )
    pairs = distance_join(
        points.select(id_col, x, y), right, threshold,
        level=level, probe_x=x, probe_y=y, build_x="_nx", build_y="_ny",
    ).filter(F.col(id_col) != F.col("_nid"))
    # explicit products, not pow(_, 2): the DuckDB oracle mirrors the same
    # IEEE multiply/add/sqrt sequence, so results are bit-identical
    dx, dy = F.col(x) - F.col("_nx"), F.col(y) - F.col("_ny")
    dist = F.sqrt(dx * dx + dy * dy)
    if not include_zero:
        pairs = pairs.filter(dist > 0)
    weight = F.lit(1.0) if binary else dist ** F.lit(float(alpha))
    grouped = (
        pairs.select(
            id_col,
            F.struct(
                F.col("_nid").cast("long").alias("neighbor_id"),
                weight.alias("weight"),
            ).alias("_w"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("_w")).alias(result_name))
    )
    out = points.join(grouped, id_col, "left").withColumn(
        result_name,
        F.coalesce(
            F.col(result_name),
            F.array().cast(
                "array<struct<neighbor_id: long, weight: double>>"
            ),
        ),
    )
    if include_self:
        out = out.withColumn(
            result_name,
            F.array_sort(
                F.array_append(
                    F.col(result_name),
                    F.struct(
                        F.col(id_col).cast("long").alias("neighbor_id"),
                        F.lit(float(self_weight)).alias("weight"),
                    ),
                )
            ),
        )
    return out


def add_binary_distance_band_column(
    points: DataFrame, threshold: float, **kw
) -> DataFrame:
    """ST_BinaryDistanceBandColumn analog (zero-distance neighbors
    included by default, as in Weighting.scala:194-211)."""
    kw.setdefault("include_zero", True)
    return add_distance_band_column(points, threshold, binary=True, **kw)


def add_weighted_distance_band_column(
    points: DataFrame, threshold: float, alpha: float = -1.0, **kw
) -> DataFrame:
    """ST_WeightedDistanceBandColumn analog: weight = dist^alpha."""
    return add_distance_band_column(
        points, threshold, binary=False, alpha=alpha, **kw
    )
