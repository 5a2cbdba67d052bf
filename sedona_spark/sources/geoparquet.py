"""GeoParquet-style spatially-pruned storage.

Reference: GeoParquet per-file bbox metadata + spatial filter pushdown
(``GeoParquetMetaData.scala:47-70``, ``SpatialFilterPushDownForGeoParquet
.scala:54-148``) — at 100 TB the point is that a range query opens only the
files whose bbox intersects the window.

Spark-first re-expression with no custom FileFormat:

* files are laid out by a coarse **cell partition column** (hive
  partitioning) — the partition value IS the file's bbox, so Catalyst's
  partition pruning is exactly the reference's file-bbox pruning;
* rows are sorted by (x, y) within partitions, so parquet row-group min/max
  stats on the coordinate columns are tight and the residual range filter
  prunes row groups inside each file (PushedFilters).

On Iceberg the same layout comes from a `bucket`/`truncate` partition
transform plus column stats in manifests; this module is the plain-parquet
stand-in with identical pruning semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sedona_spark import cells


def write_spatial(
    df: DataFrame,
    path: str,
    level: int = 4,
    x: str = "x",
    y: str = "y",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` spatially partitioned: one hive partition per coarse
    cell, rows sorted by (x, y) inside for tight row-group stats."""
    out = df.withColumn("part_cell", cells.cell_id(F.col(x), F.col(y), level))
    (
        out.repartition("part_cell")
        .sortWithinPartitions(x, y)
        .write.mode(mode)
        .partitionBy("part_cell")
        .parquet(path)
    )


def read_spatial_range(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float],
    level: int = 4,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Range query over a :func:`write_spatial` dataset. The ``part_cell``
    IN-list prunes partitions (file-bbox pruning); the coordinate range
    filter pushes to the parquet scan (row-group pruning)."""
    x0, y0, x1, y1 = bbox
    gx0 = cells.np_grid_x(__import__("numpy").array([x0]), level)[0]
    gx1 = cells.np_grid_x(__import__("numpy").array([x1]), level)[0]
    gy0 = cells.np_grid_y(__import__("numpy").array([y0]), level)[0]
    gy1 = cells.np_grid_y(__import__("numpy").array([y1]), level)[0]
    wanted = [
        int(level * (1 << cells.CELL_L_SHIFT) + gx * (1 << cells.CELL_X_SHIFT) + gy)
        for gx in range(int(gx0), int(gx1) + 1)
        for gy in range(int(gy0), int(gy1) + 1)
    ]
    df = spark.read.parquet(path)
    return df.filter(F.col("part_cell").isin(wanted)).filter(
        (F.col(x) >= x0) & (F.col(x) <= x1) & (F.col(y) >= y0) & (F.col(y) <= y1)
    )
