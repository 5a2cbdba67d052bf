"""sedona_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reproduces the query semantics of Apache Sedona (reference snapshot at
/root/reference, studied in SURVEY.md) with an idiomatic Spark architecture:

* geometry = plain DataFrame columns (x/y doubles for points, packed
  ``array<double>`` rings for polygons, WKB ``binary`` for interop) — no UDT,
  no JVM extension (cf. reference ``GeometryUDT.scala`` which we deliberately
  do NOT port);
* spatial indexing = an int64 hierarchical lon/lat cell grid computed with
  pure Column arithmetic (whole-stage-codegen'd, zero Python in the hot
  path) — the columnar analog of ``Functions.java:1675 s2CellIDs`` /
  ``:1714 h3CellIDs``;
* spatial partitioning = hash shuffle on the cell id (replacing the
  reference's sampled KDB-tree/quadtree partitioners,
  ``core/spatialPartitioning/``) — data-independent, deterministic,
  resumable;
* joins = cell equi-joins + vectorized exact refine + replicate-dedup by
  reference point (semantics of ``core/joinJudgement/DuplicatesFilter.java``);
* the only Python on the hot path is Arrow-batched pandas UDFs for
  general-polygon tests and image tiling (numpy ufuncs, never per-row).
"""

from sedona_spark.cells import (
    cell_id,
    cell_of,
    cell_x,
    cell_y,
    cell_level,
    cell_parent,
    cover_bbox,
    grid_disk_cells,
    level_for_extent,
    CELL_L_SHIFT,
    CELL_X_SHIFT,
)
from sedona_spark.physical_sql import sql
from sedona_spark.session import get_spark
from sedona_spark.sql_registry import register

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "sql",
    "cell_id",
    "cell_of",
    "cell_x",
    "cell_y",
    "cell_level",
    "cell_parent",
    "cell_parent",
    "cover_bbox",
    "grid_disk_cells",
    "level_for_extent",
    "CELL_L_SHIFT",
    "CELL_X_SHIFT",
]


class SedonaContext:
    """Drop-in analog of the reference's Python entry point
    (``python/sedona/spark/SedonaContext.py:33-60``): users switching
    from the reference keep their two-line setup —
    ``SedonaContext.builder().getOrCreate()`` then
    ``SedonaContext.create(spark)`` — and get this engine's SQL surface
    registered instead of a JVM extension being injected."""

    @classmethod
    def create(cls, spark):
        """Register every ST_/RS_ SQL function on the session and return
        it (the reference injects its JVM extensions here; this engine
        only needs function registration — there is no UDT/serde)."""
        register(spark)
        return spark

    @classmethod
    def builder(cls):
        """A SparkSession builder preconfigured the way this engine's
        operators expect (Arrow enabled, AQE + skew-join on)."""
        from pyspark.sql import SparkSession

        return (
            SparkSession.builder
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
        )
