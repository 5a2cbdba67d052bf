"""Deterministic geometry derivation from the driver testdata tables.

The sandbox's correctness gate runs each Spark query against a DuckDB oracle
over the same parquet tables, so every derived coordinate must be
bit-reproducible in BOTH engines. Rules:

* integer key → lattice index via multiply+mod (exact int64 arithmetic);
* index → degrees via ``(idx + 0.5) / N * span - offset`` — identical IEEE
  double ops in identical order on both sides ⇒ bit-identical doubles;
* points sit at centers of a 4096×2048 lattice, zone edges sit off-lattice
  (fractional offsets) so no point is ever within ~1e-3° of a boundary —
  float-roundoff can never flip a predicate.

Each Spark builder below has a ``SQL_*`` twin used by ``oracle_sql()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# lattice constants (shared by Spark + SQL text)
_PX = "((event_id * 2654435761) % 4096 + 5e-1) / 4096e0 * 360e0 - 180e0"
_PY = "((event_id * 2246822519) % 2048 + 5e-1) / 2048e0 * 180e0 - 90e0"

_ZCX = "((cast(n_nationkey as bigint) * 1013904223) % 4096 + 5e-1) / 4096e0 * 360e0 - 180e0"
_ZCY = "((cast(n_nationkey as bigint) * 69069) % 2048 + 5e-1) / 2048e0 * 180e0 - 90e0"
_ZHX = "(2e0 + cast(n_nationkey as bigint) % 5 + 12345e-7)"
_ZHY = "(1e0 + cast(n_nationkey as bigint) % 3 + 17e-4)"
_ZR = "(15e-1 + cast(n_nationkey as bigint) % 4 + 231e-5)"

_RCX = "((cast(r_regionkey as bigint) * 2654435761) % 4096 + 5e-1) / 4096e0 * 360e0 - 180e0"
_RCY = "((cast(r_regionkey as bigint) * 40503) % 2048 + 5e-1) / 2048e0 * 180e0 - 90e0"
_RHX = "(3e0 + cast(r_regionkey as bigint) % 4 + 19e-4)"
_RHY = "(2e0 + cast(r_regionkey as bigint) % 2 + 23e-4)"

SQL_POINTS = f"select event_id, {_PX} as x, {_PY} as y from events"
SQL_ZONES = (
    f"select n_nationkey, {_ZCX} as zcx, {_ZCY} as zcy, "
    f"{_ZHX} as hx, {_ZHY} as hy, {_ZR} as r from nation"
)
SQL_REGION_RECTS = (
    f"select r_regionkey, {_RCX} as rcx, {_RCY} as rcy, "
    f"{_RHX} as rhx, {_RHY} as rhy from region"
)


def points_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, x, y) — one deterministic lattice point per event row."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select("event_id", F.expr(_PX).alias("x"), F.expr(_PY).alias("y"))


def zones_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nationkey, zcx, zcy, hx, hy, r) — zone center + rect half-extents
    + distance-join radius, all off-lattice."""
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return na.select(
        "n_nationkey",
        F.expr(_ZCX).alias("zcx"),
        F.expr(_ZCY).alias("zcy"),
        F.expr(_ZHX).alias("hx"),
        F.expr(_ZHY).alias("hy"),
        F.expr(_ZR).alias("r"),
    )


def rect_zones_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle zone relation with envelope + packed ring columns."""
    z = zones_from_nation(spark, sf_dir)
    x0 = F.col("zcx") - F.col("hx")
    x1 = F.col("zcx") + F.col("hx")
    y0 = F.col("zcy") - F.col("hy")
    y1 = F.col("zcy") + F.col("hy")
    return z.select(
        "n_nationkey",
        x0.alias("xmin"),
        y0.alias("ymin"),
        x1.alias("xmax"),
        y1.alias("ymax"),
        F.array(x0, y0, x1, y0, x1, y1, x0, y1).alias("ring"),
    )


def diamond_zones_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diamond (rotated-square) polygon zones — a general (non-rect) ring
    whose PIP is still expressible in ANSI SQL as
    ``|dx|/hx + |dy|/hy <= 1`` for the oracle."""
    z = zones_from_nation(spark, sf_dir)
    cx, cy, hx, hy = F.col("zcx"), F.col("zcy"), F.col("hx"), F.col("hy")
    ring = F.array(cx - hx, cy, cx, cy - hy, cx + hx, cy, cx, cy + hy)
    return z.select("n_nationkey", ring.alias("ring"))


def rects_from_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    re = spark.read.parquet(f"{sf_dir}/region.parquet")
    d = re.select(
        "r_regionkey",
        F.expr(_RCX).alias("rcx"),
        F.expr(_RCY).alias("rcy"),
        F.expr(_RHX).alias("rhx"),
        F.expr(_RHY).alias("rhy"),
    )
    x0 = F.col("rcx") - F.col("rhx")
    x1 = F.col("rcx") + F.col("rhx")
    y0 = F.col("rcy") - F.col("rhy")
    y1 = F.col("rcy") + F.col("rhy")
    return d.select(
        "r_regionkey",
        F.array(x0, y0, x1, y0, x1, y1, x0, y1).alias("r_ring"),
    )
