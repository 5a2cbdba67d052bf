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


def holed_zones_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-with-hole zones: shell = nation rect, hole = the centered
    half-extent rect. ``geom`` = array of packed rings (even-odd)."""
    z = zones_from_nation(spark, sf_dir)
    cx, cy, hx, hy = F.col("zcx"), F.col("zcy"), F.col("hx"), F.col("hy")
    x0, x1, y0, y1 = cx - hx, cx + hx, cy - hy, cy + hy
    ix0, ix1 = cx - hx * F.lit(0.5), cx + hx * F.lit(0.5)
    iy0, iy1 = cy - hy * F.lit(0.5), cy + hy * F.lit(0.5)
    shell = F.array(x0, y0, x1, y0, x1, y1, x0, y1)
    hole = F.array(ix0, iy0, ix1, iy0, ix1, iy1, ix0, iy1)
    return z.select("n_nationkey", F.array(shell, hole).alias("geom"))


def multipolygon_zones_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiPolygon zones: the nation rect plus a disjoint translated copy
    at +3h..+5h on both axes."""
    z = zones_from_nation(spark, sf_dir)
    cx, cy, hx, hy = F.col("zcx"), F.col("zcy"), F.col("hx"), F.col("hy")
    a = F.array(cx - hx, cy - hy, cx + hx, cy - hy,
                cx + hx, cy + hy, cx - hx, cy + hy)
    bx0, bx1 = cx + F.lit(3.0) * hx, cx + F.lit(5.0) * hx
    by0, by1 = cy + F.lit(3.0) * hy, cy + F.lit(5.0) * hy
    b = F.array(bx0, by0, bx1, by0, bx1, by1, bx0, by1)
    return z.select("n_nationkey", F.array(a, b).alias("geom"))


def segments_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 2-point LineString per event: (x, y) → (x+3, y+2)."""
    p = points_from_events(spark, sf_dir)
    line = F.array(F.col("x"), F.col("y"),
                   F.col("x") + F.lit(3.0), F.col("y") + F.lit(2.0))
    return p.select("event_id", line.alias("line"))


def predicate_pairs_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(A, B) polygon-pair fixtures exercising every areal DE-9IM relation
    exactly: B is derived from A by ``n_nationkey % 6`` —
    0 equals · 1 edge-touch · 2 overlap · 3 B-within-A · 4 disjoint ·
    5 corner-touch. Shared edges/corners are built from the IDENTICAL
    float expressions on both engines, so boundary contact is exact."""
    z = zones_from_nation(spark, sf_dir)
    cx, cy, hx, hy = F.col("zcx"), F.col("zcy"), F.col("hx"), F.col("hy")
    m = F.col("n_nationkey") % 6
    ax0, ax1, ay0, ay1 = cx - hx, cx + hx, cy - hy, cy + hy
    bx0 = (
        F.when(m == 0, ax0).when(m == 1, cx + hx).when(m == 2, cx)
        .when(m == 3, cx - hx * F.lit(0.5)).when(m == 4, cx + F.lit(3.0) * hx)
        .otherwise(cx + hx)
    )
    bx1 = (
        F.when(m == 0, ax1).when(m == 1, cx + F.lit(3.0) * hx)
        .when(m == 2, cx + F.lit(2.0) * hx).when(m == 3, cx + hx * F.lit(0.5))
        .when(m == 4, cx + F.lit(5.0) * hx).otherwise(cx + F.lit(3.0) * hx)
    )
    by0 = (
        F.when(m == 0, ay0).when(m == 1, cy - hy).when(m == 2, cy - hy)
        .when(m == 3, cy - hy * F.lit(0.5)).when(m == 4, cy - hy)
        .otherwise(cy + hy)
    )
    by1 = (
        F.when(m == 0, ay1).when(m == 1, cy + hy).when(m == 2, cy + hy)
        .when(m == 3, cy + hy * F.lit(0.5)).when(m == 4, cy + hy)
        .otherwise(cy + F.lit(3.0) * hy)
    )
    ring_a = F.array(ax0, ay0, ax1, ay0, ax1, ay1, ax0, ay1)
    ring_b = F.array(bx0, by0, bx1, by0, bx1, by1, bx0, by1)
    return z.select("n_nationkey", ring_a.alias("ring_a"), ring_b.alias("ring_b"))


# SQL twin of predicate_pairs_from_nation's B-corner derivation
SQL_PRED_B = (
    "case n_nationkey % 6 when 0 then zcx - hx when 1 then zcx + hx "
    "when 2 then zcx when 3 then zcx - hx * 5e-1 when 4 then zcx + 3e0 * hx "
    "else zcx + hx end as bx0, "
    "case n_nationkey % 6 when 0 then zcx + hx when 1 then zcx + 3e0 * hx "
    "when 2 then zcx + 2e0 * hx when 3 then zcx + hx * 5e-1 "
    "when 4 then zcx + 5e0 * hx else zcx + 3e0 * hx end as bx1, "
    "case n_nationkey % 6 when 0 then zcy - hy when 1 then zcy - hy "
    "when 2 then zcy - hy when 3 then zcy - hy * 5e-1 when 4 then zcy - hy "
    "else zcy + hy end as by0, "
    "case n_nationkey % 6 when 0 then zcy + hy when 1 then zcy + hy "
    "when 2 then zcy + hy when 3 then zcy + hy * 5e-1 when 4 then zcy + hy "
    "else zcy + 3e0 * hy end as by1"
)


def l_shape_pairs_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCAVE predicate fixtures (r3): A = L-shaped hexagon — the nation
    rect minus its open top-right quadrant, reflex vertex at the zone
    center — and B = a rect chosen by ``n_nationkey % 6``:

    0 L-within-B · 1 notch-fill touch (shares the two reflex edges) ·
    2 center square overlapping across the reflex corner · 3 B inside the
    bottom arm · 4 B strictly inside the NOTCH (bbox overlap, geometry
    disjoint — the concave signature case) · 5 edge touch on the lower
    right side. All case coordinates are the identical float expressions
    in both engines, so boundary contact is exact."""
    z = zones_from_nation(spark, sf_dir)
    cx, cy, hx, hy = F.col("zcx"), F.col("zcy"), F.col("hx"), F.col("hy")
    ax0, ax1, ay0, ay1 = cx - hx, cx + hx, cy - hy, cy + hy
    ring_a = F.array(ax0, ay0, ax1, ay0, ax1, cy, cx, cy, cx, ay1, ax0, ay1)
    m = F.col("n_nationkey") % 6
    h = F.lit(0.5)
    bx0 = (
        F.when(m == 0, ax0 - hx * h).when(m == 1, cx)
        .when(m == 2, cx - hx * h).when(m == 3, ax0 + hx * F.lit(0.3))
        .when(m == 4, cx + hx * F.lit(0.3)).otherwise(ax1)
    )
    bx1 = (
        F.when(m == 0, ax1 + hx * h).when(m == 1, ax1)
        .when(m == 2, cx + hx * h).when(m == 3, ax0 + hx * F.lit(0.8))
        .when(m == 4, cx + hx * F.lit(0.7)).otherwise(ax1 + F.lit(2.0) * hx)
    )
    by0 = (
        F.when(m == 0, ay0 - hy * h).when(m == 1, cy)
        .when(m == 2, cy - hy * h).when(m == 3, ay0 + hy * F.lit(0.3))
        .when(m == 4, cy + hy * F.lit(0.3)).otherwise(ay0 + hy * F.lit(0.1))
    )
    by1 = (
        F.when(m == 0, ay1 + hy * h).when(m == 1, ay1)
        .when(m == 2, cy + hy * h).when(m == 3, ay0 + hy * F.lit(0.8))
        .when(m == 4, cy + hy * F.lit(0.7)).otherwise(cy - hy * F.lit(0.1))
    )
    ring_b = F.array(bx0, by0, bx1, by0, bx1, by1, bx0, by1)
    return z.select("n_nationkey", ring_a.alias("ring_a"), ring_b.alias("ring_b"))


# SQL twin of l_shape_pairs_from_nation's B-rect derivation
SQL_LSHAPE_B = (
    "case n_nationkey % 6 when 0 then zcx - hx - hx * 5e-1 when 1 then zcx "
    "when 2 then zcx - hx * 5e-1 when 3 then zcx - hx + hx * 3e-1 "
    "when 4 then zcx + hx * 3e-1 else zcx + hx end as bx0, "
    "case n_nationkey % 6 when 0 then zcx + hx + hx * 5e-1 when 1 then zcx + hx "
    "when 2 then zcx + hx * 5e-1 when 3 then zcx - hx + hx * 8e-1 "
    "when 4 then zcx + hx * 7e-1 else zcx + hx + 2e0 * hx end as bx1, "
    "case n_nationkey % 6 when 0 then zcy - hy - hy * 5e-1 when 1 then zcy "
    "when 2 then zcy - hy * 5e-1 when 3 then zcy - hy + hy * 3e-1 "
    "when 4 then zcy + hy * 3e-1 else zcy - hy + hy * 1e-1 end as by0, "
    "case n_nationkey % 6 when 0 then zcy + hy + hy * 5e-1 when 1 then zcy + hy "
    "when 2 then zcy + hy * 5e-1 when 3 then zcy - hy + hy * 8e-1 "
    "when 4 then zcy + hy * 7e-1 else zcy - hy * 1e-1 end as by1"
)


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
