"""Distributed spatial joins: point-in-polygon and polygon-overlaps.

Reference semantics: ``JoinQuery.SpatialJoinQueryFlat``
(``core/spatialOperator/JoinQuery.java:164-298, 676-732``) — replicate each
geometry to every partition cell its envelope overlaps, per-partition
envelope-index probe, exact-predicate refine, then duplicate elimination by
reference point (``core/joinJudgement/DuplicatesFilter.java:46-71``,
``GeomUtils.java:359-382``).

Spark-first re-expression:

* replication  = ``explode(sequence(gx0,gx1)) × explode(sequence(gy0,gy1))``
  over the envelope's covering cells — pure Column math;
* partitioning = the hash shuffle of the cell equi-join itself (no custom
  partitioner; AQE handles skew/coalesce);
* refine       = envelope test (SQL) + exact kernel (rect: pure SQL;
  general polygon: ONE Arrow-batched pandas UDF);
* dedup        = emit a pair only from the cell containing the reference
  point (max of the two envelope mins) — a pure Column predicate, exactly
  ``GeomUtils.isDuplicate``'s rule re-expressed on the grid. Points occupy
  a single cell, so point-side joins are duplicate-free by construction
  (same shortcut as ``GeomUtils.java:361-364``).

Scale notes (100 TB posture): both inputs shuffle once, on an int64 key;
the zone side is usually small → Catalyst auto-broadcasts it, removing the
big side's shuffle entirely. No sampling, no driver-side tree build — layout
is closed-form from ``level``, which also makes checkpoint/resume sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark import cells
from sedona_spark.functions import st


def _explode_cover(
    df: DataFrame, level: int, xmin="xmin", ymin="ymin", xmax="xmax", ymax="ymax",
    cell_col: str = "cell",
) -> DataFrame:
    """Replicate each row to all cells its envelope covers (pure SQL)."""
    gx0, gx1, gy0, gy1 = cells.cover_bbox(
        F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax), level
    )
    return (
        df.withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
        .withColumn(cell_col, cells.cell_of(F.col("_gx"), F.col("_gy"), level))
        .drop("_gx", "_gy")
    )


def with_envelope(df: DataFrame, ring: str = "ring") -> DataFrame:
    """Materialize envelope columns from a packed ring (pure SQL)."""
    return df.select("*", *st.st_envelope_cols(F.col(ring)))


def pip_join(
    points: DataFrame,
    zones: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    ring: str = "ring",
    broadcast_zones: bool | None = None,
) -> DataFrame:
    """Join point rows to polygon rows whose polygon contains/covers them.

    ``points`` needs (x, y) columns; ``zones`` needs a packed ``ring``
    column (``array<double>``) — envelopes derived if absent. All other
    columns pass through (ensure disjoint names).

    predicate: 'contains' (interior only) or 'covers'/'intersects'
    (boundary counts) — reference boundary split,
    ``SpatialPredicateEvaluators.java:25-80``.
    """
    if "xmin" not in zones.columns:
        zones = with_envelope(zones, ring)
    zc = _explode_cover(zones, level)
    pc = points.withColumn("cell", cells.cell_id(F.col(x), F.col(y), level))
    if broadcast_zones is True:
        zc = F.broadcast(zc)

    j = pc.join(zc, "cell")
    # envelope prefilter (cheap, codegen'd) before the exact kernel
    j = j.filter(
        st.env_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col(x), F.col(y),
        )
    )
    cls = st.pip_class(F.col(ring), F.col(x), F.col(y))
    keep = cls == 2 if predicate == "contains" else cls >= 1
    return j.filter(keep).drop("cell", "xmin", "ymin", "xmax", "ymax")


def pip_join_rect(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    broadcast_zones: bool | None = None,
    salt: int = 0,
) -> DataFrame:
    """PIP join against axis-aligned rectangles (xmin..ymax columns) —
    the zcta510-style rectangle-window join of the reference fixtures
    (``test_point_join.py:35-37``). 100% JVM-side, zero Python.

    ``salt > 0`` enables the salted two-stage join for hot cells (a dense
    city cell at 10^12 rows): the big side adds a deterministic salt bucket
    ``pmod(hash(x, y), salt)``, the small side replicates each cover-cell
    row to every salt value, and the join key becomes (cell, salt) — the
    skew splitter that replaces the reference's sample-adaptive KDB-tree
    splits (``KDB.java``), composing with AQE's runtime skew-join."""
    zc = _explode_cover(rects, level)
    pc = points.withColumn("cell", cells.cell_id(F.col(x), F.col(y), level))
    join_keys = ["cell"]
    if salt > 0:
        pc = pc.withColumn("_salt", F.pmod(F.hash(F.col(x), F.col(y)), F.lit(salt)))
        zc = zc.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        join_keys = ["cell", "_salt"]
    if broadcast_zones is True:
        zc = F.broadcast(zc)
    j = pc.join(zc, join_keys)
    if salt > 0:
        j = j.drop("_salt")
    px, py = F.col(x), F.col(y)
    x0, y0, x1, y1 = F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
    if predicate == "contains":
        keep = (px > x0) & (px < x1) & (py > y0) & (py < y1)
    else:
        keep = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
    return j.filter(keep).drop("cell")


def pip_semi_join(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    id_col: str | None = None,
) -> DataFrame:
    """Points matching AT LEAST ONE rectangle zone (LeftSemi spatial join —
    reference ``BroadcastIndexJoinExec.semiJoin``, ``:155``). Output = the
    point rows, deduplicated by construction via left_semi on the matched
    id set.

    ``id_col`` names the unique point identity (defaults to the first
    column); semi/anti semantics are keyed on it, so it MUST be unique."""
    key = id_col or points.columns[0]
    matched = pip_join_rect(points, rects, predicate, level=level, x=x, y=y)
    # left_semi against the matched id set keeps each point row exactly once
    return points.join(matched.select(key).distinct(), key, "left_semi")


def pip_anti_join(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    id_col: str | None = None,
) -> DataFrame:
    """Points matching NO zone (LeftAnti spatial join). ``id_col`` as in
    :func:`pip_semi_join` — must be a unique point identity."""
    key = id_col or points.columns[0]
    matched = pip_join_rect(points, rects, predicate, level=level, x=x, y=y)
    return points.join(matched.select(key).distinct(), key, "left_anti")


def pip_join_multi(
    points: DataFrame,
    zones: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    geom: str = "geom",
) -> DataFrame:
    """PIP join against MULTI-RING geometries (polygons with holes,
    MultiPolygon): ``geom`` is ``array<array<double>>`` of packed rings,
    even-odd semantics. Same plan shape as :func:`pip_join` — cell
    equi-join + envelope prefilter + ONE Arrow-batched refine; the envelope
    is the min/max over all rings (flatten, pure SQL)."""
    if "xmin" not in zones.columns:
        zones = zones.select("*", *st.st_envelope_cols(F.flatten(F.col(geom))))
    zc = _explode_cover(zones, level)
    pc = points.withColumn("cell", cells.cell_id(F.col(x), F.col(y), level))
    j = pc.join(zc, "cell")
    j = j.filter(
        st.env_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col(x), F.col(y),
        )
    )
    cls = st.pip_class_multi(F.col(geom), F.col(x), F.col(y))
    keep = cls == 2 if predicate == "contains" else cls >= 1
    return j.filter(keep).drop("cell", "xmin", "ymin", "xmax", "ymax")


def pip_left_outer_join(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    id_col: str | None = None,
) -> DataFrame:
    """LeftOuter spatial join (``BroadcastIndexJoinExec.scala:62-66``):
    every point row survives; zone columns are NULL for points in no zone.

    Shape: the inner cell join finds matches (zone side broadcastable),
    then ONE left join of points against the match set on the unique point
    id — the stream-side outer completion the reference does per-partition,
    re-expressed relationally. ``id_col`` must be unique per point."""
    key = id_col or points.columns[0]
    zone_cols = [c for c in rects.columns if c not in ("xmin", "ymin", "xmax", "ymax")]
    matched = pip_join_rect(points, rects, predicate, level=level, x=x, y=y).select(
        key, *zone_cols
    )
    return points.join(matched, key, "left")


def pip_right_outer_join(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    x: str = "x",
    y: str = "y",
    id_col: str | None = None,
    zone_key: str | None = None,
) -> DataFrame:
    """RightOuter spatial join: every ZONE row survives; point columns are
    NULL for zones containing no point (the build-side outer completion of
    ``BroadcastIndexJoinExec.scala:62-66``)."""
    pkey = id_col or points.columns[0]
    zkey = zone_key or rects.columns[0]
    matched = pip_join_rect(points, rects, predicate, level=level, x=x, y=y).select(
        pkey, zkey
    )
    return rects.join(matched, zkey, "left")


def linestring_polygon_join(
    lines: DataFrame,
    zones: DataFrame,
    level: int = 7,
    line: str = "line",
    geom: str = "geom",
) -> DataFrame:
    """LineString × polygon INTERSECTS join with replicate-dedup — the
    line-fixture joins of ``SpatialJoinSuite.scala`` (LineStringRDD).

    Both sides replicate to envelope-cover cells; pairs deduplicate by the
    reference-point rule; refine = ONE Arrow-batched segment/PIP kernel."""
    lf = lines.select("*", *st.st_envelope_cols(F.col(line)))
    lf = lf.withColumnsRenamed(
        {"xmin": "_lxmin", "ymin": "_lymin", "xmax": "_lxmax", "ymax": "_lymax"}
    )
    rf = zones.select("*", *st.st_envelope_cols(F.flatten(F.col(geom))))
    rf = rf.withColumnsRenamed(
        {"xmin": "_rxmin", "ymin": "_rymin", "xmax": "_rxmax", "ymax": "_rymax"}
    )
    lc = _explode_cover(lf, level, "_lxmin", "_lymin", "_lxmax", "_lymax")
    rc = _explode_cover(rf, level, "_rxmin", "_rymin", "_rxmax", "_rymax")
    j = lc.join(rc, "cell")
    j = j.filter(
        st.env_intersects(
            F.col("_lxmin"), F.col("_lymin"), F.col("_lxmax"), F.col("_lymax"),
            F.col("_rxmin"), F.col("_rymin"), F.col("_rxmax"), F.col("_rymax"),
        )
    )
    ref_x = F.greatest(F.col("_lxmin"), F.col("_rxmin"))
    ref_y = F.greatest(F.col("_lymin"), F.col("_rymin"))
    j = j.filter(F.col("cell") == cells.cell_id(ref_x, ref_y, level))
    j = j.filter(st.st_intersects_line_polygon(F.col(line), F.col(geom)))
    return j.drop("cell", "_lxmin", "_lymin", "_lxmax", "_lymax",
                  "_rxmin", "_rymin", "_rxmax", "_rymax")


def polygon_predicate_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str,
    level: int = 7,
    left_ring: str = "l_ring",
    right_ring: str = "r_ring",
) -> DataFrame:
    """Polygon×polygon join under ANY areal DE-9IM predicate (touches /
    overlaps / st_equals / within / contains / covers / covered_by /
    intersects) — the 28-variant join-condition surface of
    ``SpatialJoinSuite.scala:42-75``. Candidate generation is identical to
    :func:`polygon_overlap_join` (every non-disjoint predicate implies
    envelope overlap); refine computes the four primitive flags once and
    derives the requested predicate as a Column expression."""
    lf = with_envelope(left.withColumnRenamed(left_ring, "_lring"), "_lring")
    lf = lf.withColumnsRenamed(
        {"xmin": "_lxmin", "ymin": "_lymin", "xmax": "_lxmax", "ymax": "_lymax"}
    )
    rf = with_envelope(right.withColumnRenamed(right_ring, "_rring"), "_rring")
    rf = rf.withColumnsRenamed(
        {"xmin": "_rxmin", "ymin": "_rymin", "xmax": "_rxmax", "ymax": "_rymax"}
    )
    lc = _explode_cover(lf, level, "_lxmin", "_lymin", "_lxmax", "_lymax")
    rc = _explode_cover(rf, level, "_rxmin", "_rymin", "_rxmax", "_rymax")
    j = lc.join(rc, "cell")
    j = j.filter(
        st.env_intersects(
            F.col("_lxmin"), F.col("_lymin"), F.col("_lxmax"), F.col("_lymax"),
            F.col("_rxmin"), F.col("_rymin"), F.col("_rxmax"), F.col("_rymax"),
        )
    )
    ref_x = F.greatest(F.col("_lxmin"), F.col("_rxmin"))
    ref_y = F.greatest(F.col("_lymin"), F.col("_rymin"))
    j = j.filter(F.col("cell") == cells.cell_id(ref_x, ref_y, level))
    flags = st.st_relate_flags(F.col("_lring"), F.col("_rring"))
    j = j.withColumn("_flags", flags)
    preds = st.st_predicates_from_flags(F.col("_flags"))
    if predicate not in preds:
        raise ValueError(f"unsupported join predicate {predicate!r}")
    j = j.filter(preds[predicate])
    return (
        j.drop("cell", "_flags", "_lxmin", "_lymin", "_lxmax", "_lymax",
               "_rxmin", "_rymin", "_rxmax", "_rymax")
        .withColumnRenamed("_lring", left_ring)
        .withColumnRenamed("_rring", right_ring)
    )


def polygon_overlap_join(
    left: DataFrame,
    right: DataFrame,
    level: int = 7,
    left_ring: str = "l_ring",
    right_ring: str = "r_ring",
) -> DataFrame:
    """Polygon×polygon INTERSECTS join with replicate-dedup.

    Both sides replicate to their envelope-cover cells; a matched pair is
    emitted only from the cell that contains the pair's reference point
    (min corner of the envelope intersection) — the exact dedup rule of
    ``DuplicatesFilter.java:46-71`` as a Column predicate, no second pass.
    """
    lf = with_envelope(left.withColumnRenamed(left_ring, "_lring"), "_lring")
    lf = lf.withColumnsRenamed(
        {"xmin": "_lxmin", "ymin": "_lymin", "xmax": "_lxmax", "ymax": "_lymax"}
    )
    rf = with_envelope(right.withColumnRenamed(right_ring, "_rring"), "_rring")
    rf = rf.withColumnsRenamed(
        {"xmin": "_rxmin", "ymin": "_rymin", "xmax": "_rxmax", "ymax": "_rymax"}
    )
    lc = _explode_cover(lf, level, "_lxmin", "_lymin", "_lxmax", "_lymax")
    rc = _explode_cover(rf, level, "_rxmin", "_rymin", "_rxmax", "_rymax")

    j = lc.join(rc, "cell")
    j = j.filter(
        st.env_intersects(
            F.col("_lxmin"), F.col("_lymin"), F.col("_lxmax"), F.col("_lymax"),
            F.col("_rxmin"), F.col("_rymin"), F.col("_rxmax"), F.col("_rymax"),
        )
    )
    # reference-point dedup (GeomUtils.isDuplicate:359-382)
    ref_x = F.greatest(F.col("_lxmin"), F.col("_rxmin"))
    ref_y = F.greatest(F.col("_lymin"), F.col("_rymin"))
    j = j.filter(F.col("cell") == cells.cell_id(ref_x, ref_y, level))
    j = j.filter(st.st_intersects_polygons(F.col("_lring"), F.col("_rring")))
    return (
        j.drop("cell", "_lxmin", "_lymin", "_lxmax", "_lymax",
               "_rxmin", "_rymin", "_rxmax", "_rymax")
        .withColumnRenamed("_lring", left_ring)
        .withColumnRenamed("_rring", right_ring)
    )


def pip_join_compact(
    points: DataFrame,
    rects: DataFrame,
    predicate: str = "covers",
    level: int = 9,
    min_level: int = 3,
    x: str = "x",
    y: str = "y",
    broadcast_cover: bool | None = None,
) -> DataFrame:
    """PIP join via COMPACTED mixed-level covers — the S2CellUnion join
    pattern: each rectangle's fine-level cover is normalized per zone
    (complete 2×2 sibling groups promoted recursively), so interior area
    is covered by a few coarse cells and only the boundary stays fine —
    O(perimeter) cover rows instead of O(area). The point side joins once
    per cover LEVEL (ancestor cell at that level == cover cell); the set
    of live levels is metadata-sized (≤ level − min_level + 1 values, the
    only driver-side state). Exact refine matches :func:`pip_join_rect`,
    so the two paths are interchangeable — and oracle-checked equal.

    ``broadcast_cover`` mirrors ``pip_join``'s knob: True forces a
    broadcast of each per-level cover slice (right for the
    zone-side-small contract), False forces the shuffle equi-join (a
    large zone table must NOT be collected to the driver), None lets AQE
    decide from the compacted cover's actual size."""
    cover = _explode_cover(rects, level)
    key_cols = [c for c in rects.columns]
    cur = (
        cover.select(*key_cols, "cell").distinct()
        .withColumn("lvl", F.lit(level))
    )
    frozen = None
    for lv in range(int(level), int(min_level), -1):
        active = cur.filter(F.col("lvl") == lv)
        parent = cells.cell_parent(F.col("cell"), lv, lv - 1)
        groups = (
            active.withColumn("_p", parent)
            .groupBy(*key_cols, "_p")
            .agg(F.count("*").alias("_n"),
                 F.collect_list("cell").alias("_members"))
        )
        promoted = groups.filter(F.col("_n") == 4).select(
            *key_cols, F.col("_p").alias("cell"),
            F.lit(lv - 1).alias("lvl"),
        )
        kept = groups.filter(F.col("_n") < 4).select(
            *key_cols, F.explode("_members").alias("cell"),
            F.lit(lv).alias("lvl"),
        )
        frozen = kept if frozen is None else frozen.unionByName(kept)
        cur = promoted.localCheckpoint(eager=False)
    compacted = cur if frozen is None else cur.unionByName(frozen)
    compacted = compacted.localCheckpoint(eager=True)
    levels = [r["lvl"] for r in compacted.select("lvl").distinct().collect()]

    # ONE pass over the point side: explode each point to its ancestor
    # cell at every live level and equi-join once — cell ids embed their
    # level, so a single join on "cell" replaces the per-level scan +
    # union (the point table was re-scanned once per live level, ~6
    # stages of pure overhead; candidates are identical because the
    # compacted cover partitions each zone's area disjointly).
    home = cells.cell_id(F.col(x), F.col(y), level)
    lvls = sorted(levels)
    pc = (
        points.withColumn("_home", home)
        .withColumn("_lvl", F.explode(F.array(*[F.lit(lv) for lv in lvls])))
    )
    d = F.lit(level) - F.col("_lvl")
    pw = F.pow(F.lit(2.0), d.cast("double"))
    px_ = F.floor(cells.cell_x(F.col("_home")) / pw).cast("long")
    py_ = F.floor(cells.cell_y(F.col("_home")) / pw).cast("long")
    anc = (F.col("_lvl").cast("long") * F.lit(cells._L_MULT)
           + px_ * F.lit(cells._X_MULT) + py_).cast("long")
    pc = pc.withColumn("cell", anc)
    cov = compacted.drop("lvl")
    if broadcast_cover is True:
        cov = F.broadcast(cov)
    elif broadcast_cover is False:
        cov = cov.hint("shuffle_hash")
    j = pc.join(cov, "cell").drop("cell", "_home", "_lvl")
    px, py = F.col(x), F.col(y)
    x0, y0 = F.col("xmin"), F.col("ymin")
    x1, y1 = F.col("xmax"), F.col("ymax")
    if predicate == "contains":
        keep = (px > x0) & (px < x1) & (py > y0) & (py < y1)
    else:
        keep = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
    return j.filter(keep)
