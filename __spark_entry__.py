"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL twin. Geometry is
derived deterministically from the testdata tables
(``sedona_spark/sources/testdata.py``) so both engines compute bit-identical
coordinates; all outputs are ids/ints/strings (hash-stable), except where a
measure column is itself bit-deterministic (min/max of identically derived
doubles).

Operators whose exact values are not SQL-expressible (xxhash64 LSH banding,
SimHash sign votes, image decode) are registered without an oracle → the
driver records a rows-only check, as specified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sedona_spark import cells
from sedona_spark.operators import (
    distance_join,
    knn_join,
    pip_join,
    pip_join_rect,
    polygon_overlap_join,
    range_query,
)
from sedona_spark.operators.tile import tile_assign
from sedona_spark.pipeline.ann import cosine_topk_bruteforce, embedding_near_dup_pairs
from sedona_spark.pipeline.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    simhash_near_dup_pairs,
    word_ngrams,
)
from sedona_spark.pipeline.text import (
    doc_fingerprint,
    language_id,
    quality_stats,
)
from sedona_spark.functions.raster import rs_decode_stats, rs_tile_explode
from sedona_spark.sources.images import images_from_part
from sedona_spark.sources.testdata import (
    SQL_POINTS,
    SQL_REGION_RECTS,
    SQL_ZONES,
    diamond_zones_from_nation,
    points_from_events,
    rect_zones_from_nation,
    rects_from_region,
    zones_from_nation,
)

# ---------------------------------------------------------------------------
# spatial queries
# ---------------------------------------------------------------------------

_WIN = (-30.0, -20.0, 10.0, 25.0)  # range-query window (x0, y0, x1, y1)
_KNN_K = 5
_LEVEL = 6


def q_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir)
    x0, y0, x1, y1 = _WIN
    ring = [x0, y0, x1, y0, x1, y1, x0, y1]
    return range_query(pts, ring, "covers").select("event_id")


def q_pip_rect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    out = pip_join_rect(pts, zones, "covers", level=_LEVEL)
    return out.select("event_id", "n_nationkey")


def q_pip_poly_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir)
    zones = diamond_zones_from_nation(spark, sf_dir)
    out = pip_join(pts, zones, "covers", level=_LEVEL)
    return out.select("event_id", "n_nationkey")


def q_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir)
    z = zones_from_nation(spark, sf_dir)
    # per-zone radius: expand by the max radius, refine per-row (the
    # expression-bound-to-one-side case of DistanceJoinExec.scala:30-42)
    centers = z.select("n_nationkey", F.col("zcx").alias("bx"),
                       F.col("zcy").alias("by"), "r")
    out = distance_join(pts, centers, r=5.51, level=_LEVEL)  # max r = 4.5+1.00231
    dx = F.col("x") - F.col("bx")
    dy = F.col("y") - F.col("by")
    d2 = dx * dx + dy * dy
    return out.filter(d2 <= F.col("r") * F.col("r")).select("event_id", "n_nationkey")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir).withColumnsRenamed(
        {"x": "ox", "y": "oy"}
    )
    qs = zones_from_nation(spark, sf_dir).select(
        "n_nationkey", F.col("zcx").alias("qx"), F.col("zcy").alias("qy")
    )
    out = knn_join(
        qs, pts, k=_KNN_K, level=_LEVEL,
        query_id="n_nationkey", qx="qx", qy="qy",
    )
    return out.select(
        "n_nationkey", "event_id", F.col("knn_rank").cast("long").alias("knn_rank")
    )


def q_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join as pip_rect_join but through the salted two-stage path
    (skew splitter) — must produce the identical pair set."""
    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    out = pip_join_rect(pts, zones, "covers", level=_LEVEL, salt=4)
    return out.select("event_id", "n_nationkey")


def q_distance_join_meters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic distance join (meters; haversine refine, per-row
    latitude-adjusted disk expansion — JoinedGeometry.scala parity)."""
    from sedona_spark.operators.distance_geo import distance_join_meters

    pts = points_from_events(spark, sf_dir).withColumnsRenamed(
        {"x": "lon", "y": "lat"}
    )
    z = zones_from_nation(spark, sf_dir).select(
        "n_nationkey", F.col("zcx").alias("blon"), F.col("zcy").alias("blat")
    )
    out = distance_join_meters(pts, z, r_m=300000.0, level=7)
    return out.select("event_id", "n_nationkey")


def q_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sedona_spark.operators import knn_query

    pts = points_from_events(spark, sf_dir)
    out = knn_query(pts, 0.123, 0.456, 10, tiebreak="event_id")
    return out.select("event_id")


def q_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = rect_zones_from_nation(spark, sf_dir).select(
        "n_nationkey", F.col("ring").alias("l_ring")
    )
    b = rects_from_region(spark, sf_dir)
    out = polygon_overlap_join(a, b, level=4, left_ring="l_ring", right_ring="r_ring")
    return out.select("n_nationkey", "r_regionkey")


def q_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountByKey join (JoinQuery.java:116-134): per-zone match counts."""
    from sedona_spark.operators import join_count_by_key

    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    return join_count_by_key(pts, zones, "n_nationkey", level=_LEVEL)


def q_collect_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-flat GroupByKey join (JoinQuery.java:97-114): per-zone sorted
    match lists (as a string for engine-portable hashing)."""
    from sedona_spark.operators import join_collect_by_key

    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    out = join_collect_by_key(pts, zones, "n_nationkey", "event_id", level=_LEVEL)
    return out.select(
        "n_nationkey", F.concat_ws(",", F.col("matches")).alias("match_ids")
    )


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RS_ZonalStats analog over points (integer sums: hash-stable)."""
    from sedona_spark.operators import zonal_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    pts = points_from_events(spark, sf_dir).join(ev, "event_id")
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    return zonal_stats(pts, zones, "n_nationkey", "user_id", level=_LEVEL)


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_DBSCAN analog (DBSCAN.scala:60-68); cluster = min core id of the
    component (deterministic). Oracle: recursive-CTE transitive closure
    over the core-core eps-graph — full value parity, not rows-only."""
    from sedona_spark.operators import dbscan

    pts = points_from_events(spark, sf_dir)
    return dbscan(pts, eps=2.0, min_pts=3, id_col="event_id", level=7).select(
        "event_id", F.col("cluster").cast("long").alias("cluster")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftSemi spatial join (BroadcastIndexJoinExec.scala:155)."""
    from sedona_spark.operators.spatial_join import pip_semi_join

    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    return pip_semi_join(pts, zones, "covers", level=_LEVEL).select("event_id")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftAnti spatial join."""
    from sedona_spark.operators.spatial_join import pip_anti_join

    pts = points_from_events(spark, sf_dir)
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    return pip_anti_join(pts, zones, "covers", level=_LEVEL).select("event_id")


def q_st_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area / ST_Perimeter / ST_Centroid over zone rectangles — pure
    higher-order-function folds (Functions.java measure analogs). Exact
    IEEE arithmetic both sides (no trig)."""
    from sedona_spark.functions.st_measures import st_area, st_centroid, st_perimeter

    z = rect_zones_from_nation(spark, sf_dir)
    cx, cy = st_centroid(F.col("ring"))
    return z.select(
        "n_nationkey",
        st_area(F.col("ring")).alias("area"),
        st_perimeter(F.col("ring")).alias("perimeter"),
        cx.alias("cx"),
        cy.alias("cy"),
    )


def q_distance_sphere_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine top-20 (ST_DistanceSphere + TakeOrdered); meters rounded
    to 3 decimals — JVM libm vs DuckDB libm agree far beyond that."""
    from sedona_spark.functions.st_measures import st_distance_sphere

    pts = points_from_events(spark, sf_dir)
    d = st_distance_sphere(F.col("x"), F.col("y"), F.lit(12.5), F.lit(47.3))
    return (
        pts.withColumn("dist_m", F.round(d, 3))
        .orderBy(F.col("dist_m").asc(), F.col("event_id").asc())
        .limit(20)
        .select("event_id", "dist_m")
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency (token-counting at
    corpus scale: explode → count → top-k)."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank_n", F.row_number().over(w))
        .filter(F.col("rank_n") <= 100)
        .select("token", "n", "rank_n")
    )


def q_hotspot_gstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord G* hotspots (GetisOrd.scala analog). Aggregation-order-
    dependent floats (stddev) → rows-only check; pytest holds the numpy
    oracle."""
    from sedona_spark.operators.hotspot import getis_ord_gstar

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")
    pts = points_from_events(spark, sf_dir).join(ev, "event_id")
    return getis_ord_gstar(pts, radius=3.0, value_col="value",
                           id_col="event_id", level=7)


def q_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalOutlierFactor (LocalOutlierFactor.scala analog) — kNN-join
    composition; float densities aggregation-order-dependent → rows-only."""
    from sedona_spark.operators.outlier import local_outlier_factor

    pts = points_from_events(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    return local_outlier_factor(pts, k=5, level=7)


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I (Moran.scala analog) — rows-only (float stat)."""
    from sedona_spark.operators.autocorrelation import morans_i

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")
    pts = points_from_events(spark, sf_dir).join(ev, "event_id")
    return morans_i(pts, radius=3.0, value_col="value", id_col="event_id", level=7)


def q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_events(spark, sf_dir)
    return (
        pts.withColumn("cell", cells.cell_id(F.col("x"), F.col("y"), 8))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def q_envelope_aggr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Envelope_Aggr analog (AggregateFunctions.scala:127): pure min/max."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "event_type")
    pts = points_from_events(spark, sf_dir).join(ev, "event_id")
    return pts.groupBy("event_type").agg(
        F.min("x").alias("xmin"),
        F.min("y").alias("ymin"),
        F.max("x").alias("xmax"),
        F.max("y").alias("ymax"),
        F.count(F.lit(1)).alias("n"),
    )


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    imgs = part.select(
        F.col("p_partkey").cast("long").alias("pk"),
        (F.lit(32) + (F.col("p_partkey") % 3) * 16).cast("int").alias("w"),
        (F.lit(32) + (F.col("p_partkey") % 5) * 16).cast("int").alias("h"),
        (((F.col("p_partkey") * 2654435761) % 1000 + 0.5) / 10.0).alias("lon"),
        (((F.col("p_partkey") * 2246822519) % 1000 + 0.5) / 10.0 - 90.0).alias("lat"),
    )
    out = tile_assign(imgs, 16, 16, level=10, span_lon=0.05, span_lat=0.05)
    return out.select(
        "pk",
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        "tile_cell",
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", *quality_stats(F.col("text")))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", language_id(F.col("text")))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", doc_fingerprint(F.col("text")))


def q_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard of id-adjacent doc pairs (exact n-gram similarity
    primitive; LSH supplies candidates at scale)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = docs.select("doc_id", word_ngrams(F.col("text"), 1).alias("grams"))
    a = g.withColumnsRenamed({"doc_id": "id_a", "grams": "g_a"})
    b = g.select((F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b"),
                 F.col("grams").alias("g_b"))
    j = a.join(b, "id_a")
    return j.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("g_a", "g_b")).cast("long").alias("inter_size"),
        F.size(F.array_union("g_a", "g_b")).cast("long").alias("union_size"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    out = cosine_topk_bruteforce(emb, [float(v) for v in qvec], 10)
    w = F.row_number().over(
        Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    )
    return out.select("vec_id", w.alias("rank_n"))


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_dup_pairs(emb, threshold=0.5, block_col="label")
    return out.select("id_a", "id_b")


# rows-only checks (values not ANSI-SQL-expressible)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup_pairs(docs, threshold=0.5, num_hashes=32, bands=8)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dup_pairs(docs, max_hamming=3)


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = images_from_part(spark, sf_dir)
    return rs_decode_stats(imgs)


def q_tile_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = images_from_part(spark, sf_dir)
    t = rs_tile_explode(imgs, 16, 16)
    return t.select("image_id", "tile_x", "tile_y", "tile_w", "tile_h",
                    F.length("tile_bytes").cast("long").alias("n_bytes"))


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial PIP join of derived points × zones at sf0.001."""
    return q_pip_rect_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "range_query": q_range_query,
        "pip_rect_join": q_pip_rect_join,
        "pip_poly_join": q_pip_poly_join,
        "distance_join": q_distance_join,
        "pip_join_salted": q_pip_join_salted,
        "distance_join_meters": q_distance_join_meters,
        "knn_join": q_knn_join,
        "knn_query": q_knn_query,
        "overlap_join": q_overlap_join,
        "count_by_key": q_count_by_key,
        "collect_by_key": q_collect_by_key,
        "zonal_stats": q_zonal_stats,
        "dbscan": q_dbscan,
        "hotspot_gstar": q_hotspot_gstar,
        "lof": q_lof,
        "morans_i": q_morans_i,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "st_measures": q_st_measures,
        "distance_sphere_knn": q_distance_sphere_knn,
        "vocab_topk": q_vocab_topk,
        "cell_counts": q_cell_counts,
        "envelope_aggr": q_envelope_aggr,
        "tile_assign": q_tile_assign,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "jaccard_adjacent": q_jaccard_adjacent,
        "ann_topk": q_ann_topk,
        "embedding_dups": q_embedding_dups,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "image_decode": q_image_decode,
        "tile_bytes": q_tile_bytes,
    }


def oracle_sql() -> dict[str, str]:
    x0, y0, x1, y1 = _WIN
    pts = f"({SQL_POINTS})"
    zon = f"({SQL_ZONES})"
    reg = f"({SQL_REGION_RECTS})"
    return {
        "range_query": (
            f"select event_id from {pts} p "
            f"where p.x >= {x0} and p.x <= {x1} and p.y >= {y0} and p.y <= {y1}"
        ),
        "pip_rect_join": (
            f"select p.event_id, z.n_nationkey from {pts} p, {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy"
        ),
        "pip_poly_join": (
            f"select p.event_id, z.n_nationkey from {pts} p, {zon} z "
            "where abs(p.x - z.zcx) / z.hx + abs(p.y - z.zcy) / z.hy <= 1e0"
        ),
        "distance_join": (
            f"select p.event_id, z.n_nationkey from {pts} p, {zon} z "
            "where (p.x - z.zcx) * (p.x - z.zcx) + (p.y - z.zcy) * (p.y - z.zcy) "
            "<= z.r * z.r"
        ),
        "pip_join_salted": (
            f"select p.event_id, z.n_nationkey from {pts} p, {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy"
        ),
        "distance_join_meters": _haversine_join_sql(),
        "knn_join": (
            "select n_nationkey, event_id, knn_rank from ("
            f"select z.n_nationkey, p.event_id, row_number() over ("
            "partition by z.n_nationkey order by "
            "(p.x - z.zcx) * (p.x - z.zcx) + (p.y - z.zcy) * (p.y - z.zcy) asc, "
            f"p.event_id asc) as knn_rank from {pts} p, {zon} z) "
            f"where knn_rank <= {_KNN_K}"
        ),
        "knn_query": (
            f"select event_id from {pts} p order by "
            "(p.x - 0.123) * (p.x - 0.123) + (p.y - 0.456) * (p.y - 0.456) asc, "
            "p.event_id asc limit 10"
        ),
        "overlap_join": (
            f"select z.n_nationkey, g.r_regionkey from {zon} z, {reg} g "
            "where z.zcx - z.hx <= g.rcx + g.rhx and g.rcx - g.rhx <= z.zcx + z.hx "
            "and z.zcy - z.hy <= g.rcy + g.rhy and g.rcy - g.rhy <= z.zcy + z.hy"
        ),
        "count_by_key": (
            f"select z.n_nationkey, count(*) as n_matches from {pts} p, {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy "
            "group by z.n_nationkey"
        ),
        "collect_by_key": (
            f"select z.n_nationkey, string_agg(cast(p.event_id as varchar), ',' order by p.event_id) "
            f"as match_ids from {pts} p, {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy "
            "group by z.n_nationkey"
        ),
        "zonal_stats": (
            f"select z.n_nationkey, count(*) as n, cast(sum(e.user_id) as bigint) as val_sum, "
            "min(e.user_id) as val_min, max(e.user_id) as val_max "
            f"from {pts} p join events e using (event_id), {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy "
            "group by z.n_nationkey"
        ),
        "semi_join": (
            f"select p.event_id from {pts} p where exists (select 1 from {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy)"
        ),
        "anti_join": (
            f"select p.event_id from {pts} p where not exists (select 1 from {zon} z "
            "where p.x >= z.zcx - z.hx and p.x <= z.zcx + z.hx "
            "and p.y >= z.zcy - z.hy and p.y <= z.zcy + z.hy)"
        ),
        "dbscan": _dbscan_sql(),
        "st_measures": _st_measures_sql(),
        "distance_sphere_knn": _haversine_sql(),
        "vocab_topk": (
            "with t as (select unnest(list_filter(string_split_regex(lower(text), "
            "'\\s+'), x -> x <> '')) as token from documents), "
            "c as (select token, count(*) as n from t group by token) "
            "select token, n, rank_n from (select token, n, row_number() over "
            "(order by n desc, token asc) as rank_n from c) where rank_n <= 100"
        ),
        "cell_counts": (
            f"select {cells.sql_cell_id('p.x', 'p.y', 8)} as cell, "
            f"count(*) as n_points from {pts} p group by 1"
        ),
        "envelope_aggr": (
            f"select e.event_type, min(p.x) as xmin, min(p.y) as ymin, "
            "max(p.x) as xmax, max(p.y) as ymax, count(*) as n "
            f"from {pts} p join events e using (event_id) group by e.event_type"
        ),
        "tile_assign": _tile_assign_sql(),
        "dedup_exact": (
            "select md5(text) as text_hash, min(doc_id) as keep_id, "
            "count(*) as n_copies from documents group by 1"
        ),
        "text_stats": (
            "select doc_id, cast(length(text) as bigint) as n_chars, "
            "cast(length(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> '')) as bigint) as n_tokens, "
            "cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) "
            "as bigint) as n_punct, "
            "cast(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) "
            "as bigint) as n_digits, "
            "cast(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) "
            "as bigint) as n_upper from documents"
        ),
        "lang_id": _lang_id_sql(),
        "fingerprint": (
            "select doc_id, substr(md5(regexp_replace(trim(text), '\\s+', ' ', 'g')), "
            "1, 16) as fingerprint from documents"
        ),
        "jaccard_adjacent": (
            "with g as (select doc_id, list_distinct(list_filter("
            "string_split_regex(lower(text), '\\s+'), x -> x <> '')) as grams "
            "from documents) "
            "select a.doc_id as id_a, b.doc_id as id_b, "
            "cast(length(list_intersect(a.grams, b.grams)) as bigint) as inter_size, "
            "cast(length(list_distinct(list_concat(a.grams, b.grams))) as bigint) "
            "as union_size "
            "from g a join g b on b.doc_id = a.doc_id + 1"
        ),
        "ann_topk": (
            "with q as (select embedding as qv from embeddings where vec_id = 1), "
            "s as (select vec_id, list_cosine_similarity("
            "list_transform(embedding, x -> cast(x as double)), "
            "list_transform(qv, x -> cast(x as double))) as cosine "
            "from embeddings, q) "
            "select vec_id, rank_n from (select vec_id, row_number() over "
            "(order by cosine desc, vec_id asc) as rank_n from s) where rank_n <= 10"
        ),
        "embedding_dups": (
            "select a.vec_id as id_a, b.vec_id as id_b from embeddings a "
            "join embeddings b on a.label = b.label and a.vec_id < b.vec_id "
            "where list_cosine_similarity("
            "list_transform(a.embedding, x -> cast(x as double)), "
            "list_transform(b.embedding, x -> cast(x as double))) >= 0.5"
        ),
    }


def _tile_assign_sql() -> str:
    # mirror of q_tile_assign + tile_assign()'s Column math, op-for-op
    gx = cells.sql_grid_x("tlon", 10)
    gy = cells.sql_grid_y("tlat", 10)
    return f"""
with img as (
  select cast(p_partkey as bigint) as pk,
         cast(32 + (p_partkey % 3) * 16 as int) as w,
         cast(32 + (p_partkey % 5) * 16 as int) as h,
         ((cast(p_partkey as bigint) * 2654435761) % 1000 + 5e-1) / 1e1 as lon,
         ((cast(p_partkey as bigint) * 2246822519) % 1000 + 5e-1) / 1e1 - 90e0 as lat
  from part),
tiles as (
  select pk, w, h, lon, lat,
         cast(ty.v as bigint) as tile_y, cast(tx.v as bigint) as tile_x
  from img,
       lateral (select unnest(range(0, cast(ceil(h / 16e0) as bigint))) as v) ty,
       lateral (select unnest(range(0, cast(ceil(w / 16e0) as bigint))) as v) tx),
geo as (
  select pk, tile_x, tile_y,
         lon + ((tile_x * 16 + least(16, w - tile_x * 16) / 2e0) / w) * 5e-2 as tlon,
         lat - ((tile_y * 16 + least(16, h - tile_y * 16) / 2e0) / h) * 5e-2 as tlat
  from tiles)
select pk, tile_x, tile_y,
       (cast({10 * (1 << 54)} as bigint)
        + {gx} * cast({1 << 27} as bigint)
        + {gy}) as tile_cell
from geo
"""


def _dbscan_sql() -> str:
    # eps=2.0 (compare squared), min_pts=3 (self-pair included, like the
    # engine); clusters = min id of the core component (recursive-CTE
    # transitive closure); border = min core neighbor's cluster; noise -1
    return f"""
with recursive
pts as ({SQL_POINTS}),
pairs as (
  select a.event_id as ia, b.event_id as ib from pts a, pts b
  where (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4e0),
core as (select ia as id from pairs group by ia having count(*) >= 3),
ce as (select p.ia as a, p.ib as b from pairs p
       join core c1 on p.ia = c1.id join core c2 on p.ib = c2.id),
reach(a, b) as (
  select id, id from core
  union
  select r.a, e.b from reach r join ce e on r.b = e.a),
lbl as (select a as id, min(b) as cluster from reach group by a),
border as (
  select p.ia as id, min(l.cluster) as cluster
  from pairs p
  join core c on p.ib = c.id
  join lbl l on l.id = p.ib
  where p.ia not in (select id from core)
  group by p.ia),
assigned as (select * from lbl union all select * from border)
select p.event_id, coalesce(a.cluster, -1) as cluster
from pts p left join assigned a on p.event_id = a.id
"""


def _st_measures_sql() -> str:
    # mirrors st_area/st_perimeter/st_centroid's fold arithmetic OP-FOR-OP
    # on the rectangle ring [x0,y0, x1,y0, x1,y1, x0,y1] so doubles are
    # bit-identical (shoelace terms in fold order, left-assoc addition)
    return f"""
with z as ({SQL_ZONES}),
c as (select n_nationkey,
             zcx - hx as x0, zcy - hy as y0,
             zcx + hx as x1, zcy + hy as y1 from z),
s as (select n_nationkey, x0, y0, x1, y1,
             (((0e0 + (x0*y0 - x1*y0)) + (x1*y1 - x1*y0)) + (x1*y1 - x0*y1))
              + (x0*y0 - x0*y1) as s2,
             (((0e0 + sqrt((x1-x0)*(x1-x0) + (y0-y0)*(y0-y0)))
                   + sqrt((x1-x1)*(x1-x1) + (y1-y0)*(y1-y0)))
                   + sqrt((x0-x1)*(x0-x1) + (y1-y1)*(y1-y1)))
                   + sqrt((x0-x0)*(x0-x0) + (y0-y1)*(y0-y1)) as perim,
             (((0e0 + (x0+x1)*(x0*y0 - x1*y0)) + (x1+x1)*(x1*y1 - x1*y0))
                   + (x1+x0)*(x1*y1 - x0*y1)) + (x0+x0)*(x0*y0 - x0*y1) as sx,
             (((0e0 + (y0+y0)*(x0*y0 - x1*y0)) + (y0+y1)*(x1*y1 - x1*y0))
                   + (y1+y1)*(x1*y1 - x0*y1)) + (y1+y0)*(x0*y0 - x0*y1) as sy
      from c)
select n_nationkey, abs(s2) / 2e0 as area, perim as perimeter,
       sx / (3e0 * s2) as cx, sy / (3e0 * s2) as cy from s
"""


def _haversine_sql() -> str:
    import math as _m

    rad = _m.pi / 180.0
    r2 = 2.0 * 6371008.8
    return f"""
with p as ({SQL_POINTS}),
h as (select event_id,
             sin((47.3e0 - p.y) * {rad!r} / 2) * sin((47.3e0 - p.y) * {rad!r} / 2)
             + cos(p.y * {rad!r}) * cos(47.3e0 * {rad!r})
               * sin((12.5e0 - p.x) * {rad!r} / 2) * sin((12.5e0 - p.x) * {rad!r} / 2)
             as a
      from p)
select event_id, round({r2!r} * asin(sqrt(a)), 3) as dist_m from h
order by dist_m asc, event_id asc limit 20
"""


def _haversine_join_sql() -> str:
    import math as _m

    rad = _m.pi / 180.0
    r2 = 2.0 * 6371008.8
    return f"""
select p.event_id, z.n_nationkey
from ({SQL_POINTS}) p, ({SQL_ZONES}) z
where {r2!r} * asin(sqrt(
        sin((z.zcy - p.y) * {rad!r} / 2) * sin((z.zcy - p.y) * {rad!r} / 2)
        + cos(p.y * {rad!r}) * cos(z.zcy * {rad!r})
          * sin((z.zcx - p.x) * {rad!r} / 2) * sin((z.zcx - p.x) * {rad!r} / 2)
      )) <= 300000e0
"""


def _lang_id_sql() -> str:
    markers = {
        "en": ("the", "and", "of"),
        "de": ("der", "und", "die"),
        "fr": ("le", "la", "les"),
        "es": ("el", "los", "que"),
    }

    def cnt(m):
        return (
            f"cast((length(t) - length(replace(t, ' {m} ', ''))) / {len(m) + 2} "
            "as bigint)"
        )

    scores = {
        lang: " + ".join(cnt(m) for m in ms) for lang, ms in markers.items()
    }
    score_cols = ", ".join(f"({v}) as s_{k}" for k, v in scores.items())
    best = "greatest(s_en, s_de, s_fr, s_es)"
    case = (
        f"case when s_en > 0 and s_en = {best} then 'en' "
        f"when s_de > 0 and s_de = {best} then 'de' "
        f"when s_fr > 0 and s_fr = {best} then 'fr' "
        f"when s_es > 0 and s_es = {best} then 'es' else 'unknown' end"
    )
    return (
        f"select doc_id, {case} as lang_pred from ("
        f"select doc_id, {score_cols} from ("
        "select doc_id, ' ' || lower(text) || ' ' as t from documents))"
    )
