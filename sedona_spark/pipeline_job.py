"""End-to-end checkpointed image pipeline (the north-rule production job).

Stages (each a durable snapshot via :mod:`sedona_spark.checkpoint`, with
per-partition lineage + row/byte metrics; a crash resumes by replaying only
incomplete buckets):

    images (stored table)
      → [stage tiles]   rs_tile_explode + per-tile cell      (python+JVM)
      → [stage assign]  cell equi-join to zone cover cells    (JVM only)
      → [stage zonal]   per-zone tile counts + byte totals    (JVM only)

The lineage/bucket key is the tile cell — deterministic closed-form math,
so replays are idempotent (SURVEY §7.1 pillar 5). With ``publish_table``
the final zonal result is additionally committed to an Iceberg-lite
table (:mod:`sedona_spark.icetable`) as one atomic snapshot carrying the
run key, closing the north-rule loop: bucket-replayable stage scratch →
versioned, time-travelable, incrementally-consumable table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sedona_spark import cells, checkpoint
from sedona_spark.functions.raster import rs_tile_explode
from sedona_spark.operators.spatial_join import _explode_cover


def _tiles_stage(spark: SparkSession, images_path: str, tile: int, level: int) -> DataFrame:
    imgs = spark.read.parquet(images_path)
    t = rs_tile_explode(imgs, tile, tile, passthrough=("lon", "lat", "w", "h"))
    cx = (F.col("tile_x") * tile + F.col("tile_w") / F.lit(2.0)) / F.col("w")
    cy = (F.col("tile_y") * tile + F.col("tile_h") / F.lit(2.0)) / F.col("h")
    return (
        t.withColumn("tile_lon", F.col("lon") + cx * F.lit(0.05))
        .withColumn("tile_lat", F.col("lat") - cy * F.lit(0.05))
        .withColumn(
            "cell", cells.cell_id(F.col("tile_lon"), F.col("tile_lat"), level)
        )
        .drop("lon", "lat", "w", "h")
    )


def run_image_pipeline(
    spark: SparkSession,
    images_path: str,
    zones: DataFrame,
    out_root: str,
    tile: int = 16,
    level: int = 8,
    n_buckets: int = 32,
    publish_table: str | None = None,
) -> dict:
    """Run (or resume) the full pipeline. Returns {stage: manifest}.

    ``zones`` needs (zone key, xmin/ymin/xmax/ymax). Each stage is skipped
    if already committed under ``out_root`` — rerunning after a crash only
    replays missing buckets of the interrupted stage. With
    ``publish_table``, the final zonal result is additionally committed
    to an Iceberg-lite table (idempotent per run key).
    """
    manifests = {}

    manifests["tiles"] = checkpoint.resume_stage(
        _tiles_stage(spark, images_path, tile, level),
        out_root, "tiles", bucket_col="cell", n_buckets=n_buckets,
    )
    tiles = checkpoint.read_stage(spark, out_root, "tiles")

    zone_key = zones.columns[0]
    zc = F.broadcast(_explode_cover(zones, level))
    assigned = (
        tiles.join(zc, "cell")
        .filter(
            (F.col("tile_lon") >= F.col("xmin"))
            & (F.col("tile_lon") <= F.col("xmax"))
            & (F.col("tile_lat") >= F.col("ymin"))
            & (F.col("tile_lat") <= F.col("ymax"))
        )
        .select("image_id", "tile_x", "tile_y", "cell",
                F.length("tile_bytes").alias("tile_nbytes"), zone_key)
    )
    manifests["assign"] = checkpoint.resume_stage(
        assigned, out_root, "assign", bucket_col="cell", n_buckets=n_buckets
    )
    assigned_t = checkpoint.read_stage(spark, out_root, "assign")

    zonal = assigned_t.groupBy(zone_key).agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.countDistinct("image_id").alias("n_images"),
        F.sum("tile_nbytes").alias("total_bytes"),
    )
    manifests["zonal"] = checkpoint.resume_stage(
        zonal, out_root, "zonal", bucket_col=zone_key, n_buckets=min(8, n_buckets)
    )
    if publish_table is not None:
        manifests["publish"] = publish_stage_to_icetable(
            spark, out_root, "zonal", publish_table)
    return manifests


def _run_key(manifest: dict) -> str:
    """Deterministic identity of a committed stage run: stage name +
    per-bucket row counts and byte sizes (wall time excluded — a replay
    of the same data reproduces the same parquet bytes and must
    collide; different data differs in at least one bucket's content).
    Callers with an external run identity pass ``run_key=`` instead."""
    import hashlib
    import json as _json

    parts = {b: (v["rows"], v.get("bytes", 0))
             for b, v in manifest["partitions"].items()}
    blob = _json.dumps([manifest["stage"], sorted(parts.items())])
    return hashlib.md5(blob.encode()).hexdigest()


def publish_stage_to_icetable(spark: SparkSession, out_root: str,
                              stage: str, table_path: str,
                              run_key: str | None = None) -> dict:
    """Publish a committed checkpoint stage into an Iceberg-lite table
    as one atomic snapshot — the north-rule hand-off from the stage
    layer (bucket-replayable scratch) to the table layer (versioned,
    time-travelable, incrementally consumable). Idempotent: the run key
    (stage + per-bucket row counts) rides inside the snapshot commit, so
    re-publishing the same committed data is a no-op."""
    import json as _json
    import os as _os

    from sedona_spark import icetable

    man_path = _os.path.join(out_root, stage, checkpoint._MANIFEST)
    with open(man_path) as f:
        manifest = _json.load(f)
    key = run_key or _run_key(manifest)
    prior = {s["snapshot_id"] for s in icetable.snapshots(table_path)}
    for s in icetable.snapshots(table_path):
        if s.get("pipeline_run_key") == key:
            return {"snapshot_id": s["snapshot_id"], "already_published": True}
    df = checkpoint.read_stage(spark, out_root, stage)
    # dedupe_property makes the idempotency atomic: the key is re-checked
    # inside the commit race, so two concurrent publishers of the same
    # committed stage land exactly one snapshot
    sid = icetable.commit_append(
        df, table_path, properties={"pipeline_run_key": key,
                                    "source_stage": stage},
        dedupe_property="pipeline_run_key")
    return {"snapshot_id": sid, "already_published": sid in prior}
