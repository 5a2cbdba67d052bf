"""Checkpointing with per-partition lineage + metrics, and resume.

North_rule requirement: "all stages checkpoint to Iceberg snapshots with
per-partition lineage and row-count/byte metrics, and resumption replays
only incomplete partitions". This environment has no Iceberg runtime jars,
so the snapshot layout is the documented parquet fallback (SURVEY.md §7.2
step 0) with identical semantics:

    <root>/<stage>/data/part_bucket=<b>/...parquet   (bucketed by lineage key)
    <root>/<stage>/_manifest.json                     (per-bucket rows/bytes)
    <root>/<stage>/_SUCCESS.sedona_spark             (commit marker)

The lineage key is the deterministic cell/bucket column — because layout is
data-independent (closed-form cell math, no sampled partitioner), re-running
a stage reproduces the same bucket→rows mapping, which is what makes
partial replay sound (contrast the reference's sampled KDB trees,
``SpatialRDD.java:246-325``, which re-sample on every run).

Metrics mirror the reference's join accumulators
(``JoinQuery.java:683-686``, ``core/monitoring/Metrics.java``) but are made
durable in the manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = "_SUCCESS.sedona_spark"
_MANIFEST = "_manifest.json"


def _stage_paths(root: str, stage: str) -> tuple[str, str, str]:
    base = os.path.join(root, stage)
    return base, os.path.join(base, "data"), os.path.join(base, _MANIFEST)


def checkpoint_stage(
    df: DataFrame,
    root: str,
    stage: str,
    bucket_col: str,
    n_buckets: int = 32,
    overwrite: bool = False,
) -> dict:
    """Write ``df`` as a committed snapshot partitioned by a deterministic
    lineage bucket (``pmod(hash-free bucket of bucket_col, n_buckets)`` —
    plain modulus so the mapping is engine-independent and replayable).

    Returns the manifest: per-bucket row counts + bytes + wall time.
    Idempotent: an existing committed stage is returned as-is.
    """
    base, data_dir, man_path = _stage_paths(root, stage)
    if os.path.exists(os.path.join(base, _MARKER)) and not overwrite:
        with open(man_path) as f:
            return json.load(f)
    if os.path.exists(base):
        shutil.rmtree(base)

    t0 = time.time()
    out = df.withColumn(
        "part_bucket", F.pmod(F.col(bucket_col).cast("long"), F.lit(n_buckets))
    )
    out.write.mode("overwrite").partitionBy("part_bucket").parquet(data_dir)

    spark = df.sparkSession
    written = spark.read.parquet(data_dir)
    counts = {
        int(r["part_bucket"]): int(r["n"])
        for r in written.groupBy("part_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes: dict[int, int] = {}
    for entry in os.listdir(data_dir):
        if entry.startswith("part_bucket="):
            b = int(entry.split("=", 1)[1])
            p = os.path.join(data_dir, entry)
            sizes[b] = sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
    manifest = {
        "stage": stage,
        "bucket_col": bucket_col,
        "n_buckets": n_buckets,
        "wall_sec": time.time() - t0,
        "partitions": {
            str(b): {"rows": counts.get(b, 0), "bytes": sizes.get(b, 0)}
            for b in sorted(set(counts) | set(sizes))
        },
    }
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(base, _MARKER), "w") as f:
        f.write(str(time.time()))
    return manifest


def is_committed(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(root, stage, _MARKER))


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    _, data_dir, _ = _stage_paths(root, stage)
    return spark.read.parquet(data_dir)


def incomplete_buckets(root: str, stage: str, n_buckets: int) -> list[int]:
    """Buckets not yet durably written (crash mid-stage). With the
    deterministic bucket mapping, a resume recomputes ONLY these: filter the
    stage input on ``bucket % n == b`` for the missing b's and append."""
    base, data_dir, man_path = _stage_paths(root, stage)
    if os.path.exists(os.path.join(base, _MARKER)):
        return []
    present = set()
    if os.path.exists(data_dir):
        for entry in os.listdir(data_dir):
            if entry.startswith("part_bucket="):
                # a bucket dir without files is not durable
                p = os.path.join(data_dir, entry)
                if any(f.endswith(".parquet") for f in os.listdir(p)):
                    present.add(int(entry.split("=", 1)[1]))
    return [b for b in range(n_buckets) if b not in present]


def resume_stage(
    df: DataFrame,
    root: str,
    stage: str,
    bucket_col: str,
    n_buckets: int = 32,
) -> dict:
    """Complete a crashed stage by replaying only its missing buckets, then
    commit. If never started, equivalent to :func:`checkpoint_stage`."""
    base, data_dir, man_path = _stage_paths(root, stage)
    if is_committed(root, stage):
        with open(man_path) as f:
            return json.load(f)
    missing = incomplete_buckets(root, stage, n_buckets)
    if len(missing) == n_buckets or not os.path.exists(data_dir):
        return checkpoint_stage(df, root, stage, bucket_col, n_buckets)

    t0 = time.time()
    todo = df.withColumn(
        "part_bucket", F.pmod(F.col(bucket_col).cast("long"), F.lit(n_buckets))
    ).filter(F.col("part_bucket").isin([int(b) for b in missing]))
    todo.write.mode("append").partitionBy("part_bucket").parquet(data_dir)

    spark = df.sparkSession
    written = spark.read.parquet(data_dir)
    counts = {
        int(r["part_bucket"]): int(r["n"])
        for r in written.groupBy("part_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "stage": stage,
        "bucket_col": bucket_col,
        "n_buckets": n_buckets,
        "wall_sec": time.time() - t0,
        "resumed_buckets": [int(b) for b in missing],
        "partitions": {str(b): {"rows": counts.get(b, 0)} for b in sorted(counts)},
    }
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(base, _MARKER), "w") as f:
        f.write(str(time.time()))
    return manifest
