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
_PREMANIFEST = "_premanifest.json"


def _bucket_rows_durable(data_dir: str, entry: str) -> int:
    """Actual rows durably present in a bucket dir, read from parquet file
    footers (pyarrow) — no Spark session needed, and a torn/partial file
    (crash mid-write) fails the footer read and counts as 0."""
    import pyarrow.parquet as pq

    p = os.path.join(data_dir, entry)
    total = 0
    for f in os.listdir(p):
        if not f.endswith(".parquet"):
            continue
        try:
            total += pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
        except Exception:
            return -1  # torn file → bucket not durable
    return total


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
    # pre-manifest BEFORE the data write: expected rows per bucket make
    # bucket durability *verifiable* — a bucket dir left by a crashed commit
    # (v2 committer, object-store direct write) is only trusted on resume if
    # its actual footer row count matches. persist() so the expected counts
    # and the write share one computation of df.
    out = out.persist()
    expected = {
        int(r["part_bucket"]): int(r["n"])
        for r in out.groupBy("part_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, _PREMANIFEST), "w") as f:
        json.dump({str(b): n for b, n in sorted(expected.items())}, f)
    out.write.mode("overwrite").partitionBy("part_bucket").parquet(data_dir)
    out.unpersist()

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
    stage input on ``bucket % n == b`` for the missing b's and append.

    Durability is verified, not inferred: when the pre-manifest (written
    before the data write) exists, a bucket counts as complete only if its
    parquet-footer row total equals the expected count — a dir merely
    *containing* files (v1 committer crash mid-rename, v2/direct committers)
    is otherwise silently partial. Without a pre-manifest (legacy stage) the
    weaker any-parquet-file heuristic applies."""
    base, data_dir, man_path = _stage_paths(root, stage)
    if os.path.exists(os.path.join(base, _MARKER)):
        return []
    pre_path = os.path.join(base, _PREMANIFEST)
    expected: dict[int, int] | None = None
    if os.path.exists(pre_path):
        with open(pre_path) as f:
            expected = {int(k): int(v) for k, v in json.load(f).items()}

    actual: dict[int, int] = {}
    if os.path.exists(data_dir):
        for entry in os.listdir(data_dir):
            if entry.startswith("part_bucket="):
                b = int(entry.split("=", 1)[1])
                actual[b] = _bucket_rows_durable(data_dir, entry)

    if expected is None:
        present = {b for b, n in actual.items() if n > 0}
        return [b for b in range(n_buckets) if b not in present]
    missing = []
    for b in range(n_buckets):
        exp = expected.get(b, 0)
        if exp == 0:
            continue  # nothing was ever expected in this bucket
        if actual.get(b, 0) != exp:
            missing.append(b)
    return missing


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
    # delete any PARTIAL bucket dirs being replayed — appending into a
    # half-written bucket would duplicate its surviving rows
    for b in missing:
        p = os.path.join(data_dir, f"part_bucket={b}")
        if os.path.exists(p):
            shutil.rmtree(p)
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


def list_stages(root: str) -> list[dict]:
    """Inventory of snapshots under ``root``: name, committed flag,
    manifest mtime, total rows/bytes — the `snapshots` metadata-table
    analog of the Iceberg layout this module emulates."""
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        base, _, manifest = _stage_paths(root, name)
        if not os.path.isdir(base):
            continue
        rec = {"stage": name, "committed": os.path.exists(manifest),
               "rows": None, "bytes": None, "committed_at": None}
        if rec["committed"]:
            try:
                with open(manifest) as f:
                    m = json.load(f)
                parts = m["partitions"]
                rec["rows"] = sum(b["rows"] for b in parts.values())
                rec["bytes"] = sum(b["bytes"] for b in parts.values())
                rec["committed_at"] = os.path.getmtime(manifest)
            except (OSError, ValueError, KeyError):
                pass
        out.append(rec)
    return out


def expire_stages(
    root: str, keep: list[str], dry_run: bool = False
) -> list[str]:
    """Iceberg `expireSnapshots` analog: delete committed snapshot
    directories NOT in ``keep`` (and any uncommitted partial stage —
    those are replayable by construction). Refuses to touch paths
    outside ``root``. Returns the stage names removed."""
    import shutil

    removed = []
    keep_set = set(keep)
    for rec in list_stages(root):
        if rec["stage"] in keep_set:
            continue
        base = os.path.join(root, rec["stage"])
        if os.path.realpath(base).startswith(os.path.realpath(root)):
            if not dry_run:
                shutil.rmtree(base)
            removed.append(rec["stage"])
    return removed
