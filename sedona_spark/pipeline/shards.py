"""Training-shard export: WebDataset-style tar shards + sequence packing.

The last mile of a training-data pipeline is neither a join nor a
filter — it is the physical layout step that turns curated rows into
what the trainer's data loader actually streams:

* :func:`assign_shards` / :func:`write_webdataset` — WebDataset-style
  export: rows are deterministically assigned to fixed-count shards,
  each shard is written as ONE POSIX tar (``{key}.jpg`` + ``{key}.txt``
  members, the WebDataset convention) by the executor that owns it,
  and a manifest (shard_id, n_rows, payload bytes) is returned for the
  loader to shard by.
* :func:`pack_sequences` — token-budget sequence packing: documents are
  packed contiguously (in a deterministic hash order) into fixed-budget
  training sequences; ``seq_id = floor(cum_tokens / budget)`` — the
  "contiguous fill" packing every LLM pretraining pipeline runs before
  tokenizer sharding. Pure Column cumsum window, fully
  oracle-mirrorable.

100 TB shape: shard assignment is a pure Column hash (zero pre-shuffle
work, rejected nothing); the single shuffle is the repartition on
``shard_id`` that every sharded sink needs, and each task then streams
its shard's tar WITHOUT materializing members (tarfile writes straight
to the task-local file). Packing is one window over the hash order —
the same sort any deterministic packer needs — with no driver state.

Reference frame: the reference engine's sinks stop at format writers
(GeoTIFF/GeoParquet); the shard/packing layout tier is part of the
beyond-reference training-pipeline addendum (COVERAGE.md).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "image_id",
    hash_col=None,
) -> DataFrame:
    """Deterministic shard id in [0, n_shards) from the stable id —
    default ``pmod(xxhash64(id), n)``: rerun-stable, uniform, and
    computable by the scanner (no pre-pass, no sampling job).
    ``hash_col`` overrides the hash with an engine-portable Column
    (e.g. :func:`sedona_spark.pipeline.sampling.hash_bucket`) so an
    external SQL oracle can reproduce the assignment verbatim."""
    h = F.xxhash64(F.col(id_col)) if hash_col is None else hash_col
    return df.withColumn("shard_id", F.pmod(h, F.lit(n_shards)))


def shard_manifest(df: DataFrame, n_shards: int,
                   id_col: str = "image_id",
                   bytes_col: str = "bytes",
                   caption_col: str = "caption",
                   hash_col=None,
                   payload_col=None) -> DataFrame:
    """The manifest the loader shards by: per shard, row count, total
    payload bytes (image + caption members by default; ``payload_col``
    overrides the per-row size, e.g. decoded size for an oracle that
    cannot re-derive compressed lengths) and the id span. One
    map-side-combined shuffle on shard_id."""
    a = assign_shards(df, n_shards, id_col, hash_col=hash_col)
    payload = (F.length(bytes_col).cast("long")
               + F.length(caption_col).cast("long")
               if payload_col is None else payload_col)
    return a.groupBy("shard_id").agg(
        F.count("*").alias("n_rows"),
        F.sum(payload).alias("payload_bytes"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Write ``shard-%05d.tar`` files in the WebDataset layout: members
    ``{id}.{fmt}`` (image bytes) and ``{id}.txt`` (caption), grouped per
    sample, members sorted by id inside a shard (deterministic bytes —
    tar mtimes pinned to 0). One shuffle (repartition on shard_id); each
    task streams exactly one tar. Returns the written manifest.

    At 100 TB: n_shards is the write parallelism AND the loader's unit
    of work — pick ~total_bytes / 1 GiB. A task writes its tar
    streaming, so executor memory holds one Arrow batch, not a shard.
    """
    os.makedirs(path, exist_ok=True)
    a = assign_shards(df, n_shards, id_col).select(
        "shard_id", F.col(id_col).alias("key"),
        F.col(bytes_col).alias("img"),
        F.col(caption_col).alias("cap"),
        F.col(fmt_col).alias("ext"))
    # repartition + in-partition sort: rows arrive grouped by shard_id
    # and id-ordered, so the writer STREAMS — it holds one open tar
    # handle plus the current Arrow batch, never a whole shard
    a = a.repartition(n_shards, "shard_id").sortWithinPartitions(
        "shard_id", "key")

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # task-side too: on a real cluster the task runs on a machine
        # that never saw the driver's makedirs (shared-FS mount point)
        os.makedirs(path, exist_ok=True)
        out = []
        cur = None  # [sid, tarfile, n_rows, n_bytes, tar_path]

        def close_cur():
            if cur is not None:
                cur[1].close()
                out.append((cur[0], cur[2], cur[3], cur[4]))

        for b in batches:
            for sid, key, img, cap, ext in zip(
                    b["shard_id"], b["key"], b["img"], b["cap"], b["ext"]):
                sid = int(sid)
                if cur is None or cur[0] != sid:
                    close_cur()
                    tar_path = os.path.join(path, f"shard-{sid:05d}.tar")
                    cur = [sid, tarfile.open(tar_path, "w"), 0, 0,
                           tar_path]
                for name, payload in ((f"{key}.{ext}", bytes(img)),
                                      (f"{key}.txt", str(cap).encode())):
                    ti = tarfile.TarInfo(name)
                    ti.size = len(payload)
                    ti.mtime = 0
                    cur[1].addfile(ti, io.BytesIO(payload))
                    cur[3] += len(payload)
                cur[2] += 1
        close_cur()
        yield pd.DataFrame(
            out, columns=["shard_id", "n_rows", "payload_bytes",
                          "tar_path"])

    return a.mapInPandas(
        write_part,
        "shard_id long, n_rows long, payload_bytes long, tar_path string")


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    truncate_oversize: bool = True,
    hash_col=None,
) -> DataFrame:
    """Contiguous-fill sequence packing: order documents by
    ``(hash(id), id)`` (a deterministic shuffle of the corpus — default
    ``xxhash64``, overridable with an engine-portable ``hash_col``),
    then ``seq_id = floor(cum_tokens_before / budget)`` — each training
    sequence takes documents until the budget spills into the next.

    Documents may straddle a sequence boundary (the loader splits);
    ``truncate_oversize`` caps a single document's contribution at the
    budget so one doc never spans more than two sequences. Returns one
    row per document: (id, n_tokens, seq_id, offset_in_seq).

    One global sort — the same total order ANY deterministic packer
    needs. At 100 TB you run this per output shard (seq ids are then
    (shard_id, seq_id) pairs and the sort is shard-local); the global
    form here keeps the oracle exact.
    """
    toks = F.col(tokens_col).cast("long")
    if truncate_oversize:
        toks = F.least(toks, F.lit(budget))
    h = F.xxhash64(F.col(id_col)) if hash_col is None else hash_col
    w = Window.orderBy(h, F.col(id_col))
    cum_before = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    # integer `div`, not double division: past 2^53 cumulative tokens a
    # long→double detour rounds and can disagree with the oracle's `//`
    return df.select(
        F.col(id_col), toks.alias("n_tokens"),
        cum_before.alias("__cum"),
    ).select(
        id_col, "n_tokens",
        F.expr(f"__cum div {int(budget)}").alias("seq_id"),
        F.pmod(F.col("__cum"), F.lit(budget)).alias("offset_in_seq"),
    )
