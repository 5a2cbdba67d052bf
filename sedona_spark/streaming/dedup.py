"""Streaming deduplication — the ingestion-side twin of
``pipeline.dedup`` (r5).

A training-data pipeline ingesting a document/image firehose needs dedup
AT INGEST, not only as a batch pass: the same page fetched by two crawlers
seconds apart should be admitted once. Spark-first shape:

* content identity is the same md5 key as the batch ``exact_dedup``;
* state is BOUNDED by the watermark (``dropDuplicatesWithinWatermark``) —
  plain ``dropDuplicates`` on an unbounded stream grows state forever,
  which is exactly the operator you cannot run at 100 TB/day; the
  watermark horizon is the explicit "how long can a duplicate lag"
  contract, and expired keys are evicted by the state store;
* the key is a HASH, not the text: state rows are ~48 bytes regardless of
  document size, so a day-long horizon over a 10⁹-doc/day firehose is
  ~50 GB of state across the cluster — shardable by the hash key Spark
  already partitions state by.

Reference posture: the reference has no streaming dedup (its Flink tier
covers spatial ops only); this extends the engine's streaming surface the
same way ``stream_stream_distance_join`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    docs: DataFrame,
    ts: str = "ts",
    text: str = "text",
    watermark: str = "30 seconds",
) -> DataFrame:
    """First-arrival exact dedup over a streaming document source: emit
    each distinct content hash once; duplicates arriving within the
    watermark horizon of the first copy are dropped; state for a hash is
    evicted once the watermark passes it (bounded state — the 100 TB/day
    requirement)."""
    hashed = docs.withColumn(
        "text_hash", F.md5(F.col(text).cast("binary"))
    ).withWatermark(ts, watermark)
    return hashed.dropDuplicatesWithinWatermark(["text_hash"])


def stream_phash_dedup(
    images: DataFrame,
    ts: str = "ts",
    phash: str = "phash",
    watermark: str = "30 seconds",
) -> DataFrame:
    """First-arrival image dedup on the input contract's ``phash:int64``
    column (EXACT phash equality — the streaming analog of the batch
    pigeonhole path's band-0 bucket; near-dup hamming matching needs the
    batch pass, where both sides are complete)."""
    return (
        images.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark([phash])
    )
