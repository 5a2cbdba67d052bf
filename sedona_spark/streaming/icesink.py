"""Streaming sink into the Iceberg-lite table: exactly-once snapshots.

The north rule requires "all stages checkpoint to Iceberg snapshots";
for the streaming ingest stage that means every micro-batch lands as
one atomic :mod:`sedona_spark.icetable` snapshot. The exactly-once
contract is the standard Structured-Streaming + table-format recipe
(Iceberg's own Spark sink, DeltaSink): the sink records the epoch/batch
id inside the transactional commit, and a replayed batch (failure after
commit, before the streaming checkpoint advanced) is recognized and
skipped — idempotent re-delivery on top of at-least-once foreachBatch.

Scale posture: each micro-batch write is a normal distributed parquet
write plus one O(files) metadata commit; downstream consumers read the
table with :func:`icetable.incremental_scan` keyed on the snapshot ids
they have already processed — the streaming producer and the batch
consumers never coordinate beyond the snapshot log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sedona_spark import icetable


def committed_batch_ids(path: str) -> set[int]:
    """Streaming batch ids already durably committed to the table."""
    out = set()
    for s in icetable.snapshots(path):
        b = s.get("streaming_batch_id")
        if b is not None:
            out.add(int(b))
    return out


def commit_stream_batch(df: DataFrame, path: str, batch_id: int,
                        partition_by: str | None = None) -> int | None:
    """Commit one micro-batch as a snapshot; returns the snapshot id, or
    None when ``batch_id`` was already committed (replay after a crash
    between the table commit and the streaming checkpoint write). The
    batch id rides inside the snapshot record of the SAME atomic commit
    — there is no window in which the data is committed but the batch
    id is not, so replay detection is exact."""
    if int(batch_id) in committed_batch_ids(path):
        return None
    # dedupe_property re-checks the batch id INSIDE the commit race, so
    # even two concurrent deliveries of the same batch commit exactly one
    # snapshot (the loser returns the winner's id — same deterministic
    # batch, identical rows)
    return icetable.commit_append(
        df, path, partition_by=partition_by,
        properties={"streaming_batch_id": int(batch_id)},
        dedupe_property="streaming_batch_id")


def write_stream_to_icetable(stream_df: DataFrame, path: str,
                             checkpoint_dir: str,
                             partition_by: str | None = None,
                             trigger_once: bool = True):
    """``writeStream.foreachBatch`` into an icetable with exactly-once
    batch semantics. Returns the StreamingQuery."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_stream_batch(batch_df, path, batch_id,
                            partition_by=partition_by)

    w = (stream_df.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
