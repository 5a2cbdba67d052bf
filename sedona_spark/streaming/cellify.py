"""Structured Streaming support.

The reference has no spatial streaming operators — its scalar expressions
simply work inside streams (tested in
``python/tests/streaming/spark/test_constructor_functions.py:501-511``) and
spatial joins are batch-only (SURVEY.md §2.5). We inherit the same posture
and make it concrete: cell encoding is pure Column math, hence
streaming-safe; plus a watermarked windowed per-cell aggregation — the
building block for streaming tile rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sedona_spark import cells


def cellify_stream(
    stream: DataFrame, level: int, lon: str = "lon", lat: str = "lat"
) -> DataFrame:
    """Attach the int64 cell id to a streaming DataFrame. Stateless Column
    arithmetic — valid in any output mode, no watermark needed."""
    return stream.withColumn("cell", cells.cell_id(F.col(lon), F.col(lat), level))


def windowed_cell_counts(
    stream: DataFrame,
    level: int,
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Late-data-tolerant per-cell event counts per tumbling window —
    streaming zonal statistics (the streaming analog of the tile-assignment
    + groupBy rollup)."""
    return (
        cellify_stream(stream, level, lon, lat)
        .withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_events")
    )


def stream_spatial_join(
    stream: DataFrame,
    zones: DataFrame,
    predicate: str = "covers",
    level: int = 7,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Streaming spatial join: the batch PIP join applied to a streaming
    point source against a STATIC polygon table — a stream-static inner
    equi-join on cover cells plus the exact refine, which Structured
    Streaming supports statelessly in append mode (no watermark needed;
    the static side is re-broadcast per micro-batch). Goes beyond the
    reference, whose spatial joins are batch-only (SURVEY.md §2.5); the
    scalar refine kernel is the same one the batch path uses, so results
    match the batch join row-for-row on the same input."""
    from sedona_spark.operators.spatial_join import pip_join

    return pip_join(stream, zones, predicate, level, x=lon, y=lat)


def windowed_zone_counts(
    stream: DataFrame,
    zones: DataFrame,
    zone_key: str = "n_nationkey",
    predicate: str = "covers",
    level: int = 7,
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming ZONAL statistics: spatial join each micro-batch to the
    static zones, then late-data-tolerant tumbling-window counts per zone
    — the streaming analog of the zonal_stats batch rollup."""
    joined = stream_spatial_join(stream, zones, predicate, level, lon, lat)
    return (
        joined.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window), F.col(zone_key))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
