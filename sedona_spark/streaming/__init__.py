from sedona_spark.streaming.cellify import cellify_stream, windowed_cell_counts
from sedona_spark.streaming.dedup import stream_exact_dedup, stream_phash_dedup

__all__ = [
    "cellify_stream",
    "windowed_cell_counts",
    "stream_exact_dedup",
    "stream_phash_dedup",
]
