from sedona_spark.streaming.cellify import cellify_stream, windowed_cell_counts

__all__ = ["cellify_stream", "windowed_cell_counts"]
