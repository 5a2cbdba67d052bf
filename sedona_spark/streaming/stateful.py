"""Custom stateful streaming operator: per-cell EWMA hot-cell detector.

Goes one step beyond the reference's streaming posture (scalar-only,
SURVEY.md §2.5): an ``applyInPandasWithState`` operator keeping per-cell
state across micro-batches — the Spark-native form of a custom stateful
spatial operator (running intensity + exponentially-weighted moving average;
a cell is "hot" when its batch count exceeds ``factor ×`` its EWMA).

State is one small tuple per cell key — bounded by the number of occupied
cells, the same cardinality any per-cell aggregate carries; timeouts evict
idle cells so state does not grow with dead keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sedona_spark import cells

_OUT_SCHEMA = "cell long, batch_count long, ewma double, hot boolean"
_STATE_SCHEMA = "ewma double, n_batches long"


def hot_cell_stream(
    stream: DataFrame,
    level: int,
    lon: str = "lon",
    lat: str = "lat",
    alpha: float = 0.5,
    factor: float = 2.0,
    idle_timeout_ms: int = 600_000,
) -> DataFrame:
    """→ streaming (cell, batch_count, ewma, hot) — one row per occupied
    cell per micro-batch; ``hot`` after the cell's count exceeds
    ``factor × EWMA`` of its history (min 2 batches of history)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count = 0
        for pdf in pdfs:
            count += len(pdf)
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ewma, n_batches = state.get
        else:
            ewma, n_batches = float(count), 0
        hot = n_batches >= 2 and count > factor * ewma
        new_ewma = alpha * count + (1.0 - alpha) * ewma
        state.update((float(new_ewma), int(n_batches + 1)))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "cell": [key[0]],
                "batch_count": [count],
                "ewma": [ewma],
                "hot": [bool(hot)],
            }
        )

    with_cell = stream.withColumn(
        "cell", cells.cell_id(F.col(lon), F.col(lat), level)
    )
    return with_cell.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
