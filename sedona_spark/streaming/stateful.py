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


_SESS_OUT = ("user_id long, session_id long, n_events long, "
             "x_min double, x_max double, y_min double, y_max double, "
             "t_start long, t_end long, closed boolean")
_SESS_STATE = ("session_id long, n_events long, x_min double, "
               "x_max double, y_min double, y_max double, "
               "t_start long, t_end long")


def sessionize_stream(
    stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    user: str = "user_id",
    ts: str = "ts_ms",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Gap-based trajectory sessionization (custom stateful streaming
    operator; beyond the reference's scalar-only streaming posture):
    per user, consecutive pings closer than ``gap_ms`` belong to one
    session; a longer silence closes the session and emits its summary
    (event count, bounding box, time span). ``session_id`` is the
    session's start timestamp — strictly increasing per user and stable
    across state eviction (a per-user counter would reset after a
    timeout removes the state). Emits an OPEN row (`closed
    = false`) whenever a micro-batch extends a live session, and a
    CLOSED row either when a new ping arrives after the gap or when the
    state times out with no traffic at all.

    100 TB shape: state is ONE fixed-width tuple per ACTIVE user (no
    event buffering — the bbox/count fold is incremental), partitioned
    by user key; ProcessingTimeTimeout evicts silent users, so state
    size tracks concurrently-active users, not history."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (sid, n, x0, x1, y0, y1, t0, t1) = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], sid, n, x0, x1, y0, y1, t0, t1, True)],
                columns=[c.split()[0] for c in _SESS_OUT.split(", ")],
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts)
        out = []
        if state.exists:
            sid, n, x0, x1, y0, y1, t0, t1 = state.get
        else:
            sid, n = 0, 0
            x0 = y0 = float("inf")
            x1 = y1 = float("-inf")
            t0 = t1 = None
        for r in rows.itertuples(index=False):
            rts = int(getattr(r, ts))
            if n and rts - t1 > gap_ms:
                out.append((key[0], sid, n, x0, x1, y0, y1, t0, t1, True))
                n = 0
                x0 = y0 = float("inf")
                x1 = y1 = float("-inf")
                t0 = None
            rx, ry = float(getattr(r, x)), float(getattr(r, y))
            n += 1
            x0, x1 = min(x0, rx), max(x1, rx)
            y0, y1 = min(y0, ry), max(y1, ry)
            if t0 is None:
                # session id = session start time: strictly increasing
                # per user AND robust to state eviction (a counter reset
                # to 0 after a ProcessingTimeTimeout would reuse ids)
                t0, sid = rts, rts
            t1 = rts
        state.update((sid, n, x0, x1, y0, y1, t0, t1))
        state.setTimeoutDuration(gap_ms)
        out.append((key[0], sid, n, x0, x1, y0, y1, t0, t1, False))
        yield pd.DataFrame(
            out, columns=[c.split()[0] for c in _SESS_OUT.split(", ")]
        )

    return (
        stream.groupBy(user)
        .applyInPandasWithState(
            update, _SESS_OUT, _SESS_STATE, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
