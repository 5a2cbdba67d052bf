"""Image quality signals: sharpness, exposure, clipping — exact-integer.

Training-data curation filters images on decoded-pixel statistics the
way it filters text on Gopher signals (``pipeline/text.py``): blur
(variance of the 4-neighbor Laplacian — the standard
"variance of Laplacian" focus measure), exposure (mean luminance), and
sensor/encoder clipping (fraction of pixels pinned at 0 or 255). All
signals are computed as *integer* sums (int64) so the DuckDB oracle can
regenerate every pixel of the deterministic codec and match bit-for-bit
— no float-rounding hash risk; callers derive the float variance as
``(lap_sumsq - lap_sum²/n)/n`` when they need it.

One Arrow-batched ``mapInPandas`` pass over the bytes column: decode,
five shifted numpy views for the Laplacian, three reductions. No
shuffle — at 100 TB this pipelines with the scan, and the signals feed
ordinary Column-space threshold filters downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("n_px", LongType(), False),
    StructField("sum_lum", LongType(), False),
    StructField("lap_sum", LongType(), False),
    StructField("lap_sumsq", LongType(), False),
    StructField("n_clip_lo", LongType(), False),
    StructField("n_clip_hi", LongType(), False),
])


def quality_signals(arr: np.ndarray) -> tuple[int, int, int, int, int, int]:
    """(n_px, sum_lum, lap_sum, lap_sumsq, n_clip_lo, n_clip_hi) for a
    decoded uint8 (h, w, 3) array. Luminance/Laplacian use channel 0 as
    the luminance proxy (one plane carries the focus structure; a
    BT.601 mix would only blur the integer-exactness); clipping counts
    all channels."""
    a = arr[:, :, 0].astype(np.int64)
    h, w = a.shape
    core = a[1:-1, 1:-1]
    lap = (4 * core - a[:-2, 1:-1] - a[2:, 1:-1]
           - a[1:-1, :-2] - a[1:-1, 2:])
    return (int(h * w), int(a.sum()), int(lap.sum()),
            int((lap * lap).sum()),
            int((arr == 0).sum()), int((arr == 255).sum()))


def _make_quality_udf():
    from pyspark.sql.functions import pandas_udf

    # DataType object (not a DDL string): executors re-import the module
    # without an active session, which string parsing would require
    sig = StructType([StructField(n, LongType())
                      for n in ("n_px", "sum_lum", "lap_sum", "lap_sumsq",
                                "n_clip_lo", "n_clip_hi")])

    @pandas_udf(sig)
    def _q(b: pd.Series) -> pd.DataFrame:
        from sedona_spark.sources.images import decode_image

        # NULL bytes → all-NULL struct, never a task crash
        recs = [(None,) * 6 if v is None
                else quality_signals(decode_image(bytes(v))[0]) for v in b]
        return pd.DataFrame(recs, columns=[
            "n_px", "sum_lum", "lap_sum", "lap_sumsq",
            "n_clip_lo", "n_clip_hi"], dtype="object")

    return _q


_quality_udf = _make_quality_udf()  # SQL spelling: RS_ImageQuality(bytes)


def image_quality_stats(df: DataFrame, id_col: str = "image_id",
                        bytes_col: str = "bytes") -> DataFrame:
    """Per-image exact-integer quality signals (schema above)."""
    from sedona_spark.sources.images import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b[id_col], b[bytes_col]):
                arr, _fmt = decode_image(bytes(buf))
                recs.append((iid, *quality_signals(arr)))
            yield pd.DataFrame(
                recs, columns=[f.name for f in _SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=_SCHEMA)
