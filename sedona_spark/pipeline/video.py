"""Video pipeline operators over the opaque-binary AVI column.

Frame sampling, per-frame statistics, scene-change detection and
key-frame tensor extraction — each one Arrow-batched ``mapInPandas``
pass (decode happens once per clip inside the batch; frames never
round-trip through Spark rows unless the operator's output IS frames).

100 TB shape: map-only over video rows, no shuffle, no driver
collection; frame-sampling fan-out is bounded (ceil(n_frames/every)).
The decode stage is the pipeline's CPU hot spot at scale, so operators
take the already-partitioned table as-is and never force a repartition
of the binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.sources.video import decode_avi

_META_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fps", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("pix_sum", LongType(), False),
    ]
)


def video_meta(df: DataFrame, id_col: str = "video_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode and emit container metadata + the exact all-frame pixel sum
    (the decode-correctness checksum — every byte of every frame feeds
    it, so a single wrong pixel flips the oracle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for vid, buf in zip(b[id_col], b[bytes_col]):
                frames, fps, _codec = decode_avi(bytes(buf))
                n = len(frames)
                h, w, _ = frames[0].shape
                tot = int(sum(int(f.astype(np.int64).sum()) for f in frames))
                recs.append((vid, w, h, fps, n, (n * 1000) // max(fps, 1), tot))
            yield pd.DataFrame(recs, columns=[f.name for f in _META_SCHEMA.fields])

    return df.mapInPandas(run, schema=_META_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("mean_lum", DoubleType(), False),
    ]
)


def frame_sample_stats(
    df: DataFrame,
    every: int = 4,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Sample every ``every``-th frame (frame 0 always included — the
    training-data key-frame grid) and emit exact per-channel pixel sums
    plus mean luminance = (sum_r+sum_g+sum_b) / (3·w·h) rounded at 6
    (one IEEE divide, mirrored in the oracle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for vid, buf in zip(b[id_col], b[bytes_col]):
                frames, _fps, _codec = decode_avi(bytes(buf))
                for t in range(0, len(frames), every):
                    f = frames[t].astype(np.int64)
                    sr, sg, sb = (int(f[:, :, c].sum()) for c in range(3))
                    npix = f.shape[0] * f.shape[1]
                    lum = float(
                        np.floor((sr + sg + sb) / (3 * npix) * 1e6 + 0.5) / 1e6
                    )
                    recs.append((vid, t, sr, sg, sb, lum))
            yield pd.DataFrame(recs, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return df.mapInPandas(run, schema=_FRAME_SCHEMA)


_SCENE_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_cuts", LongType(), False),
        StructField("max_l1", LongType(), False),
        StructField("mean_l1", DoubleType(), False),
    ]
)


def scene_changes(
    df: DataFrame,
    threshold: int,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Scene-cut detection via consecutive-frame L1 distance: a cut is a
    frame t>0 with sum |f_t − f_{t−1}| > ``threshold`` (exact-integer —
    the standard shot-boundary energy heuristic). Also emits the max and
    mean inter-frame L1 (mean rounded at 6)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for vid, buf in zip(b[id_col], b[bytes_col]):
                frames, _fps, _codec = decode_avi(bytes(buf))
                arr = np.stack(frames).astype(np.int64)
                d = np.abs(arr[1:] - arr[:-1]).sum(axis=(1, 2, 3))
                cuts = int((d > threshold).sum())
                mean = float(np.floor(d.mean() * 1e6 + 0.5) / 1e6) if len(d) else 0.0
                recs.append(
                    (vid, len(frames), cuts, int(d.max()) if len(d) else 0, mean)
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _SCENE_SCHEMA.fields])

    return df.mapInPandas(run, schema=_SCENE_SCHEMA)


_KEYFRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("tensor", BinaryType(), False),
        StructField("t_w", IntegerType(), False),
        StructField("t_h", IntegerType(), False),
    ]
)


def keyframe_tensors(
    df: DataFrame,
    every: int = 4,
    size: int = 16,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Key-frame extraction for vision training: every ``every``-th frame,
    nearest-neighbor resized to ``size``×``size`` with the image tier's
    exact index map ``src = (d·src_dim)//size``, emitted as raw CHW uint8
    bytes (the tensorize contract of ``pipeline/images.py`` applied per
    frame). Value correctness rides the frame-stats oracle; the tensor
    path is pytest-pinned byte-exact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for vid, buf in zip(b[id_col], b[bytes_col]):
                frames, _fps, _codec = decode_avi(bytes(buf))
                h, w, _ = frames[0].shape
                yi = (np.arange(size) * h) // size
                xi = (np.arange(size) * w) // size
                for t in range(0, len(frames), every):
                    small = frames[t][yi[:, None], xi[None, :]]
                    chw = np.ascontiguousarray(small.transpose(2, 0, 1))
                    recs.append((vid, t, chw.tobytes(), size, size))
            yield pd.DataFrame(recs, columns=[f.name for f in _KEYFRAME_SCHEMA.fields])

    return df.mapInPandas(run, schema=_KEYFRAME_SCHEMA)
