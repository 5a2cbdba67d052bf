"""Audio pipeline operators over the opaque-binary WAV column.

Decode, waveform features, resampling, fixed-window chunking, silence
detection and spectral features — each a single Arrow-batched
``mapInPandas`` pass so the PCM payload stays columnar bytes end-to-end
(one Python stage, no per-row UDF, no shuffle introduced by the op
itself). The feature math is exact-integer wherever an oracle mirrors it
(sums/sumsq/peaks/zero-crossings over int16 lanes), with IEEE ops only at
the final derived columns (one sqrt / one divide), mirrored on both
engines per the repo's rounding contract.

100 TB shape: every operator is map-only over the clip rows — the plan
is Scan → ArrowEvalPython/MapInPandas → project. Partition count is
whatever the source table carries; nothing here collects, samples, or
shuffles. Chunking explodes rows map-side (bounded fan-out =
ceil(n_samples / chunk)), so downstream operators repartition if they
need balance — same contract as RS_TileExplode.
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

from sedona_spark.sources.audio import decode_wav, encode_wav

_STATS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("sr", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("peak", LongType(), False),
        StructField("sum_s", LongType(), False),
        StructField("sumsq", LongType(), False),
        StructField("zcr", LongType(), False),
        StructField("rms", DoubleType(), False),
    ]
)


def wav_stats(df: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode each WAV and emit exact-integer waveform statistics over
    channel 0: peak = max |s|, sum/sumsq (int64-exact), zcr = count of
    strict sign flips between consecutive samples (negative↔non-negative),
    rms = sqrt(sumsq/n) rounded at 6 (the one IEEE op, mirrored)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for cid, buf in zip(b[id_col], b[bytes_col]):
                s, sr = decode_wav(bytes(buf))
                c0 = s[:, 0].astype(np.int64)
                n = len(c0)
                sumsq = int((c0 * c0).sum())
                neg = c0 < 0
                zcr = int((neg[1:] != neg[:-1]).sum())
                rms = float(np.floor(np.sqrt(sumsq / n) * 1e6 + 0.5) / 1e6)
                recs.append(
                    (
                        cid,
                        sr,
                        n,
                        (n * 1000) // sr,
                        int(np.abs(c0).max()),
                        int(c0.sum()),
                        sumsq,
                        zcr,
                        rms,
                    )
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _STATS_SCHEMA.fields])

    return df.mapInPandas(run, schema=_STATS_SCHEMA)


_RESAMPLE_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sr", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_s", LongType(), False),
    ]
)


def audio_resample(
    df: DataFrame,
    target_sr: int,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    linear: bool = False,
) -> DataFrame:
    """Resample each clip to ``target_sr``.

    Default is the exact-integer nearest-sample map
    ``src_t = (t * sr) // target_sr`` (mirrors in SQL — the value oracle);
    ``linear=True`` switches to linear interpolation between the two
    bracketing source samples (truncated back to int16), the quality path.
    Emits re-encoded WAV bytes plus the output-sample sum as the checksum
    column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for cid, buf in zip(b[id_col], b[bytes_col]):
                s, sr = decode_wav(bytes(buf))
                n = len(s)
                m = (n * target_sr) // sr
                t = np.arange(m, dtype=np.int64)
                if linear:
                    pos = t * sr / target_sr
                    i0 = np.minimum(pos.astype(np.int64), n - 1)
                    i1 = np.minimum(i0 + 1, n - 1)
                    fr = pos - i0
                    out = (
                        s[i0].astype(np.float64) * (1.0 - fr[:, None])
                        + s[i1].astype(np.float64) * fr[:, None]
                    ).astype(np.int16)
                else:
                    out = s[(t * sr) // target_sr]
                recs.append(
                    (
                        cid,
                        encode_wav(out, target_sr),
                        target_sr,
                        m,
                        int(out[:, 0].astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _RESAMPLE_SCHEMA.fields])

    return df.mapInPandas(run, schema=_RESAMPLE_SCHEMA)


_CHUNK_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("n", LongType(), False),
        StructField("sumsq", LongType(), False),
    ]
)


def audio_chunks(
    df: DataFrame,
    chunk_samples: int,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    drop_last: bool = False,
) -> DataFrame:
    """Split each clip into fixed-length windows of ``chunk_samples``
    (training-clip segmentation). The tail window is kept short unless
    ``drop_last``. Each output row re-encodes its window as standalone
    WAV bytes and carries the exact-int sumsq checksum."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for cid, buf in zip(b[id_col], b[bytes_col]):
                s, sr = decode_wav(bytes(buf))
                n = len(s)
                for k, lo in enumerate(range(0, n, chunk_samples)):
                    win = s[lo : lo + chunk_samples]
                    if drop_last and len(win) < chunk_samples:
                        break
                    c0 = win[:, 0].astype(np.int64)
                    recs.append(
                        (cid, k, encode_wav(win, sr), len(win), int((c0 * c0).sum()))
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in _CHUNK_SCHEMA.fields])

    return df.mapInPandas(run, schema=_CHUNK_SCHEMA)


_SILENCE_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_silent", LongType(), False),
        StructField("silence_ratio", DoubleType(), False),
    ]
)


def silence_stats(
    df: DataFrame,
    frame: int = 400,
    threshold: int = 200,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Frame-level silence detection: a frame of ``frame`` samples is
    silent when its peak |s| < ``threshold`` (integer-exact; the classic
    VAD energy gate, quality-filter posture of the text tier). The tail
    partial frame counts. ratio = n_silent/n_frames rounded at 6."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for cid, buf in zip(b[id_col], b[bytes_col]):
                s, _sr = decode_wav(bytes(buf))
                c0 = np.abs(s[:, 0].astype(np.int64))
                n = len(c0)
                nf = (n + frame - 1) // frame
                silent = 0
                for lo in range(0, n, frame):
                    if int(c0[lo : lo + frame].max()) < threshold:
                        silent += 1
                ratio = float(np.floor(silent / nf * 1e6 + 0.5) / 1e6)
                recs.append((cid, nf, silent, ratio))
            yield pd.DataFrame(recs, columns=[f.name for f in _SILENCE_SCHEMA.fields])

    return df.mapInPandas(run, schema=_SILENCE_SCHEMA)


_SPECTRAL_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("dominant_hz", DoubleType(), False),
        StructField("centroid_hz", DoubleType(), False),
        StructField("bandwidth_hz", DoubleType(), False),
        StructField("flatness", DoubleType(), False),
    ]
)


def spectral_features(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    n_fft: int = 1024,
) -> DataFrame:
    """Whole-clip magnitude-spectrum features via numpy rFFT over
    ``n_fft``-sample frames (Hann window), power-averaged across frames:
    dominant bin frequency, spectral centroid, bandwidth (power-weighted
    std), and spectral flatness (geomean/mean of power). Not
    SQL-expressible — correctness is pinned by the analytic pure-tone
    pytest (a k-bin cosine must put its dominant bin at k)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        for b in batches:
            recs = []
            for cid, buf in zip(b[id_col], b[bytes_col]):
                s, sr = decode_wav(bytes(buf))
                c0 = s[:, 0].astype(np.float64)
                nf = len(c0) // n_fft
                if nf == 0:
                    c0 = np.pad(c0, (0, n_fft - len(c0)))
                    nf = 1
                frames = c0[: nf * n_fft].reshape(nf, n_fft)
                spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
                p = spec.mean(axis=0)
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
                tot = p.sum()
                if tot <= 0:
                    recs.append((cid, 0.0, 0.0, 0.0, 0.0))
                    continue
                cen = float((freqs * p).sum() / tot)
                bw = float(np.sqrt(((freqs - cen) ** 2 * p).sum() / tot))
                flat = float(
                    np.exp(np.mean(np.log(p + 1e-12))) / (p.mean() + 1e-12)
                )
                recs.append(
                    (cid, float(freqs[int(p.argmax())]), cen, bw, flat)
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _SPECTRAL_SCHEMA.fields])

    return df.mapInPandas(run, schema=_SPECTRAL_SCHEMA)
