"""Deterministic synthetic audio table + real RIFF/WAVE PCM codec.

Multimodal training pipelines treat audio as an opaque ``binary`` column
with typed metadata (sample rate, channel count, sample count) and push
decode / feature-extraction / resample / chunking through Arrow-batched
``mapInPandas`` — the same posture as the image tier (``sources/images.py``).
No audio library exists in this environment, so the codec is the one format
that needs none: canonical RIFF/WAVE with integer PCM payloads (the
published WAVEFORMAT layout — ``fmt `` chunk with wFormatTag=1, interleaved
little-endian frames, ``data`` chunk). The encoder emits byte-exact
canonical files; the decoder walks RIFF chunks generically (skipping
LIST/INFO etc.), so real PCM ``.wav`` files from the wild decode too.
Compressed formats (MP3/AAC/FLAC) stay behind a clearly-marked
``NotImplementedError`` seam, mirroring the image tier's external-codec
seam.

Synthesis is keyed off the driver testdata ``supplier`` table so the
DuckDB oracle can regenerate every sample closed-form: sample ``t`` of
clip ``i`` is the pure-integer waveform ``_SAMPLE_FORMULA`` below —
exact on both engines, no float drift.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_PCM16 = 1  # WAVEFORMAT wFormatTag for integer PCM
_SEAM_MAGICS = {
    b"ID3": "mp3",  # ID3v2-tagged MPEG audio
    b"\xff\xfb": "mp3",
    b"\xff\xf3": "mp3",
    b"fLaC": "flac",
    b"OggS": "ogg",
}


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """int16 ``(n,)`` mono or ``(n, ch)`` interleaved → canonical
    RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", _PCM16, ch, sr, sr * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav24(samples: np.ndarray, sr: int) -> bytes:
    """int32 mono/interleaved values in ±2²³ → 24-bit PCM RIFF/WAVE
    (3-byte little-endian frames, the studio-master layout)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    v = samples.astype(np.int64)
    if (v > (1 << 23) - 1).any() or (v < -(1 << 23)).any():
        raise ValueError("24-bit PCM sample out of range")
    u = (v & 0xFFFFFF).astype(np.uint32)
    flat = u.reshape(-1)
    payload = np.empty((flat.size, 3), dtype=np.uint8)
    payload[:, 0] = flat & 0xFF
    payload[:, 1] = (flat >> 8) & 0xFF
    payload[:, 2] = (flat >> 16) & 0xFF
    block = ch * 3
    fmt = struct.pack("<HHIIHH", _PCM16, ch, sr, sr * block, block, 24)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", payload.size) + payload.tobytes()
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


_IEEE_FLOAT = 3       # WAVE_FORMAT_IEEE_FLOAT
_EXTENSIBLE = 0xFFFE  # WAVE_FORMAT_EXTENSIBLE (effective tag in SubFormat)


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (integer samples ``(n, ch)``, sample_rate).

    Generic RIFF chunk walk: tolerates extra chunks (LIST, fact, cue)
    and a fmt chunk longer than 16 bytes (WAVEFORMATEX cbSize tail), so
    real-world files decode, not just our canonical output. Sample
    formats (all published WAVEFORMAT layouts, no audio library):

    * 16-bit PCM → int16 (the canonical encode format)
    * 8-bit PCM → int16, widened from offset-binary per the WAVE spec
    * 24-bit PCM → int32 at full 24-bit precision (sign-extended
      3-byte little-endian frames — the studio-master layout)
    * 32-bit PCM → int32
    * 32/64-bit IEEE float (tag 3) → int16 via round(clip(x,−1,1)·32767),
      the standard float→PCM conversion
    * WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) → effective tag read from the
      SubFormat GUID (how >16-bit files are usually labeled)

    Only genuinely compressed codecs (MP3/AAC/FLAC/ADPCM…) remain behind
    the external-library seam."""
    for magic, name in _SEAM_MAGICS.items():
        if buf[: len(magic)] == magic:
            raise NotImplementedError(
                f"compressed audio ({name}) requires an audio library"
            )
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + struct.unpack_from("<I", buf, 4)[0]
    sr = ch = bits = tag = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        clen = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == _EXTENSIBLE and len(body) >= 26:
                # WAVEFORMATEXTENSIBLE: cbSize(2) validBits(2) mask(4)
                # SubFormat GUID — first 2 bytes are the effective tag
                tag = struct.unpack_from("<H", body, 24)[0]
            if tag not in (_PCM16, _IEEE_FLOAT):
                raise NotImplementedError(
                    f"WAVE format tag {tag} (compressed) requires an "
                    f"audio library"
                )
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError(
                    f"truncated WAVE data chunk: declared {clen} bytes, "
                    f"got {len(body)}")
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAVE file missing fmt/data chunk")
    if tag == _IEEE_FLOAT:
        if bits == 32:
            f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(data, dtype="<f8")
        else:
            raise ValueError(f"IEEE-float WAVE with {bits}-bit samples")
        arr = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    elif bits == 24:
        nb = len(data) // 3
        raw = np.frombuffer(data, dtype=np.uint8)[: nb * 3].reshape(nb, 3)
        arr = (raw[:, 0].astype(np.int32)
               | (raw[:, 1].astype(np.int32) << 8)
               | (raw[:, 2].astype(np.int32) << 16))
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4")
    else:
        raise NotImplementedError(f"{bits}-bit PCM requires an audio library")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), int(sr)


# --------------------------------------------------------------------------
# deterministic fixture — exact-integer waveform, mirrored in oracle SQL
# --------------------------------------------------------------------------

_SR = 16000

# sample t of clip i (both engines evaluate this exactly, int64): a
# pseudo-random carrier gated by a 400-sample on/off envelope, so clips
# have genuine silent stretches (VAD / silence-ratio ops see real signal):
#   base(i, t) = ((i*37 + t*11 + (t*t) % 101) % 1601) - 800
#   s(i, t)    = base(i, t) * (0 if ((t // 400) + i) % 4 == 0 else 1)
_GATE_FRAME = 400


def make_samples(i: int, n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.int64)
    base = ((i * 37 + t * 11 + (t * t) % 101) % 1601) - 800
    gate = ((t // _GATE_FRAME + i) % 4 != 0).astype(np.int64)
    return (base * gate).astype(np.int16)


def clip_len(i: int) -> int:
    """Deterministic per-clip sample count (mirrored in oracle SQL)."""
    return 2000 + (i % 7) * 500


_AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sr", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("channels", IntegerType(), False),
    ]
)


def _rows_for_ids(ids: np.ndarray) -> pd.DataFrame:
    recs = []
    for i in map(int, ids):
        n = clip_len(i)
        s = make_samples(i, n)
        recs.append((f"clip_{i:012d}", encode_wav(s, _SR), _SR, n, 1))
    return pd.DataFrame(recs, columns=[f.name for f in _AUDIO_SCHEMA.fields])


def audio_from_supplier(
    spark: SparkSession, sf_dir: str, id_mod: int | None = None
) -> DataFrame:
    """Audio table keyed off the driver testdata ``supplier`` table (so
    oracle SQL reproduces every clip closed-form). Same scale posture as
    ``images_from_part``: spread ids across the cluster before the
    CPU-heavy synth+encode stage; ``id_mod`` prunes BEFORE synthesis."""
    from sedona_spark.sources.images import keyed_fixture_table

    return keyed_fixture_table(
        spark, _rows_for_ids, _AUDIO_SCHEMA,
        sf_dir=sf_dir, table="supplier", key_col="s_suppkey",
        id_mod=id_mod)


def synthesize_audio(spark: SparkSession, n: int, partitions: int = 0) -> DataFrame:
    """Distributed deterministic audio table of ``n`` rows (bench feeder)."""
    from sedona_spark.sources.images import keyed_fixture_table

    return keyed_fixture_table(
        spark, _rows_for_ids, _AUDIO_SCHEMA,
        n=n, start=1, partitions=partitions)


def _rows24_for_ids(ids: np.ndarray) -> pd.DataFrame:
    recs = []
    for i in map(int, ids):
        n = clip_len(i)
        t = np.arange(n, dtype=np.int64)
        base = ((i * 37 + t * 11 + (t * t) % 101) % 1601) - 800
        gate = ((t // _GATE_FRAME + i) % 4 != 0).astype(np.int64)
        s24 = (base * gate * 2048).astype(np.int32)  # ±1.64M, well in 24-bit
        recs.append((f"clip_{i:012d}", encode_wav24(s24, _SR), _SR, n, 1))
    return pd.DataFrame(recs, columns=[f.name for f in _AUDIO_SCHEMA.fields])


def wav24_from_supplier(
    spark: SparkSession, sf_dir: str, id_mod: int | None = None
) -> DataFrame:
    """24-bit twin of :func:`audio_from_supplier` — same gated waveform
    scaled ×2048 into the >16-bit range, stored as 3-byte PCM frames, so
    an oracle can certify the 24-bit decode path end to end."""
    from sedona_spark.sources.images import keyed_fixture_table

    return keyed_fixture_table(
        spark, _rows24_for_ids, _AUDIO_SCHEMA,
        sf_dir=sf_dir, table="supplier", key_col="s_suppkey",
        id_mod=id_mod)
