"""Deterministic synthetic image+caption table (FIXTURES.md F1) + codec.

The target table shape is fixed by BASELINE.json input_hint:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` (+ geotag lon/lat). No image libraries exist
in this environment, so the codec is our own deterministic format pair —
real compression (zlib), real lossy quantization, real PSNR — with the
external-format decode path stubbed behind ``NotImplementedError`` as a
clearly-marked seam:

* ``fpng``: lossless — header + zlib(raw HxWx3 uint8);
* ``fjpg``: lossy — 6-bit uniform quantization then zlib. Quantization MSE
  ≈ 4²/12 → PSNR ≈ 46.9 dB, comfortably over the ≥40 dB fidelity gate.

Encoded bytes are canonical (generate → encode once; decode for checks),
matching the reference-fixture philosophy in FIXTURES.md F1.

Synthesis is ``spark.range(n)`` + ``mapInPandas`` — distributed, seeded,
batch-vectorized; the Spider synthetic source plays the same role in the
reference (``SpiderDataSource.scala:36-60``).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC_LOSSLESS = b"FPNG"
_MAGIC_LOSSY = b"FJPG"
_HDR = struct.Struct("<4sHHB")

_WORDS = (
    "granite harbor umbra lattice meridian copper fjord zenith tundra "
    "monsoon basalt aurora quartz savanna atoll caldera isthmus steppe "
    "delta mesa"
).split()


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """uint8 (h, w, 3) → canonical bytes."""
    h, w, c = arr.shape
    if fmt == "fpng":
        return _HDR.pack(_MAGIC_LOSSLESS, w, h, c) + zlib.compress(arr.tobytes(), 6)
    if fmt == "fjpg":
        q = (arr & 0xFC) | 0x02  # 6-bit quantize, bucket-centered
        return _HDR.pack(_MAGIC_LOSSY, w, h, c) + zlib.compress(q.tobytes(), 6)
    # seam for real formats (PIL/libjpeg not present in this environment)
    raise NotImplementedError(f"external codec {fmt!r} requires an image library")


def decode_image(buf: bytes) -> tuple[np.ndarray, str]:
    """canonical bytes → (uint8 (h, w, 3), fmt). Real JPEG bytes (JFIF/
    EXIF SOI magic) decode through the stdlib baseline codec
    (``sources/jpeg.py`` — r6 closes the external-image seam for the
    format cameras actually emit)."""
    if buf[:2] == b"\xFF\xD8":
        from sedona_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(bytes(buf)), "jpeg"
    if buf[:4] == b"GIF8":
        from sedona_spark.sources.gif import decode_gif

        return decode_gif(bytes(buf)), "gif"
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        from sedona_spark.sources.png import decode_png

        arr = decode_png(bytes(buf))
        if arr.shape[2] in (1, 2):      # gray / gray+alpha → RGB
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        return arr[:, :, :3], "png"     # RGBA → RGB
    magic, w, h, c = _HDR.unpack_from(buf, 0)
    if magic not in (_MAGIC_LOSSLESS, _MAGIC_LOSSY):
        raise NotImplementedError("external codec decode requires an image library")
    raw = zlib.decompress(buf[_HDR.size:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
    fmt = "fpng" if magic == _MAGIC_LOSSLESS else "fjpg"
    return arr, fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_SHAPE_BASES: dict = {}


def _shape_bases(w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-shape constant terms of the pixel formula (three shapes exist,
    so caching them removes the arange/broadcast rebuild per image)."""
    b = _SHAPE_BASES.get((w, h))
    if b is None:
        ys = np.arange(h, dtype=np.int64)[:, None, None]
        xs = np.arange(w, dtype=np.int64)[None, :, None]
        cs = np.arange(3, dtype=np.int64)[None, None, :]
        b = (xs * 3 + ys * 5 + cs * 7, xs * ys)  # (h,w,3), (h,w,1)
        _SHAPE_BASES[(w, h)] = b
    return b


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-photo for image id ``i`` (no PRNG object, pure
    broadcasting: gradient + id-keyed interference pattern)."""
    base1, base2 = _shape_bases(w, h)
    v = (i * 31 + base1) % 251
    v = v + (base2 * (i % 13 + 1)) % 67
    return (v % 256).astype(np.uint8)




def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual-hash-like value: 8×8 block-mean luminance vs global
    mean (deterministic, rotation of the classic average-hash)."""
    lum = arr.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    yb = (np.arange(h) * 8 // h).astype(np.int64)
    xb = (np.arange(w) * 8 // w).astype(np.int64)
    sums = np.zeros((8, 8))
    counts = np.zeros((8, 8))
    np.add.at(sums, (yb[:, None].repeat(w, 1), xb[None, :].repeat(h, 0)), lum)
    np.add.at(counts, (yb[:, None].repeat(w, 1), xb[None, :].repeat(h, 0)), 1.0)
    blocks = sums / np.maximum(counts, 1.0)
    bits = (blocks > blocks.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


_IMG_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
    ]
)


def _caption(i: int) -> str:
    ws = [_WORDS[(i * 7 + j * 13) % len(_WORDS)] for j in range(4)]
    return f"caption of image {i}: " + " ".join(ws)


def _geotag(i: int) -> tuple[float, float]:
    """Lattice + deterministic jitter over [0, 100) (FIXTURES.md F3: image
    geotags sit on the closed-form lattice domain)."""
    gx = (i * 2654435761) % 1000
    gy = (i * 2246822519) % 1000
    return (gx + 0.5) / 10.0, (gy + 0.5) / 10.0


def _rows_for_ids(ids: np.ndarray, columns: tuple[str, ...] | None = None) -> pd.DataFrame:
    """Fixture rows for the given ids. ``columns`` (schema-order subset)
    is the synth-side analog of parquet column pruning: a query that only
    aggregates metadata (w/h/caption) must not pay for pixel synthesis +
    zlib encode + phash of every image (guide §4: opaque python stages
    defeat Catalyst pruning, so the pruning lives in the generator)."""
    names = [f.name for f in _IMG_SCHEMA.fields]
    cols = names if columns is None else [n for n in names if n in set(columns)]
    want = set(cols)
    ii = np.asarray(ids, dtype=np.int64)
    mod3 = ii % 3
    ws = np.array([32, 64, 48], dtype=np.int64)[mod3]
    hs = np.array([32, 48, 96], dtype=np.int64)[mod3]
    out: dict[str, object] = {}
    if "image_id" in want:
        out["image_id"] = [f"img_{i:012d}" for i in map(int, ii)]
    if "bytes" in want or "phash" in want:
        # per-image loop on purpose: a stacked (n,h,w,3) int64 synthesis
        # measured 8× SLOWER than the cache-resident per-image formula
        # (the broadcast intermediates thrash L2); make_pixels reuses the
        # per-shape constant terms via _shape_bases
        blobs: list[bytes] = []
        hashes: list[int] = []
        for i, w, h in zip(map(int, ii), map(int, ws), map(int, hs)):
            arr = make_pixels(i, w, h)
            if "bytes" in want:
                blobs.append(encode_image(arr, "fpng" if i % 4 else "fjpg"))
            if "phash" in want:
                hashes.append(phash64(arr))
        if "bytes" in want:
            out["bytes"] = blobs
        if "phash" in want:
            out["phash"] = np.asarray(hashes, dtype=np.int64)
    if "w" in want:
        out["w"] = ws
    if "h" in want:
        out["h"] = hs
    if "fmt" in want:
        out["fmt"] = np.where(ii % 4 != 0, "fpng", "fjpg").tolist()
    if "caption" in want:
        out["caption"] = [_caption(int(i)) for i in ii]
    if "lon" in want or "lat" in want:
        gx = (ii * 2654435761) % 1000
        gy = (ii * 2246822519) % 1000
        if "lon" in want:
            out["lon"] = (gx + 0.5) / 10.0
        if "lat" in want:
            out["lat"] = (gy + 0.5) / 10.0
    return pd.DataFrame({c: out[c] for c in cols})


def keyed_fixture_table(
    spark: SparkSession,
    rows_fn,
    schema: StructType,
    *,
    sf_dir: str | None = None,
    table: str = "part",
    key_col: str = "p_partkey",
    id_mod: int | None = None,
    n: int | None = None,
    start: int = 0,
    partitions: int | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Shared scaffold for the deterministic multimodal fixtures (image,
    audio, video): take ids from a driver testdata table (oracle SQL can
    mirror the key column) or from ``spark.range``, prune with ``id_mod``
    BEFORE the CPU-heavy synth+encode stage (filter-pushdown posture),
    spread across the cluster (the key table is one tiny split at test
    SFs while synthesis is ~10⁴× CPU per input byte), then run
    ``rows_fn(ids) -> pd.DataFrame`` as one Arrow-batched pass.

    ``columns`` prunes the output schema to a subset (schema order
    preserved) and forwards the subset to ``rows_fn(ids, columns=...)``
    so the generator skips the synthesis of unused columns — Catalyst
    cannot prune into a python stage, so the pruning must live here."""
    if sf_dir is not None:
        src = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        ids = src.select(F.col(key_col).cast("long").alias("id"))
    else:
        ids = spark.range(start, start + int(n))
    if id_mod is not None:
        ids = ids.filter(F.col("id") % int(id_mod) == 0)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if partitions:
        ids = ids.repartition(partitions)

    if columns is not None:
        want = set(columns)
        schema = StructType([f for f in schema.fields if f.name in want])
        cols = tuple(f.name for f in schema.fields)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                yield rows_fn(b["id"].to_numpy(), columns=cols)
    else:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                yield rows_fn(b["id"].to_numpy())

    return ids.mapInPandas(gen, schema=schema)


def synthesize_images(spark: SparkSession, n: int, partitions: int = 0) -> DataFrame:
    """Distributed deterministic image table of ``n`` rows."""
    return keyed_fixture_table(
        spark, _rows_for_ids, _IMG_SCHEMA, n=n, partitions=partitions)


def images_from_part(
    spark: SparkSession, sf_dir: str, id_mod: int | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Image table keyed off the driver testdata ``part`` table (so oracle
    SQL can reproduce the metadata side deterministically).

    ``part.parquet`` is one tiny file at test SFs → one input split; image
    synthesis+encode is ~10⁴× CPU per input byte, so spread the ids across
    the cluster first (at real scale the stored image table already has
    thousands of splits — see bench.py's ``_ensure_images``).

    ``id_mod`` keeps only ids divisible by it BEFORE synthesis — the
    filter-pushdown any subset query needs (synthesizing 100× the rows to
    filter after the expensive stage is the anti-pattern).

    ``columns`` prunes synthesis to the named schema subset (e.g. a
    metadata-only aggregate must not pay for pixels+zlib+phash)."""
    return keyed_fixture_table(
        spark, _rows_for_ids, _IMG_SCHEMA,
        sf_dir=sf_dir, id_mod=id_mod, columns=columns)
