"""RS_* raster functions: decode, tile-with-bytes, PSNR, reassembly.

Mirrors the needed subset of the reference's raster catalog:
``RS_Tile``/``RS_TileExplode`` (``common/.../raster/RasterConstructors.java:
600-760``: grid = ceil(w/tw) × ceil(h/th), row-major, optional nodata
padding), ``RS_FromGeoTiff``-style decode (ours: the deterministic fake
codec; external formats are a stubbed seam), band stats (``RS_ZonalStats``
analog lives in the tile→cell join + groupBy).

Pixel work happens in ``mapInPandas`` over Arrow batches: numpy slicing per
tile, no per-row Python beyond the unavoidable variable-shape loop that any
raster engine has (each image is already a single numpy op; the reference
iterates tiles per raster in Java the same way).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

from sedona_spark.sources.images import decode_image, encode_image, psnr

_TILE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("tile_w", IntegerType(), False),
        StructField("tile_h", IntegerType(), False),
        StructField("tile_bytes", BinaryType(), False),
    ]
)


def rs_tile_explode(
    images: DataFrame,
    tile_w: int,
    tile_h: int,
    pad: bool = False,
    pad_value: int = 0,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Image rows → tile rows with encoded tile bytes.

    Semantics of ``RasterConstructors.generateTiles``: row-major (tile_x,
    tile_y); edge tiles clipped, or padded to (tile_w, tile_h) with
    ``pad_value`` when ``pad``. Tiles re-encode with the source's format
    (lossless stays byte-deterministic; lossy is PSNR-checked).

    ``passthrough`` columns are replicated onto each tile row (avoids a
    join back to the image table — at 10^12 rows that join is a shuffle
    you never want)."""
    cols = images.select(id_col, bytes_col, *passthrough)
    schema = StructType(
        _TILE_SCHEMA.fields
        + [images.schema[c] for c in passthrough]
    )

    out_cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # columnar accumulation (dict-of-lists): ~5× faster than a
            # list-of-tuples DataFrame build at millions of tiles
            col_id, col_tx, col_ty, col_tw, col_th, col_buf = [], [], [], [], [], []
            rep = []  # source row index per tile, for passthrough replication
            ids = b[id_col].to_numpy()
            bufs = b[bytes_col].to_numpy()
            for row_i in range(len(ids)):
                arr, fmt = decode_image(bytes(bufs[row_i]))
                h, w = arr.shape[:2]
                ny = -(-h // tile_h)
                nx = -(-w // tile_w)
                for ty in range(ny):
                    for tx in range(nx):
                        t = arr[
                            ty * tile_h : min((ty + 1) * tile_h, h),
                            tx * tile_w : min((tx + 1) * tile_w, w),
                        ]
                        if pad and (t.shape[0] < tile_h or t.shape[1] < tile_w):
                            p = np.full(
                                (tile_h, tile_w, t.shape[2]), pad_value, np.uint8
                            )
                            p[: t.shape[0], : t.shape[1]] = t
                            t = p
                        col_id.append(ids[row_i])
                        col_tx.append(tx)
                        col_ty.append(ty)
                        col_tw.append(t.shape[1])
                        col_th.append(t.shape[0])
                        col_buf.append(encode_image(np.ascontiguousarray(t), fmt))
                        rep.append(row_i)
            data = {
                "image_id": col_id,
                "tile_x": col_tx,
                "tile_y": col_ty,
                "tile_w": col_tw,
                "tile_h": col_th,
                "tile_bytes": col_buf,
            }
            rep_idx = np.asarray(rep, dtype=np.int64)
            for c in passthrough:
                data[c] = b[c].to_numpy()[rep_idx]
            yield pd.DataFrame(data, columns=out_cols)

    return cols.mapInPandas(gen, schema=schema)


_META_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("dec_w", IntegerType(), False),
        StructField("dec_h", IntegerType(), False),
        StructField("dec_fmt", StringType(), False),
        StructField("mean_lum", DoubleType(), False),
    ]
)


def rs_decode_stats(
    images: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode + per-image stats (feature-extraction stand-in: the Spark-side
    plumbing — schema, batching, partitioning — is the real deliverable; a
    neural featurizer would slot into the same mapInPandas seam)."""
    cols = images.select(id_col, bytes_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b[id_col], b[bytes_col]):
                arr, fmt = decode_image(bytes(buf))
                # exact integer sum / exact size: the mean is then ONE IEEE
                # division of exact operands — bit-reproducible in any
                # engine (powers the DuckDB pixel-sum oracle)
                s = int(arr.sum(dtype=np.int64))
                recs.append(
                    (iid, arr.shape[1], arr.shape[0], fmt, s / arr.size)
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _META_SCHEMA.fields])

    return cols.mapInPandas(gen, schema=_META_SCHEMA)


@F.pandas_udf(IntegerType())
def _rs_value_udf(buf: pd.Series, x: pd.Series, y: pd.Series, band: pd.Series) -> pd.Series:
    out = np.empty(len(buf), dtype=np.int32)
    for i, (b, xi, yi, ci) in enumerate(zip(buf, x, y, band)):
        arr, _ = decode_image(bytes(b))
        out[i] = int(arr[int(yi), int(xi), int(ci)])
    return pd.Series(out)


def rs_value(buf, x, y, band) -> "F.Column":
    """RS_Value(raster, x, y, band): pixel value at (x, y) of band
    (``RasterBandAccessors.java`` analog; 0-based indices)."""
    return _rs_value_udf(buf, x, y, band)


_CLIP_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("clip_bytes", BinaryType(), False),
        StructField("clip_w", IntegerType(), False),
        StructField("clip_h", IntegerType(), False),
        StructField("clip_sum", LongType(), False),
    ]
)


def rs_clip(
    images: DataFrame,
    x0: int,
    y0: int,
    w: int,
    h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """RS_Clip analog: crop every raster to the window [x0, x0+w) × [y0,
    y0+h) (clamped to the raster), re-encode with the source format, and
    report exact integer pixel sums (the oracle handle)."""
    cols = images.select(id_col, bytes_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b[id_col], b[bytes_col]):
                arr, fmt = decode_image(bytes(buf))
                hh, ww = arr.shape[:2]
                t = arr[y0:min(y0 + h, hh), x0:min(x0 + w, ww)]
                recs.append(
                    (
                        iid,
                        encode_image(np.ascontiguousarray(t), fmt),
                        t.shape[1],
                        t.shape[0],
                        int(t.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _CLIP_SCHEMA.fields])

    return cols.mapInPandas(gen, schema=_CLIP_SCHEMA)


_ALGEBRA_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("out_bytes", BinaryType(), False),
        StructField("out_sum", LongType(), False),
        StructField("out_min", IntegerType(), False),
        StructField("out_max", IntegerType(), False),
    ]
)


def rs_map_algebra(
    images: DataFrame,
    expr: str = "clamp2x",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """RS_MapAlgebra analog: per-pixel arithmetic over the decoded bands,
    re-encoded losslessly. Supported expressions (vectorized numpy):

    * ``clamp2x``   — min(2·v, 255)
    * ``invert``    — 255 − v
    * ``band_mean`` — per-pixel mean over bands, broadcast back (grayscale)

    Exact integer ops only, so the DuckDB oracle regenerates the same
    values closed-form (``_image_decode_sql`` pattern)."""
    cols = images.select(id_col, bytes_col)

    def apply(arr: np.ndarray) -> np.ndarray:
        a = arr.astype(np.int64)
        if expr == "clamp2x":
            return np.minimum(a * 2, 255).astype(np.uint8)
        if expr == "invert":
            return (255 - a).astype(np.uint8)
        if expr == "band_mean":
            m = a.sum(axis=2) // a.shape[2]
            return np.repeat(m[:, :, None], a.shape[2], axis=2).astype(np.uint8)
        raise ValueError(f"unknown map-algebra expr {expr!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b[id_col], b[bytes_col]):
                arr, _ = decode_image(bytes(buf))
                t = apply(arr)
                recs.append(
                    (
                        iid,
                        encode_image(t, "fpng"),
                        int(t.sum(dtype=np.int64)),
                        int(t.min()),
                        int(t.max()),
                    )
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _ALGEBRA_SCHEMA.fields])

    return cols.mapInPandas(gen, schema=_ALGEBRA_SCHEMA)


@F.pandas_udf(DoubleType())
def rs_psnr(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two encoded images (the ≥40 dB fidelity gate)."""
    out = []
    for ba, bb in zip(a, b):
        pa, _ = decode_image(bytes(ba))
        pb, _ = decode_image(bytes(bb))
        out.append(psnr(pa, pb))
    return pd.Series(out)
