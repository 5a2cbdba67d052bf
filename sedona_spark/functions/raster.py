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
) -> DataFrame:
    """Image rows → tile rows with encoded tile bytes.

    Semantics of ``RasterConstructors.generateTiles``: row-major (tile_x,
    tile_y); edge tiles clipped, or padded to (tile_w, tile_h) with
    ``pad_value`` when ``pad``. Tiles re-encode with the source's format
    (lossless stays byte-deterministic; lossy is PSNR-checked)."""
    cols = images.select(id_col, bytes_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for iid, buf in zip(b[id_col], b[bytes_col]):
                arr, fmt = decode_image(bytes(buf))
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
                        recs.append(
                            (
                                iid,
                                tx,
                                ty,
                                t.shape[1],
                                t.shape[0],
                                encode_image(np.ascontiguousarray(t), fmt),
                            )
                        )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _TILE_SCHEMA.fields]
            )

    return cols.mapInPandas(gen, schema=_TILE_SCHEMA)


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
                recs.append(
                    (iid, arr.shape[1], arr.shape[0], fmt, float(arr.mean()))
                )
            yield pd.DataFrame(recs, columns=[f.name for f in _META_SCHEMA.fields])

    return cols.mapInPandas(gen, schema=_META_SCHEMA)


@F.pandas_udf(DoubleType())
def rs_psnr(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two encoded images (the ≥40 dB fidelity gate)."""
    out = []
    for ba, bb in zip(a, b):
        pa, _ = decode_image(bytes(ba))
        pb, _ = decode_image(bytes(bb))
        out.append(psnr(pa, pb))
    return pd.Series(out)
