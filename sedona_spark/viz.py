"""Visualization tier — the reference's ``sedona_viz`` expressions
(``spark/spark-*/sedona_viz/expressions/{Pixelize,Colorize,Render}.scala``
and the GeoSparkViz paper's pixelize → aggregate → colorize → render
pipeline), re-expressed Spark-first (r5; closes the survey's last ⬜
tier).

* **ST_Pixelize** — geometry → the pixel ids of an output raster whose
  CENTERS fall inside it (the map-side rasterization step). One
  Arrow-batched eval over the same ray-casting kernel the range query
  uses; pair with ``explode`` for the long (pixel, weight) form the
  aggregation step consumes.
* **ST_Colorize** — weight → packed ARGB int; pure Column bit
  arithmetic (whole-stage codegen), linear ramp like the reference's
  uniform colorizer.
* **render_tiles** — the reduce side: group the (pixel, color) long
  format by tile key and paint each group into an encoded image via
  ``applyInPandas`` (numpy fill + the engine codec). At 100 TB this is
  exactly the GeoSparkViz shape: pixelize map-side, ONE shuffle on the
  tile key, paint per tile — no driver-side image assembly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from sedona_spark.geometry import kernels
from sedona_spark.sources.images import encode_image


@F.pandas_udf(ArrayType(LongType()))
def _pixelize_udf(
    ring: pd.Series, env: pd.Series, w: pd.Series, h: pd.Series
) -> pd.Series:
    out = []
    for r, e, wi, hi in zip(ring, env, w, h):
        x0, y0, x1, y1 = (float(v) for v in e)
        wi, hi = int(wi), int(hi)
        cx = x0 + (np.arange(wi) + 0.5) * (x1 - x0) / wi
        cy = y0 + (np.arange(hi) + 0.5) * (y1 - y0) / hi
        gx, gy = np.meshgrid(cx, cy)
        inside = kernels.points_in_one_polygon(
            np.asarray(r, dtype=np.float64), gx.ravel(), gy.ravel()
        ) > 0
        ids = np.nonzero(inside)[0].astype(np.int64)  # id = row * w + col
        out.append(ids)
    return pd.Series(out)


def st_pixelize(ring: Column, env: Column, w, h) -> Column:
    """ST_Pixelize: pixel ids (row-major, id = y·w + x) of the w×h grid
    over ``env`` whose centers fall inside ``ring``."""
    w = w if isinstance(w, Column) else F.lit(int(w))
    h = h if isinstance(h, Column) else F.lit(int(h))
    return _pixelize_udf(ring, env, w, h)


def st_colorize(weight: Column, max_weight: Column | float) -> Column:
    """ST_Colorize: packed ARGB int32 — opaque alpha, red ramp
    proportional to weight/max (the reference's uniform colorizer
    semantics), green/blue fixed mid-tone."""
    mw = max_weight if isinstance(max_weight, Column) else F.lit(float(max_weight))
    r = F.least(
        F.lit(255), F.round(F.lit(255.0) * weight / mw, 0).cast("int")
    )
    return (
        F.lit(255 << 24).cast("long") + r.cast("long") * F.lit(1 << 16)
        + F.lit((128 << 8) + 64).cast("long")
    )


def render_tiles(
    px: DataFrame,
    w: int,
    h: int,
    tile_col: str = "tile_id",
    pixel_col: str = "pixel_id",
    color_col: str = "color",
    fmt: str = "fpng",
) -> DataFrame:
    """Render: one encoded image per tile group from the long
    (tile, pixel, color) format — ``applyInPandas`` paint, codec bytes
    out. Overlapping writes resolve by max color (deterministic).
    ``fmt="png"`` emits REAL PNG tiles (``sources/png.py``) — the
    GeoSparkViz output format; the default engine codec stays the
    byte-deterministic test format."""
    w_, h_ = int(w), int(h)
    if fmt == "png":
        from sedona_spark.sources.png import encode_png as _enc
        enc = _enc
    else:
        enc = lambda img: encode_image(img, fmt)  # noqa: E731

    def paint(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((h_, w_, 3), dtype=np.uint8)
        agg = pdf.groupby(pixel_col)[color_col].max()
        ids = agg.index.to_numpy(dtype=np.int64)
        cols = agg.to_numpy(dtype=np.int64)
        ys, xs = ids // w_, ids % w_
        img[ys, xs, 0] = (cols >> 16) & 0xFF
        img[ys, xs, 1] = (cols >> 8) & 0xFF
        img[ys, xs, 2] = cols & 0xFF
        return pd.DataFrame(
            {
                tile_col: [pdf[tile_col].iloc[0]],
                "n_painted": [len(ids)],
                "png": [enc(img)],
            }
        )

    return px.groupBy(tile_col).applyInPandas(
        paint, schema=f"{tile_col} long, n_painted long, png binary"
    )
