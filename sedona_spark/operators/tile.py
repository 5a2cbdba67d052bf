"""Raster↔vector tiling: split images into a tile grid and assign each tile
to the spatial cells its geo-footprint covers.

Reference semantics:

* tile grid — ``RS_Tile``/``RS_TileExplode``
  (``common/.../raster/RasterConstructors.java:600-760 generateTiles``):
  grid is ``ceil(w/tile_w) × ceil(h/tile_h)``, row-major (tile_x, tile_y),
  edge tiles clipped (or padded when requested);
* raster↔vector join — both sides coarsened to envelopes then joined
  (``strategy/join/TraitJoinQueryBase.scala:60-86``,
  ``JoinQueryDetector.scala:157-177``); our cell grid plays the role of the
  envelope prefilter.

The metadata path below is pure Column arithmetic — the geo-assignment of a
trillion tiles never touches Python; pixel extraction lives separately in
``sedona_spark.functions.raster`` so you only pay for bytes when you ask for
them (column pruning keeps ``bytes`` out of this scan entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sedona_spark import cells


def _ceil_div(a: Column, b: int) -> Column:
    return F.floor((a + F.lit(b - 1)) / F.lit(b)).cast("long")


def tile_grid(
    images: DataFrame,
    tile_w: int,
    tile_h: int,
    w: str = "w",
    h: str = "h",
) -> DataFrame:
    """Explode each image row into its tile-grid rows (row-major), adding
    ``tile_x``, ``tile_y``, and the clipped pixel window ``px0/py0/pw/ph``.
    Pure SQL; bytes column untouched (pruned if not selected)."""
    nx = _ceil_div(F.col(w), tile_w)
    ny = _ceil_div(F.col(h), tile_h)
    df = (
        images.withColumn("tile_y", F.explode(F.sequence(F.lit(0), ny - 1)))
        .withColumn("tile_x", F.explode(F.sequence(F.lit(0), nx - 1)))
    )
    px0 = F.col("tile_x") * tile_w
    py0 = F.col("tile_y") * tile_h
    return (
        df.withColumn("px0", px0.cast("int"))
        .withColumn("py0", py0.cast("int"))
        .withColumn("pw", F.least(F.lit(tile_w), F.col(w) - px0).cast("int"))
        .withColumn("ph", F.least(F.lit(tile_h), F.col(h) - py0).cast("int"))
    )


def tile_assign(
    images: DataFrame,
    tile_w: int,
    tile_h: int,
    level: int,
    lon: str = "lon",
    lat: str = "lat",
    span_lon: str | float = 0.1,
    span_lat: str | float = 0.1,
    w: str = "w",
    h: str = "h",
) -> DataFrame:
    """Tile each image and assign every tile the int64 cell of its
    geo-footprint center.

    The image footprint is the rectangle anchored at (lon, lat) spanning
    (span_lon, span_lat) degrees; tile (tx, ty) owns the proportional pixel
    sub-rectangle (y axis image-down → latitude-down, matching raster
    convention in ``RasterConstructors``). One cell per tile (tiles are
    chosen ≤ cell size at ``level``); pure Column math end-to-end.
    """
    t = tile_grid(images, tile_w, tile_h, w=w, h=h)
    slon = F.col(span_lon) if isinstance(span_lon, str) else F.lit(float(span_lon))
    slat = F.col(span_lat) if isinstance(span_lat, str) else F.lit(float(span_lat))
    # tile center in pixel space → geo space
    cx = (F.col("px0") + F.col("pw") / F.lit(2.0)) / F.col(w)
    cy = (F.col("py0") + F.col("ph") / F.lit(2.0)) / F.col(h)
    tlon = F.col(lon) + cx * slon
    tlat = F.col(lat) - cy * slat
    return t.withColumn("tile_lon", tlon).withColumn("tile_lat", tlat).withColumn(
        "tile_cell", cells.cell_id(F.col("tile_lon"), F.col("tile_lat"), level)
    )
