"""Driver-side raster handle — parity with the reference's
``python/sedona/spark/raster/sedona_raster.py:138-260`` (SedonaRaster /
InDbSedonaRaster), which lets a user inspect COLLECTED raster rows in
python (``as_numpy``, affine accessors) without the JVM.

This engine's raster is already a plain struct row ``(w, h, bands, ulx,
uly, sx, sy, srid, buf)`` (band-interleaved uint8 — the columnar model
every RS_ function shares), so the handle is a thin numpy view: no
rasterio/GDAL, no serde. Driver-side BY DESIGN — anything at data scale
stays in the RS_ Column functions; this class exists for the last-mile
"collect a few rows and look at them" workflow the reference serves.
"""

from __future__ import annotations

import numpy as np


class SedonaRaster:
    """A collected raster row as a python object.

    Accepts either a Spark ``Row`` (from ``df.collect()``) with the
    engine's raster struct fields, or the fields directly.
    """

    def __init__(self, w: int, h: int, bands: int, ulx: float,
                 uly: float, sx: float, sy: float, srid: int,
                 buf: bytes):
        self._w, self._h, self._bands = int(w), int(h), int(bands)
        self._ulx, self._uly = float(ulx), float(uly)
        self._sx, self._sy = float(sx), float(sy)
        self._srid = int(srid)
        self._buf = bytes(buf)

    @classmethod
    def from_row(cls, row) -> "SedonaRaster":
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        return cls(d["w"], d["h"], d.get("bands", d.get("nb", 1)),
                   d.get("ulx", 0.0), d.get("uly", 0.0),
                   d.get("sx", 1.0), d.get("sy", -1.0),
                   d.get("srid", 0), d["buf"])

    @property
    def width(self) -> int:
        return self._w

    @property
    def height(self) -> int:
        return self._h

    @property
    def num_bands(self) -> int:
        return self._bands

    @property
    def srid(self) -> int:
        return self._srid

    @property
    def affine_trans(self) -> tuple[float, float, float, float, float,
                                    float]:
        """GDAL-order geotransform (ulx, sx, 0, uly, 0, sy) — north-up,
        no rotation (the engine's raster model)."""
        return (self._ulx, self._sx, 0.0, self._uly, 0.0, self._sy)

    def as_numpy(self) -> np.ndarray:
        """(bands, h, w) uint8 — the reference's band-major layout."""
        a = np.frombuffer(self._buf, dtype=np.uint8)
        return a.reshape(self._h, self._w, self._bands).transpose(2, 0, 1)

    def world_to_grid(self, wx: float, wy: float) -> tuple[int, int]:
        """(col, row) of the pixel containing a world point."""
        return (int(np.floor((wx - self._ulx) / self._sx)),
                int(np.floor((wy - self._uly) / self._sy)))

    def grid_to_world(self, col: int, row: int) -> tuple[float, float]:
        """World coordinates of a pixel's upper-left corner."""
        return (self._ulx + col * self._sx, self._uly + row * self._sy)

    def value_at(self, wx: float, wy: float, band: int = 0):
        """Pixel value at a world point; None outside the extent
        (PixelFunctions.values semantics)."""
        c, r = self.world_to_grid(wx, wy)
        if not (0 <= c < self._w and 0 <= r < self._h):
            return None
        return int(self.as_numpy()[band, r, c])
