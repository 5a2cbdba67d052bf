from sedona_spark.geometry.kernels import (
    point_in_polygon_batch,
    polygons_intersect_batch,
    ring_envelope,
)
from sedona_spark.geometry.wkb import (
    wkb_point,
    wkb_polygon,
    parse_wkb,
    wkt,
)

__all__ = [
    "point_in_polygon_batch",
    "polygons_intersect_batch",
    "ring_envelope",
    "wkb_point",
    "wkb_polygon",
    "parse_wkb",
    "wkt",
]
