from sedona_spark.functions.st import (
    pip_class,
    st_contains_point,
    st_covers_point,
    st_intersects_polygons,
    st_distance_sq,
    st_dwithin,
    env_intersects,
    env_contains_point,
    st_point_wkb,
    st_polygon_wkb,
    st_astext,
    st_envelope_cols,
)

__all__ = [
    "pip_class",
    "st_contains_point",
    "st_covers_point",
    "st_intersects_polygons",
    "st_distance_sq",
    "st_dwithin",
    "env_intersects",
    "env_contains_point",
    "st_point_wkb",
    "st_polygon_wkb",
    "st_astext",
    "st_envelope_cols",
]
