from sedona_spark.operators.range_query import range_query
from sedona_spark.operators.spatial_join import (
    pip_join,
    pip_join_rect,
    polygon_overlap_join,
    with_envelope,
)
from sedona_spark.operators.distance_join import distance_join
from sedona_spark.operators.knn import knn_join, knn_query
from sedona_spark.operators.tile import tile_grid, tile_assign
from sedona_spark.operators.zonal import (
    join_count_by_key,
    join_collect_by_key,
    zonal_stats,
)
from sedona_spark.operators.dbscan import dbscan
from sedona_spark.operators.hotspot import getis_ord_gstar
from sedona_spark.operators.outlier import local_outlier_factor
from sedona_spark.operators.distance_geo import distance_join_meters
from sedona_spark.operators.autocorrelation import morans_i

__all__ = [
    "range_query",
    "pip_join",
    "pip_join_rect",
    "polygon_overlap_join",
    "with_envelope",
    "distance_join",
    "knn_join",
    "knn_query",
    "tile_grid",
    "tile_assign",
    "join_count_by_key",
    "join_collect_by_key",
    "zonal_stats",
    "dbscan",
    "getis_ord_gstar",
    "local_outlier_factor",
    "distance_join_meters",
    "morans_i",
]
