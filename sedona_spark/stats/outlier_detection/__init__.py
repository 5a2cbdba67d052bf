from sedona_spark.stats.outlier_detection.local_outlier_factor import (  # noqa: F401,E501
    local_outlier_factor,
)
