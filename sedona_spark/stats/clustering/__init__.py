from sedona_spark.stats.clustering.dbscan import dbscan  # noqa: F401
