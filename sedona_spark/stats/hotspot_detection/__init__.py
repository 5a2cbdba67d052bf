from sedona_spark.stats.hotspot_detection.getis_ord import g_local  # noqa: F401,E501
