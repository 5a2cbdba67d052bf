from sedona_spark.stats.autocorrelation.moran import Moran, MoranResult  # noqa: F401,E501
