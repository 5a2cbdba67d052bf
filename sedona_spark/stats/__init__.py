"""Reference-parity spellings of the stats tier.

The reference's Python stats surface (``python/sedona/spark/stats/``)
is a set of thin wrappers over Scala jobs; these modules keep the SAME
module paths, function names, and keyword names so a user's imports
keep working —

    from sedona_spark.stats.clustering.dbscan import dbscan
    from sedona_spark.stats.hotspot_detection.getis_ord import g_local
    from sedona_spark.stats.outlier_detection.local_outlier_factor \
        import local_outlier_factor
    from sedona_spark.stats.weighting import add_distance_band_column
    from sedona_spark.stats.autocorrelation.moran import Moran

— but delegate to this engine's Column/cell-grid operators
(``operators/dbscan.py``, ``hotspot.py``, ``outlier.py``,
``weighting.py``, ``autocorrelation.py``). The geometry model differs
by design (x/y columns, not a GeometryType UDT), so each wrapper takes
the ``x=``/``y=``/``id_col=`` column names where the reference would
sniff a geometry column.
"""

from sedona_spark.stats import weighting  # noqa: F401
