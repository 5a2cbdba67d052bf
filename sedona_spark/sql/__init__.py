"""Reference-parity DataFrame-API function spellings
(``python/sedona/spark/sql/st_functions.py`` et al.): UpperCamel
``ST_*`` callables over this engine's columnar geometry model."""

from sedona_spark.sql import st_functions  # noqa: F401
