"""Reference-parity DataFrame-API function spellings
(``python/sedona/spark/sql/st_functions.py`` et al.): UpperCamel
``ST_*`` callables over this engine's columnar geometry model.

This package shares its name with the engine's physical-function SQL
entry point (``sedona_spark.sql(spark, "... ST_DBSCAN(...) ...")`` —
``physical_sql.sql``). Importing a submodule would normally clobber
that attribute on the parent package with this module object, so the
module is made CALLABLE and delegates: both spellings keep working in
any import order.
"""

import sys
import types


class _CallableSqlModule(types.ModuleType):
    def __call__(self, spark, text):
        from sedona_spark.physical_sql import sql as _sql

        return _sql(spark, text)


sys.modules[__name__].__class__ = _CallableSqlModule

from sedona_spark.sql import st_functions  # noqa: F401,E402
