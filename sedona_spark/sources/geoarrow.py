"""GeoArrow interchange (reference:
``python/sedona/spark/geoarrow/geoarrow.py:39-104`` — dataframe_to_arrow).

The reference converts a Sedona DataFrame to a pyarrow Table whose geometry
column carries the GeoArrow extension type, so geopandas/lonboard/GDAL can
consume it zero-copy. This engine stores geometry as WKB ``binary`` columns
(no UDT), which maps directly onto the ``geoarrow.wkb`` extension encoding:
attach the extension name + CRS metadata to the field and every GeoArrow
consumer reads it. Spark 4's native ``DataFrame.toArrow()`` does the
columnar transfer (Arrow IPC, no per-row python).

Driver-side by design: Arrow interchange is for handing a RESULT to local
tooling (plot, geopandas). The distributed path stays parquet/GeoParquet
(``sources/geoparquet.py``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def to_geoarrow_table(
    df: DataFrame,
    geometry_col: str = "geometry",
    crs: str = "OGC:CRS84",
):
    """DataFrame (with a WKB ``binary`` geometry column) → pyarrow Table
    whose geometry field is tagged ``geoarrow.wkb`` with CRS metadata —
    the GeoArrow 1.0 extension contract geopandas'
    ``GeoDataFrame.from_arrow`` consumes."""
    import pyarrow as pa

    tbl = df.toArrow()
    idx = tbl.schema.get_field_index(geometry_col)
    field = tbl.schema.field(idx)
    ext_meta = json.dumps({"crs": crs}).encode()
    tagged = field.with_metadata(
        {
            b"ARROW:extension:name": b"geoarrow.wkb",
            b"ARROW:extension:metadata": ext_meta,
        }
    )
    return tbl.cast(pa.schema(
        [tagged if i == idx else tbl.schema.field(i)
         for i in range(len(tbl.schema))],
        metadata=tbl.schema.metadata,
    ))


def from_geoarrow_table(spark: SparkSession, table) -> DataFrame:
    """pyarrow Table (geoarrow.wkb-tagged or plain WKB binary) → DataFrame.
    Extension metadata is advisory — the bytes are ISO WKB either way, so
    the round trip is exact."""
    import pandas as pd  # noqa: F401  (toPandas path needs it)

    return spark.createDataFrame(table.to_pandas())
