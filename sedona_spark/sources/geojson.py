"""GeoJSON source/sink (RFC 7946) — newline-delimited features.

Reference: the GeoJSON FileFormat
(``spark/spark-4.1/.../geojson/GeoJSONFileFormat.scala:41``). This engine
implements the SCALABLE wire form: one Feature object per line (ndjson /
"GeoJSONSeq"), which Spark's text source splits across executors — a
FeatureCollection file is a single JSON value and cannot be split, so at
100 TB the line-delimited layout is the only one that parallelizes. The
reader accepts both (a FeatureCollection is exploded driver-free via
``F.from_json`` + ``explode`` when the file fits a single row; see
``read_geojson_collection``).

Geometry lands in the engine's canonical ring-list model
(``geometry/wkb.parse_geojson_geometry``); properties stay a JSON string
column for the caller to ``F.from_json`` with their schema — the same
contract as the reference's inferred-schema reader, minus driver-side
schema inference (schema inference is a full extra pass at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.geometry import wkb

_FEATURE_TYPE = StructType([
    StructField("kind", StringType()),
    StructField("geom", ArrayType(ArrayType(DoubleType()))),
    StructField("properties", StringType()),
])


@F.pandas_udf(_FEATURE_TYPE)
def _parse_feature_udf(line: pd.Series) -> pd.DataFrame:
    import json

    kinds, geoms, props = [], [], []
    for s in line:
        kind, rings, pr = None, None, None
        if s:
            try:
                obj = json.loads(s)
            except ValueError:
                obj = None
            if isinstance(obj, dict):
                geo = obj.get("geometry") if obj.get("type") == "Feature" else obj
                kind, parsed = wkb.parse_geojson_geometry(geo)
                if parsed is not None:
                    rings = [r.ravel() for r in parsed]
                pr = json.dumps(obj.get("properties", {})) if obj.get(
                    "type") == "Feature" else "{}"
        kinds.append(kind)
        geoms.append(rings)
        props.append(pr)
    return pd.DataFrame({"kind": kinds, "geom": geoms, "properties": props})


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Read newline-delimited GeoJSON Features (or bare geometries, one
    per line) → (kind, geom ring-list, properties JSON string). Malformed
    lines yield null kind/geom — filter or fail as policy dictates."""
    lines = spark.read.text(path)
    f = _parse_feature_udf(F.col("value"))
    return lines.select(
        f.getField("kind").alias("kind"),
        f.getField("geom").alias("geom"),
        f.getField("properties").alias("properties"),
    )


@F.pandas_udf(StringType())
def _feature_line_udf(geom: pd.Series, props: pd.Series) -> pd.Series:
    import json

    out = []
    for g, p in zip(geom, props):
        if g is None:
            out.append(None)
            continue
        gj = wkb.rings_to_geojson([
            np.asarray(q, dtype=np.float64).reshape(-1, 2) for q in g
        ])
        try:
            pobj = json.loads(p) if p else {}
        except ValueError:
            pobj = {}
        out.append(json.dumps({
            "type": "Feature",
            "geometry": json.loads(gj),
            "properties": pobj,
        }))
    return pd.Series(out)


def write_geojson(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    properties_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ring-list geometries (+ an optional JSON-string properties
    column) as newline-delimited GeoJSON Features via the plain text
    sink — per-task files, no driver I/O."""
    props = (
        F.col(properties_col) if properties_col else F.lit("{}")
    )
    (
        df.select(_feature_line_udf(F.col(geom_col), props).alias("value"))
        .write.mode(mode)
        .text(path)
    )


def read_geojson_collection(spark: SparkSession, path: str) -> DataFrame:
    """Read FeatureCollection file(s): one whole-file row per collection
    (unsplittable — the format's own limitation; use the line-delimited
    layout for anything big), features exploded task-side in one
    mapInPandas pass over the same per-feature parser."""
    import json

    raw = spark.read.text(path, wholetext=True)

    def gen(batches):
        for b in batches:
            lines = []
            for s in b["value"]:
                try:
                    obj = json.loads(s)
                except ValueError:
                    continue
                for ft in obj.get("features", []):
                    lines.append(json.dumps(ft))
            if lines:
                yield pd.DataFrame({"value": lines})

    feats = raw.mapInPandas(gen, "value string")
    f = _parse_feature_udf(F.col("value"))
    return feats.select(
        f.getField("kind").alias("kind"),
        f.getField("geom").alias("geom"),
        f.getField("properties").alias("properties"),
    )
