"""STAC catalog source — SpatioTemporal Asset Catalog 1.0 (public spec:
stacspec.org; reference reader: ``spark/common/src/main/scala/.../io/stac/
StacDataSource.scala``).

A STAC catalog is plain JSON: a root catalog/collection document whose
``links`` point at child collections and at items (GeoJSON Features with
``bbox``, ``geometry``, ``properties.datetime`` and an ``assets`` map).
The reference streams catalogs over HTTP; the sandbox has no network, so
this reader takes a catalog rooted on any ``pyarrow.fs`` filesystem
(local/file://;, hdfs://, s3:// — where real deployments put mirrored
catalogs anyway).

Spark-first shape:

* the driver walks ONLY the link graph (tiny JSON documents) to collect
  item hrefs — pure metadata, like the .shx/rowid/blob-frame scans of
  the sibling sources;
* the item files themselves are read by ``spark.read.json`` over the
  href list — Spark's own distributed JSON scan (schema inference capped
  by an explicit projection), NOT a driver loop;
* geometry lands in the engine's canonical ring-list model via the same
  GeoJSON coordinate conversion the GeoJSON source uses.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sedona_spark.sources.geoparquet import _fs_for


def _read_json(fs, path: str) -> dict:
    with fs.open_input_stream(path) as fh:
        return json.loads(fh.read().decode())


def _walk_items(root: str) -> list[str]:
    """Driver-side link walk: catalog → children/collections → item
    hrefs (relative links resolved against each document's directory)."""
    fs, base = _fs_for(os.path.dirname(root) or ".")
    name = os.path.basename(root)
    items: list[str] = []
    seen: set[str] = set()
    stack = [f"{base}/{name}"]
    while stack:
        doc_path = stack.pop()
        if doc_path in seen:
            continue
        seen.add(doc_path)
        doc = _read_json(fs, doc_path)
        here = os.path.dirname(doc_path)
        for link in doc.get("links", []):
            rel = link.get("rel")
            href = link.get("href", "")
            if not href or href.startswith(("http://", "https://")):
                continue  # network hrefs: out of sandbox scope
            target = href if href.startswith("/") else os.path.normpath(
                os.path.join(here, href)
            )
            if rel in ("child", "collection"):
                stack.append(target)
            elif rel == "item":
                items.append(target)
    return items


def read_stac(
    spark: SparkSession, catalog_path: str, flatten_assets: bool = True
) -> DataFrame:
    """STAC catalog → items DataFrame: (item_id, collection, datetime,
    bbox array, geom ring list, assets map<name, href>). The heavy part
    (item JSON parsing) is Spark's distributed JSON reader over the
    driver-collected href list."""
    hrefs = _walk_items(catalog_path)
    if not hrefs:
        raise ValueError(f"no items reachable from {catalog_path}")
    raw = spark.read.option("multiLine", "true").json(hrefs)
    geom = F.col("geometry")
    # Polygon coordinates: array<array<array<double>>> → canonical packed
    # ring list (same conversion as the GeoJSON source)
    rings = F.transform(
        geom["coordinates"],
        # GeoJSON rings repeat the first vertex at the end; the canonical
        # packed-ring model does not — drop the closing pair
        lambda ring: F.slice(
            F.flatten(ring), 1, F.size(F.flatten(ring)) - 2
        ),
    )
    extra = []
    if flatten_assets and "assets" in raw.columns:
        # spark.read.json infers the assets OBJECT as a struct whose
        # fields are the union of asset names across items — rebuild the
        # per-item map<name, href> from the inferred field list
        names = [f.name for f in raw.schema["assets"].dataType.fields]
        extra.append(
            F.map_filter(
                F.map_from_arrays(
                    F.array(*[F.lit(n) for n in names]),
                    F.array(*[F.col("assets")[n]["href"] for n in names]),
                ),
                lambda _k, v: v.isNotNull(),
            ).alias("assets")
        )
    return raw.select(
        F.col("id").alias("item_id"),
        F.col("collection").alias("collection"),
        F.col("properties")["datetime"].alias("datetime"),
        F.col("bbox").alias("bbox"),
        F.when(geom["type"] == "Polygon", rings).alias("geom"),
        *extra,
    )
