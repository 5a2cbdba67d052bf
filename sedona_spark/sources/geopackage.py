"""GeoPackage (.gpkg) source + sink — OGC 12-128r18, a public spec.

Reference: the GeoPackage DataSource
(``spark/common/src/main/scala/.../datasources/geopackage/``). A
GeoPackage is a SQLite 3 database with conventioned tables
(``gpkg_contents``, ``gpkg_geometry_columns``) and a per-feature-table
geometry BLOB: the ``GP`` binary header (magic, version, flags byte with
an envelope-size code, srs_id, optional envelope doubles) followed by
ISO WKB. Python's stdlib ``sqlite3`` reads the container, and the
engine's own WKB module parses the payload — no external library.

Spark-first shape:

* **read** — the driver opens the file ONCE for metadata only (feature
  count + geometry column name from the convention tables); rowid ranges
  are then parallelized and every TASK opens the SQLite file read-only
  and scans ONLY its ``rowid`` slice (the same range-split strategy the
  reference's reader and the Shapefile reader here use). SQLite requires
  a LOCAL file path: on a cluster, ship the .gpkg via ``--files`` /
  ``SparkFiles`` (the documented deployment contract — same posture as
  the reference, which reads GeoPackage through Hadoop-local copies).
* **write** — driver-side single-file emit: SQLite is a single-writer
  container (the format is not parallel-writable), mirroring the
  Shapefile sink posture. Attributes ride alongside as ordinary columns.
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.geometry import wkb as _wkb

_GP_MAGIC = 0x4750  # "GP"


def _gpkg_blob(ring_list, srs_id: int = 4326) -> bytes:
    """Canonical ring list → GeoPackage geometry BLOB (header + WKB;
    envelope code 1 = [minx, maxx, miny, maxy])."""
    xs = [v for ring in ring_list for v in ring[0::2]]
    ys = [v for ring in ring_list for v in ring[1::2]]
    # flags: envelope code 1 (<<1) | little-endian byte order (bit 0)
    flags = (1 << 1) | 1
    head = struct.pack("<HBBi", _GP_MAGIC, 0, flags, srs_id)
    env = struct.pack("<4d", min(xs), max(xs), min(ys), max(ys))
    return head + env + _wkb.wkb_from_rings(ring_list)


def _parse_gpkg_blob(buf: bytes):
    """GeoPackage geometry BLOB → (kind, canonical ring list)."""
    magic, _ver, flags = struct.unpack_from("<HBB", buf, 0)
    if magic != _GP_MAGIC:
        raise ValueError("not a GeoPackage geometry blob")
    env_code = (flags >> 1) & 0x7
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_code]
    return _wkb.parse_wkb_rings(buf[8 + env_len:])


def write_geopackage(
    df: DataFrame,
    path: str,
    table: str = "features",
    geom_col: str = "geom",
    srs_id: int = 4326,
    order_col: str | None = None,
) -> int:
    """Write ``df`` (ring-list geometry + scalar attribute columns) as a
    spec-compliant GeoPackage feature table. Driver-side by container
    necessity (single-writer SQLite). Returns the feature count."""
    if order_col is not None:
        df = df.orderBy(order_col)
    attr_cols = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.name != geom_col
    ]
    sql_type = {"bigint": "INTEGER", "int": "INTEGER", "double": "REAL",
                "string": "TEXT"}
    rows = df.select(geom_col, *[c for c, _ in attr_cols]).collect()
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        cur.execute("PRAGMA user_version = 10300")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER, "
            "definition TEXT NOT NULL, description TEXT)"
        )
        cur.execute(
            "INSERT OR REPLACE INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84', ?, 'EPSG', ?, 'GEOGCS[\"WGS 84\"]', NULL)",
            (srs_id, srs_id),
        )
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT, description TEXT, last_change TEXT, "
            "min_x REAL, min_y REAL, max_x REAL, max_y REAL, "
            "srs_id INTEGER)"
        )
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL)"
        )
        attrs_ddl = "".join(
            f", {c} {sql_type.get(t, 'TEXT')}" for c, t in attr_cols
        )
        cur.execute(f"DROP TABLE IF EXISTS {table}")
        cur.execute(
            f"CREATE TABLE {table} (fid INTEGER PRIMARY KEY AUTOINCREMENT, "
            f"{geom_col} BLOB{attrs_ddl})"
        )
        cur.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?, ?, 'GEOMETRY', ?, 0, 0)",
            (table, geom_col, srs_id),
        )
        n = 0
        for r in rows:
            blob = _gpkg_blob([list(ring) for ring in r[geom_col]], srs_id)
            cur.execute(
                f"INSERT INTO {table} ({geom_col}"
                + "".join(f", {c}" for c, _ in attr_cols) + ") VALUES (?"
                + ", ?" * len(attr_cols) + ")",
                (blob, *[r[c] for c, _ in attr_cols]),
            )
            n += 1
        cur.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, srs_id) "
            "VALUES (?, 'features', ?, ?)",
            (table, table, srs_id),
        )
        con.commit()
        return n
    finally:
        con.close()


def read_geopackage(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    partitions: int = 0,
) -> DataFrame:
    """Distributed GeoPackage read: driver touches the file only for the
    convention-table metadata; rowid ranges are range-partitioned and
    each task scans its own slice through its own read-only SQLite
    connection."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.cursor()
        if table is None:
            table = cur.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'features' LIMIT 1"
            ).fetchone()[0]
        geom_col = cur.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (table,)
        ).fetchone()[0]
        lo, hi = cur.execute(
            f"SELECT MIN(rowid), MAX(rowid) FROM {table}"
        ).fetchone()
        cols = [
            (r[1], (r[2] or "TEXT").upper())
            for r in cur.execute(f"PRAGMA table_info({table})")
            if r[1] != geom_col
        ]
    finally:
        con.close()
    if lo is None:
        lo, hi = 1, 0
    n = hi - lo + 1
    nparts = partitions or min(max(1, n // 1000), 64)
    step = max(1, (n + nparts - 1) // max(nparts, 1))
    ranges = [
        (lo + i * step, min(lo + (i + 1) * step - 1, hi))
        for i in range((n + step - 1) // step)
    ] or [(1, 0)]
    rdf = spark.createDataFrame(ranges, "r0 long, r1 long").repartition(
        len(ranges)
    )

    def _spark_type(decl: str):
        if "INT" in decl:
            return LongType()
        if decl in ("REAL", "DOUBLE", "FLOAT") or "REAL" in decl:
            return DoubleType()
        return StringType()

    cols = [(c, t) for c, t in cols if c != "fid"]
    out_type = StructType(
        [StructField("fid", LongType())]
        + [StructField(c, _spark_type(t)) for c, t in cols]
        + [
            StructField("kind", StringType()),
            StructField("geom", ArrayType(ArrayType(DoubleType()))),
        ]
    )
    col_names = [c for c, _ in cols]

    def gen(batches):
        for pdf in batches:
            recs = []
            for r0, r1 in zip(pdf["r0"], pdf["r1"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    sel = ", ".join(["rowid", geom_col, *col_names])
                    for row in c.execute(
                        f"SELECT {sel} FROM {table} "
                        f"WHERE rowid BETWEEN ? AND ?", (int(r0), int(r1))
                    ):
                        kind, rings = _parse_gpkg_blob(bytes(row[1]))
                        recs.append(
                            (row[0], *row[2:], kind,
                             [q.ravel().tolist() for q in rings])
                        )
                finally:
                    c.close()
            yield pd.DataFrame(
                recs, columns=[f.name for f in out_type.fields]
            )

    return rdf.mapInPandas(gen, schema=out_type)
