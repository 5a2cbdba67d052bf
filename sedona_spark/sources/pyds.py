"""Python Data Source API integration (Spark 4 `pyspark.sql.datasource`).

Exposes the engine's stdlib format readers as REAL Spark data sources —
``spark.read.format("osmpbf")`` / ``format("geotiffdir")`` — so the
planner owns partitioning: :meth:`partitions` returns one
:class:`InputPartition` per blob-frame group (OSM) or file (GeoTIFF),
and each task runs :meth:`read` against only its slice. This is the
idiomatic Spark-4 shape of the reference's DataSourceV2 registrations
(``OsmPbfFormat.scala``, ``GeoTiffFileFormat.java``): the source
declares its split structure and the engine schedules it, instead of
the library hand-rolling a DataFrame of ranges.

The mapInPandas readers (``read_osm_pbf*``, ``decode_geotiff``) stay
the workhorse API; both paths share the same per-block parse functions
so they cannot drift (pytest pins DataSource ≡ reader equality).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _FrameGroup(InputPartition):
    offsets: tuple  # ((offset, length), ...) of OSMData blobs


_OSM_SCHEMAS = {
    "nodes": ("node_id long, lon double, lat double, lon_i7 long, "
              "lat_i7 long, tags map<string,string>"),
    "ways": "way_id long, refs array<long>, tags map<string,string>",
    "relations": ("rel_id long, members array<struct<ref: long, "
                  "mtype: string, role: string>>, "
                  "tags map<string,string>"),
}


class OsmPbfDataSource(DataSource):
    """``spark.read.format("osmpbf").option("primitive", "nodes"|"ways"|
    "relations").load(path)``. Partitions = groups of independently
    compressed OSMData blobs (the format property that makes parallel
    reads possible); the driver touches only the 4-byte frame lengths."""

    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        prim = self.options.get("primitive", "nodes")
        if prim not in _OSM_SCHEMAS:
            raise ValueError(f"osmpbf: unknown primitive {prim!r}")
        return _OSM_SCHEMAS[prim]

    def reader(self, schema: StructType) -> "OsmPbfReader":
        return OsmPbfReader(self.options)


class OsmPbfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmpbf: .load(path) is required")
        self.primitive = options.get("primitive", "nodes")
        self.blobs_per_task = int(options.get("blobs_per_task", "4"))

    def partitions(self):
        from sedona_spark.sources.osmpbf import _scan_frames

        frames = [(off, ln) for t, off, ln in _scan_frames(self.path)
                  if t == "OSMData"]
        k = max(1, self.blobs_per_task)
        groups = [tuple(frames[i:i + k]) for i in range(0, len(frames), k)]
        return [_FrameGroup(tuple(g)) for g in groups] or \
            [_FrameGroup(())]

    def read(self, partition: _FrameGroup):
        from sedona_spark.sources.geoparquet import _fs_for
        from sedona_spark.sources.osmpbf import (
            _parse_blob, parse_block_nodes, parse_block_relations,
            parse_block_ways,
        )

        parse = {"nodes": parse_block_nodes, "ways": parse_block_ways,
                 "relations": parse_block_relations}[self.primitive]
        fs, inner = _fs_for(self.path)
        with fs.open_input_file(inner) as fh:
            for off, ln in partition.offsets:
                fh.seek(int(off))
                for rec in parse(_parse_blob(fh.read(int(ln)))):
                    yield rec


@dataclass
class _OneFile(InputPartition):
    path: str


class GeoTiffDirDataSource(DataSource):
    """``spark.read.format("geotiffdir").load(dir)``: one row per
    ``.tif``/``.tiff`` file — (path, width, height, bands, ulx, uly,
    sx, sy, srid, buf) with ``buf`` the band-interleaved uint8 pixels.
    One file = one partition (tile-level parallelism comes from
    RS_TileExplode downstream, matching the reference's
    GeoTiffFileFormat row shape)."""

    @classmethod
    def name(cls) -> str:
        return "geotiffdir"

    def schema(self) -> str:
        return ("path string, width int, height int, bands int, "
                "ulx double, uly double, sx double, sy double, "
                "srid int, buf binary")

    def reader(self, schema: StructType) -> "GeoTiffDirReader":
        return GeoTiffDirReader(self.options)


class GeoTiffDirReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("geotiffdir: .load(dir) is required")

    def partitions(self):
        from pyarrow import fs as pafs

        from sedona_spark.sources.geoparquet import _fs_for

        f, base = _fs_for(self.path)
        sel = pafs.FileSelector(base, recursive=True)
        files = [info.path for info in f.get_file_info(sel)
                 if info.type == pafs.FileType.File
                 and info.path.lower().endswith((".tif", ".tiff"))]
        return [_OneFile(p) for p in sorted(files)] or [_OneFile("")]

    def read(self, partition: _OneFile):
        if not partition.path:
            return
        from sedona_spark.sources.geoparquet import _fs_for
        from sedona_spark.sources.geotiff import decode_geotiff

        # resolve the SAME filesystem partitions() listed through —
        # partition paths are fs-internal (no scheme), so a hardcoded
        # LocalFileSystem would break non-local URIs (s3://, hdfs://)
        f, _ = _fs_for(self.path)
        with f.open_input_file(partition.path) as fh:
            buf = fh.read()
        arr, ulx, uly, sx, sy, srid = decode_geotiff(buf)
        h, w, nb = arr.shape
        yield (partition.path, w, h, nb, float(ulx), float(uly),
               float(sx), float(sy), int(srid), arr.tobytes())


def register_datasources(spark) -> None:
    """Idempotent registration of the Python data sources. Only the
    duplicate-registration error is tolerated — a missing Data Source
    API or a broken source class must surface here, not as a confusing
    DATA_SOURCE_NOT_FOUND at read time."""
    for src in (OsmPbfDataSource, GeoTiffDirDataSource):
        try:
            spark.dataSource.register(src)
        except Exception as e:  # noqa: BLE001 - classify, re-raise real ones
            if "DATA_SOURCE_ALREADY_EXISTS" in str(e) or \
                    "already" in str(e).lower():
                continue
            raise
