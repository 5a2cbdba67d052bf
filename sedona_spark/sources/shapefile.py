"""Shapefile (.shp/.shx) source + sink — ESRI's public 1998 spec.

Reference: the Shapefile DSv2 reader
(``spark/spark-4.1/.../shapefile/ShapefileDataSource.scala``). Spark-first
shape:

* **read** — the .shx index (8 bytes/record, tiny) is read once to get
  every record's byte offset; the offsets are range-partitioned and each
  TASK opens the .shp through ``pyarrow.fs`` and parses only its slice —
  the same index-driven split strategy the reference's reader uses, no
  driver data path. Geometry lands in the canonical ring-list model
  (ESRI ring winding — outer CW / inner CCW, the REVERSE of this
  engine's canonical form — is re-derived on parse, so downstream
  kernels see shells-CCW/holes-CW like every other source).
* **write** — driver-side single-file emit: the format caps at 2 GiB
  (32-bit word offsets) and interleaves a sequential record stream, so a
  distributed sink is structurally impossible; the writer exists for
  interop export of collected/broadcast-sized layers (same posture as
  the reference, whose writer is also non-splittable).

Supported shape types: Point (1), PolyLine (3), Polygon (5) — the types
the reference's own test fixtures exercise. No .dbf: attributes ride the
engine's columns; a sidecar parquet carries them losslessly.
"""

from __future__ import annotations

import struct

import numpy as np
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
from sedona_spark.sources.geoparquet import _fs_for

_SHAPE_NAMES = {0: None, 1: "point", 3: "linestring", 5: "polygon"}


def _main_header(shape_type: int, bbox, file_words: int) -> bytes:
    h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", file_words)
    h += struct.pack("<ii", 1000, shape_type)
    h += struct.pack("<4d", *bbox)
    h += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
    return h


def write_shapefile(
    df: DataFrame,
    path_base: str,
    geom_col: str = "geom",
    kind: str = "polygon",
    order_col: str | None = None,
) -> int:
    """Write ``df``'s ring-list geometries as ``path_base``.shp/.shx.
    Driver-side by format necessity (see module docstring). Record
    numbering follows ``order_col`` ascending when given; without it the
    incoming DataFrame order is used, which for a multi-partition input is
    NOT deterministic across runs — pass ``order_col`` whenever stable
    record numbers matter (ADVICE r4). Returns the record count."""
    shape_type = {"point": 1, "linestring": 3, "polygon": 5}[kind]
    if order_col is not None:
        df = df.orderBy(order_col)
    rows = df.select(geom_col).collect()
    geoms = []
    for r in rows:
        rings = [
            np.asarray(q, dtype=np.float64).reshape(-1, 2) for q in r[0]
        ]
        geoms.append(rings)
    recs, index = [], []
    offset_words = 50  # header = 100 bytes
    gxmin = gymin = float("inf")
    gxmax = gymax = float("-inf")
    for i, rings in enumerate(geoms):
        if kind == "point":
            p = rings[0][0]
            content = struct.pack("<i2d", 1, float(p[0]), float(p[1]))
            gxmin, gymin = min(gxmin, p[0]), min(gymin, p[1])
            gxmax, gymax = max(gxmax, p[0]), max(gymax, p[1])
        else:
            # ESRI winding: outer CW, holes CCW — flip from canonical
            parts = []
            if kind == "polygon":
                for s, hs in _wkb.group_rings(rings):
                    parts.append(np.vstack([s[::-1], s[::-1][:1]]))
                    parts.extend(np.vstack([h[::-1], h[::-1][:1]]) for h in hs)
            else:
                parts = rings
            allpts = np.vstack(parts)
            bbox = (allpts[:, 0].min(), allpts[:, 1].min(),
                    allpts[:, 0].max(), allpts[:, 1].max())
            gxmin, gymin = min(gxmin, bbox[0]), min(gymin, bbox[1])
            gxmax, gymax = max(gxmax, bbox[2]), max(gymax, bbox[3])
            starts, acc = [], 0
            for p in parts:
                starts.append(acc)
                acc += len(p)
            content = struct.pack("<i4d", shape_type, *bbox)
            content += struct.pack("<ii", len(parts), acc)
            content += struct.pack(f"<{len(parts)}i", *starts)
            content += np.vstack(parts).astype("<f8").tobytes()
        words = len(content) // 2
        recs.append(struct.pack(">ii", i + 1, words) + content)
        index.append(struct.pack(">ii", offset_words, words))
        offset_words += 4 + words

    bbox = (gxmin, gymin, gxmax, gymax) if geoms else (0, 0, 0, 0)
    fs, dir_base = _fs_for(path_base.rsplit("/", 1)[0] or ".")
    name = path_base.rsplit("/", 1)[-1]
    with fs.open_output_stream(f"{dir_base}/{name}.shp") as fh:
        fh.write(_main_header(shape_type, bbox, offset_words))
        for r in recs:
            fh.write(r)
    with fs.open_output_stream(f"{dir_base}/{name}.shx") as fh:
        fh.write(_main_header(shape_type, bbox, 50 + 4 * len(recs)))
        for ix in index:
            fh.write(ix)
    return len(recs)


def _parse_record(buf: bytes):
    """One .shp record content → (kind, canonical ring list)."""
    (stype,) = struct.unpack_from("<i", buf, 0)
    kind = _SHAPE_NAMES.get(stype)
    if kind is None:
        return None, None
    if stype == 1:
        x, y = struct.unpack_from("<2d", buf, 4)
        return "point", [np.array([[x, y]])]
    nparts, npts = struct.unpack_from("<ii", buf, 36)
    starts = list(struct.unpack_from(f"<{nparts}i", buf, 44)) + [npts]
    pts = np.frombuffer(
        buf, dtype="<f8", count=2 * npts, offset=44 + 4 * nparts
    ).reshape(-1, 2)
    parts = [pts[starts[i]:starts[i + 1]].copy() for i in range(nparts)]
    if stype == 3:
        return "linestring", parts
    rings = []
    for p in parts:
        r = _wkb._dedup_closed(p)
        # ESRI: outer CW / hole CCW → canonical shells-CCW/holes-CW by
        # flipping the sign convention (CW input ⇒ shell ⇒ reverse)
        rings.append(r[::-1].copy())
    return "polygon", rings


def read_shapefile(
    spark: SparkSession, path_base: str, partitions: int = 0
) -> DataFrame:
    """Distributed .shp read: the tiny .shx is read driver-side for the
    record offset table; record ranges are parallelized and every task
    parses its own byte slice of the .shp (opened via ``pyarrow.fs`` —
    local, file://, hdfs://, s3://)."""
    fs, base = _fs_for(path_base.rsplit("/", 1)[0] or ".")
    name = path_base.rsplit("/", 1)[-1]
    with fs.open_input_stream(f"{base}/{name}.shx") as fh:
        shx = fh.read()
    n = (len(shx) - 100) // 8
    offs = [
        struct.unpack_from(">ii", shx, 100 + 8 * i) for i in range(n)
    ]  # (offset_words, content_words)
    rows = [
        (i, o * 2, (o + 4 + w) * 2 - o * 2) for i, (o, w) in enumerate(offs)
    ]
    nparts = partitions or min(max(1, n // 1000), 64)
    rdf = spark.createDataFrame(
        rows, "rec_id long, byte_off long, byte_len long"
    ).repartition(nparts)

    out_type = StructType([
        StructField("rec_id", LongType()),
        StructField("kind", StringType()),
        StructField("geom", ArrayType(ArrayType(DoubleType()))),
    ])
    shp_path = f"{base}/{name}.shp"
    fs_src = path_base  # re-resolved task-side

    def gen(batches):
        tfs, tbase = _fs_for(fs_src.rsplit("/", 1)[0] or ".")
        tname = fs_src.rsplit("/", 1)[-1]
        with tfs.open_input_file(f"{tbase}/{tname}.shp") as fh:
            for b in batches:
                recs = []
                for rid, off, ln in zip(
                    b["rec_id"], b["byte_off"], b["byte_len"]
                ):
                    fh.seek(int(off) + 8)  # skip record header
                    content = fh.read(int(ln) - 8)
                    kind, rings = _parse_record(content)
                    recs.append((
                        int(rid), kind,
                        None if rings is None else [r.ravel() for r in rings],
                    ))
                yield pd.DataFrame(recs, columns=["rec_id", "kind", "geom"])

    return rdf.mapInPandas(gen, out_type)
