"""OSM PBF source + sink — the OpenStreetMap PBF format (public spec:
wiki.openstreetmap.org/wiki/PBF_Format; reference reader:
``spark/common/src/main/scala/.../datasources/osm/OsmPbfFormat.scala``).

The container is protobuf wire format + zlib, both parseable with the
Python STDLIB — a hand-rolled varint/zigzag codec over the few fixed tag
numbers the format uses (the .proto schemas are frozen and published), so
no protobuf library is needed. Scope: **DenseNodes** (the geotagged-point
payload — ids + 100-nanodegree lat/lon, delta-coded), which is the
image/caption engine's use case; ways/relations keep the same framing and
are a documented extension seam.

Spark-first shape (same pattern as the Shapefile/GeoPackage readers):

* **read** — the driver scans ONLY the blob framing (each blob = 4-byte
  big-endian BlobHeader length + BlobHeader{type, datasize} + datasize
  bytes), yielding a (offset, length) table of OSMData blobs — a few
  bytes per ~8k-node blob. Blob ranges are partitioned; every task opens
  the file via ``pyarrow.fs`` and inflates + parses only its own blobs.
  Blobs are independently compressed by design — THE format property
  that makes distributed reading possible.
* **write** — one PrimitiveBlock per ``nodes_per_block`` rows, delta +
  zigzag + packed-varint encoded, zlib per blob; driver-side emit (the
  frame stream is sequential), as with the other single-file sinks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.sources.geoparquet import _fs_for

# --- protobuf wire primitives (public encoding) ----------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _field(tag: int, wire: int) -> bytes:
    return _varint((tag << 3) | wire)


def _len_field(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + _varint(len(payload)) + payload


def _packed_sint64(tag: int, vals) -> bytes:
    body = b"".join(_varint(_zigzag(v)) for v in vals)
    return _len_field(tag, body)


def _varints_np(u: "np.ndarray") -> bytes:
    """Vectorized varint encoding of a uint64 array — byte-identical to
    ``b"".join(_varint(int(v)) for v in u)`` (the per-node python loop is
    the write path's hot spot at scale; guide §4.2: hand whole batches to
    numpy)."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    n = len(u)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        thr = np.uint64(1 << (7 * k))
        more = u >= thr
        if not more.any():
            break
        nb += more.astype(np.int64)
    kmax = int(nb.max())
    shifts = np.uint64(7) * np.arange(kmax, dtype=np.uint64)
    parts = (u[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    ks = np.arange(kmax, dtype=np.int64)
    mask = ks[None, :] < nb[:, None]
    cont = (ks[None, :] < (nb - 1)[:, None]).astype(np.uint64)
    mat = (parts | (cont << np.uint64(7))).astype(np.uint8)
    return mat[mask].tobytes()


def _packed_sint64_np(tag: int, vals: "np.ndarray") -> bytes:
    """numpy twin of :func:`_packed_sint64` (zigzag in int64 wraps like
    the arbitrary-precision form for |v| < 2^62 — coordinate deltas are
    ≤ 3.6e9)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    zz = ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)
    return _len_field(tag, _varints_np(zz))


def _parse_packed_sint64_np(payload: bytes) -> "np.ndarray":
    """Vectorized packed-sint64 parse → int64 array (value-identical to
    :func:`_parse_packed_sint64`)."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    pos_in = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
    vals7 = (b & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos_in.astype(np.uint64))
    u = np.bitwise_or.reduceat(vals7, starts)
    return ((u >> np.uint64(1))
            ^ (np.uint64(0) - (u & np.uint64(1)))).view(np.int64)


def _iter_fields(buf: bytes):
    """Yield (tag, wire, value) over a protobuf message; value is the
    int for varint fields and the bytes slice for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        tag, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield tag, wire, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield tag, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            yield tag, wire, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            yield tag, wire, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_packed_sint64(payload: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(payload):
        v, pos = _read_varint(payload, pos)
        out.append(_unzigzag(v))
    return out


def _packed_uint(tag: int, vals) -> bytes:
    body = b"".join(_varint(int(v)) for v in vals)
    return _len_field(tag, body)


def _parse_packed_uint(payload: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(payload):
        v, pos = _read_varint(payload, pos)
        out.append(v)
    return out


class _StringTable:
    """Per-block OSM stringtable builder: s[0] is the required empty
    string; repeated keys/roles dedupe to one index."""

    def __init__(self):
        self._idx: dict[str, int] = {"": 0}
        self._items: list[bytes] = [b""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._items)
            self._idx[s] = i
            self._items.append(s.encode())
        return i

    def encode(self) -> bytes:
        return b"".join(_len_field(1, b) for b in self._items)


def _parse_stringtable(payload: bytes) -> list[str]:
    return [bytes(v).decode("utf-8", "replace")
            for tag, _w, v in _iter_fields(payload) if tag == 1]


# --- blob framing ----------------------------------------------------------


def _blob(type_name: str, payload: bytes) -> bytes:
    """Frame one blob: BlobHeader{type=1, datasize=3} + Blob{raw_size=2,
    zlib_data=3}."""
    z = zlib.compress(payload, 6)
    blob = _field(2, 0) + _varint(len(payload)) + _len_field(3, z)
    header = _len_field(1, type_name.encode()) + _field(3, 0) + _varint(len(blob))
    return struct.pack(">i", len(header)) + header + blob


def _parse_blob(buf: bytes) -> bytes:
    """Blob message → decompressed payload."""
    raw = None
    for tag, _w, v in _iter_fields(buf):
        if tag == 1:
            raw = bytes(v)
        elif tag == 3:
            raw = zlib.decompress(bytes(v))
    if raw is None:
        raise ValueError("blob carries no raw/zlib data")
    return raw


# --- writer ----------------------------------------------------------------


def write_osm_pbf(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    tags_col: str | None = None,
    nodes_per_block: int = 8000,
    order_col: str | None = None,
) -> int:
    """Write (id, lon, lat) rows as an OSM PBF of DenseNodes blocks.
    With ``tags_col`` (a map<string,string> column) the per-node tags
    are emitted through the DenseNodes ``keys_vals`` interleaving
    (k,v index pairs into the per-block stringtable, 0-delimited per
    node). Driver-side by frame-stream necessity (same posture as the
    Shapefile sink). Returns the node count."""
    if order_col is not None:
        df = df.orderBy(order_col)
    cols = [id_col, lon, lat] + ([tags_col] if tags_col else [])
    # Arrow transfer + numpy per-block encode: the per-node python loop
    # (Row access + _varint per value) was the dominant cost of this
    # driver-side sink at scale; the emitted bytes are identical.
    pdf = df.select(*cols).toPandas()
    n_rows = len(pdf)
    all_ids = pdf[id_col].to_numpy(dtype=np.int64)
    # 100-nanodegree units (granularity 100, offsets 0); np.round is
    # round-half-even exactly like python round() on floats
    all_lats = np.round(
        pdf[lat].to_numpy(dtype=np.float64) * 1e7).astype(np.int64)
    all_lons = np.round(
        pdf[lon].to_numpy(dtype=np.float64) * 1e7).astype(np.int64)
    all_tags = pdf[tags_col].tolist() if tags_col else None
    # HeaderBlock: required_features(4) strings
    header = (_len_field(4, b"OsmSchema-V0.6")
              + _len_field(4, b"DenseNodes"))
    out = bytearray(_blob("OSMHeader", header))
    for i in range(0, n_rows, nodes_per_block):
        ids = all_ids[i:i + nodes_per_block]
        lats = all_lats[i:i + nodes_per_block]
        lons = all_lons[i:i + nodes_per_block]

        def delta(vals):
            return np.diff(vals, prepend=np.int64(0))

        st = _StringTable()
        dense = (_packed_sint64_np(1, delta(ids))
                 + _packed_sint64_np(8, delta(lats))
                 + _packed_sint64_np(9, delta(lons)))
        if tags_col:
            kv: list[int] = []
            for tags_d in all_tags[i:i + nodes_per_block]:
                for k, v in sorted((tags_d or {}).items()):
                    kv.append(st.add(str(k)))
                    kv.append(st.add(str(v)))
                kv.append(0)
            dense += _packed_uint(10, kv)  # DenseNodes.keys_vals
        group = _len_field(2, dense)  # PrimitiveGroup.dense = 2
        block = (
            _len_field(1, st.encode())    # stringtable (s[0] = "")
            + _len_field(2, group)
            + _field(17, 0) + _varint(100)     # granularity
            + _field(19, 0) + _varint(0)       # lat_offset
            + _field(20, 0) + _varint(0)       # lon_offset
        )
        out += _blob("OSMData", block)
    fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
    name = path.rsplit("/", 1)[-1]
    with fs.open_output_stream(f"{base}/{name}") as fh:
        fh.write(bytes(out))
    return n_rows


# --- reader ----------------------------------------------------------------


def _scan_frames(path: str):
    """Driver-side framing scan: [(type, payload_offset, payload_len)] —
    reads ONLY the 4-byte lengths and tiny BlobHeaders."""
    fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
    name = path.rsplit("/", 1)[-1]
    frames = []
    with fs.open_input_file(f"{base}/{name}") as fh:
        size = fh.size()
        pos = 0
        while pos + 4 <= size:
            fh.seek(pos)
            (hlen,) = struct.unpack(">i", fh.read(4))
            hdr = fh.read(hlen)
            btype, dlen = "", 0
            for tag, _w, v in _iter_fields(hdr):
                if tag == 1:
                    btype = bytes(v).decode()
                elif tag == 3:
                    dlen = v
            frames.append((btype, pos + 4 + hlen, dlen))
            pos = pos + 4 + hlen + dlen
    return frames


# PBF MemberType enum (0=NODE 1=WAY 2=RELATION) — one constant serves
# both the parse and write paths so they can never diverge
_MEMBER_TYPES = ("node", "way", "relation")


def parse_block_nodes(block: bytes) -> list:
    """DECOMPRESSED PrimitiveBlock -> [(node_id, lon, lat, lon_i7,
    lat_i7, tags)] — the canonical DenseNodes decode shared by the
    mapInPandas reader and the Python DataSource."""
    gran, lat_off, lon_off = 100, 0, 0
    strings: list[str] = [""]
    groups = []
    for tag, _w, v in _iter_fields(block):
        if tag == 1:
            strings = _parse_stringtable(bytes(v))
        elif tag == 2:
            groups.append(bytes(v))
        elif tag == 17:
            gran = v
        elif tag == 19:
            lat_off = v
        elif tag == 20:
            lon_off = v
    recs = []
    for g in groups:
        for gtag, _gw, gv in _iter_fields(g):
            if gtag != 2:  # DenseNodes only
                continue
            ids = lats = lons = None
            kv: list[int] = []
            for dt, _dw, dv in _iter_fields(bytes(gv)):
                if dt == 1:
                    ids = _parse_packed_sint64(bytes(dv))
                elif dt == 8:
                    lats = _parse_packed_sint64(bytes(dv))
                elif dt == 9:
                    lons = _parse_packed_sint64(bytes(dv))
                elif dt == 10:  # keys_vals interleaving
                    kv = _parse_packed_uint(bytes(dv))
            if not ids:
                continue
            iid = ilat = ilon = 0
            kvp = 0
            for di, dla, dlo in zip(ids, lats, lons):
                iid += di
                ilat += dla
                ilon += dlo
                nlat = lat_off + gran * ilat
                nlon = lon_off + gran * ilon
                tags_d: dict[str, str] = {}
                while kvp < len(kv) and kv[kvp] != 0:
                    tags_d[strings[kv[kvp]]] = strings[kv[kvp + 1]]
                    kvp += 2
                kvp += 1  # the per-node 0 delimiter
                recs.append((iid, nlon * 1e-9, nlat * 1e-9,
                             nlon // 100, nlat // 100, tags_d))
    return recs


def parse_block_nodes_df(block: bytes) -> pd.DataFrame:
    """Vectorized DenseNodes decode → columnar frame (row-identical to
    :func:`parse_block_nodes`; numpy cumsum replaces the per-node python
    loop on the reader's hot path — guide §4.2)."""
    gran, lat_off, lon_off = 100, 0, 0
    strings: list[str] = [""]
    groups = []
    for tag, _w, v in _iter_fields(block):
        if tag == 1:
            strings = _parse_stringtable(bytes(v))
        elif tag == 2:
            groups.append(bytes(v))
        elif tag == 17:
            gran = v
        elif tag == 19:
            lat_off = v
        elif tag == 20:
            lon_off = v
    frames = []
    for g in groups:
        for gtag, _gw, gv in _iter_fields(g):
            if gtag != 2:  # DenseNodes only
                continue
            ids = lats = lons = None
            kv: list[int] = []
            for dt, _dw, dv in _iter_fields(bytes(gv)):
                if dt == 1:
                    ids = _parse_packed_sint64_np(bytes(dv))
                elif dt == 8:
                    lats = _parse_packed_sint64_np(bytes(dv))
                elif dt == 9:
                    lons = _parse_packed_sint64_np(bytes(dv))
                elif dt == 10:  # keys_vals interleaving
                    kv = _parse_packed_uint(bytes(dv))
            if ids is None or len(ids) == 0:
                continue
            iid = np.cumsum(ids)
            nlat = lat_off + gran * np.cumsum(lats)
            nlon = lon_off + gran * np.cumsum(lons)
            n = len(iid)
            if kv:
                tags_l: list[dict] = []
                kvp = 0
                for _ in range(n):
                    tags_d: dict[str, str] = {}
                    while kvp < len(kv) and kv[kvp] != 0:
                        tags_d[strings[kv[kvp]]] = strings[kv[kvp + 1]]
                        kvp += 2
                    kvp += 1
                    tags_l.append(tags_d)
            else:
                tags_l = [{}] * n
            frames.append(pd.DataFrame({
                "node_id": iid,
                "lon": nlon * 1e-9,
                "lat": nlat * 1e-9,
                "lon_i7": nlon // 100,
                "lat_i7": nlat // 100,
                "tags": tags_l,
            }))
    if not frames:
        return pd.DataFrame({
            "node_id": np.empty(0, np.int64),
            "lon": np.empty(0, np.float64),
            "lat": np.empty(0, np.float64),
            "lon_i7": np.empty(0, np.int64),
            "lat_i7": np.empty(0, np.int64),
            "tags": [],
        })
    return pd.concat(frames, ignore_index=True)


def parse_block_ways(block: bytes) -> list:
    """DECOMPRESSED PrimitiveBlock -> [(way_id, refs, tags)]."""
    strings: list[str] = [""]
    groups = []
    for tag, _w, v in _iter_fields(block):
        if tag == 1:
            strings = _parse_stringtable(bytes(v))
        elif tag == 2:
            groups.append(bytes(v))
    recs = []
    for g in groups:
        for gtag, _gw, gv in _iter_fields(g):
            if gtag != 3:  # ways
                continue
            wid, deltas, keys, vals = None, [], [], []
            for wt, _ww, wv in _iter_fields(bytes(gv)):
                if wt == 1:
                    wid = wv
                elif wt == 2:
                    keys = _parse_packed_uint(bytes(wv))
                elif wt == 3:
                    vals = _parse_packed_uint(bytes(wv))
                elif wt == 8:
                    deltas = _parse_packed_sint64(bytes(wv))
            refs, acc = [], 0
            for d in deltas:
                acc += d
                refs.append(acc)
            tags = {strings[k]: strings[v2]
                    for k, v2 in zip(keys, vals)}
            if wid is not None:
                recs.append((wid, refs, tags))
    return recs


def parse_block_relations(block: bytes) -> list:
    """DECOMPRESSED PrimitiveBlock -> [(rel_id, members, tags)] with
    members = [{ref, mtype, role}]."""
    strings: list[str] = [""]
    groups = []
    for tag, _w, v in _iter_fields(block):
        if tag == 1:
            strings = _parse_stringtable(bytes(v))
        elif tag == 2:
            groups.append(bytes(v))
    recs = []
    for g in groups:
        for gtag, _gw, gv in _iter_fields(g):
            if gtag != 4:  # relations
                continue
            rid = None
            keys = vals = roles = types = []
            deltas = []
            for rt, _rw, rv in _iter_fields(bytes(gv)):
                if rt == 1:
                    rid = rv
                elif rt == 2:
                    keys = _parse_packed_uint(bytes(rv))
                elif rt == 3:
                    vals = _parse_packed_uint(bytes(rv))
                elif rt == 9:
                    roles = _parse_packed_uint(bytes(rv))
                elif rt == 10:
                    deltas = _parse_packed_sint64(bytes(rv))
                elif rt == 11:
                    types = _parse_packed_uint(bytes(rv))
            refs, acc = [], 0
            for d in deltas:
                acc += d
                refs.append(acc)
            members = [
                {"ref": rf,
                 "mtype": _MEMBER_TYPES[t],
                 "role": strings[ro]}
                for rf, t, ro in zip(refs, types, roles)
            ]
            tags = {strings[k]: strings[v2]
                    for k, v2 in zip(keys, vals)}
            if rid is not None:
                recs.append((rid, members, tags))
    return recs


def read_osm_pbf(
    spark: SparkSession, path: str, partitions: int = 0
) -> DataFrame:
    """Distributed OSM PBF DenseNodes read → (node_id, lon, lat,
    lat_i7, lon_i7). The integer 1e-7-degree fields are exact (the
    format's native units); the doubles are their float projection."""
    frames = [
        (off, ln) for t, off, ln in _scan_frames(path) if t == "OSMData"
    ]
    nparts = partitions or min(max(1, len(frames)), 64)
    rdf = spark.createDataFrame(
        frames or [(0, 0)], "off long, ln long"
    ).repartition(nparts)

    out_type = StructType([
        StructField("node_id", LongType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("lon_i7", LongType()),
        StructField("lat_i7", LongType()),
        StructField("tags", MapType(StringType(), StringType())),
    ])

    def gen(batches):
        fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
        name = path.rsplit("/", 1)[-1]
        for pdf in batches:
            parts = []
            with fs.open_input_file(f"{base}/{name}") as fh:
                for off, ln in zip(pdf["off"], pdf["ln"]):
                    if ln == 0:
                        continue
                    fh.seek(int(off))
                    parts.append(parse_block_nodes_df(
                        _parse_blob(fh.read(int(ln)))))
            if parts:
                yield pd.concat(parts, ignore_index=True)
            else:
                yield parse_block_nodes_df(b"")

    return rdf.mapInPandas(gen, schema=out_type)


# --- ways (r5 extension: same framing; Way = id(1) + packed delta
# sint64 refs(8); tags = documented seam) --------------------------------


def write_osm_pbf_ways(
    df: DataFrame,
    path: str,
    id_col: str = "way_id",
    refs_col: str = "refs",
    tags_col: str | None = None,
    ways_per_block: int = 4000,
    order_col: str | None = None,
) -> int:
    """Append-style single-file emit of Way blocks (driver-side). With
    ``tags_col`` (map<string,string>) each way carries keys(2)/vals(3)
    stringtable indexes — the full Way message of the published schema
    (r6 closes the r5 tags seam)."""
    if order_col is not None:
        df = df.orderBy(order_col)
    cols = [id_col, refs_col] + ([tags_col] if tags_col else [])
    rows = df.select(*cols).collect()
    header = (_len_field(4, b"OsmSchema-V0.6"))
    out = bytearray(_blob("OSMHeader", header))
    for i in range(0, len(rows), ways_per_block):
        chunk = rows[i:i + ways_per_block]
        st = _StringTable()
        ways = b""
        for r in chunk:
            refs = [int(v) for v in r[refs_col]]
            deltas = [refs[0]] + [b - a for a, b in zip(refs, refs[1:])] \
                if refs else []
            way = _field(1, 0) + _varint(int(r[id_col]))
            if tags_col and r[tags_col]:
                items = sorted(r[tags_col].items())
                way += _packed_uint(2, [st.add(k) for k, _ in items])
                way += _packed_uint(3, [st.add(v) for _, v in items])
            way += _packed_sint64(8, deltas)
            ways += _len_field(3, way)  # PrimitiveGroup.ways = 3
        block = (_len_field(1, st.encode()) + _len_field(2, ways))
        out += _blob("OSMData", block)
    fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
    name = path.rsplit("/", 1)[-1]
    with fs.open_output_stream(f"{base}/{name}") as fh:
        fh.write(bytes(out))
    return len(rows)


def read_osm_pbf_ways(
    spark: SparkSession, path: str, partitions: int = 0
) -> DataFrame:
    """Distributed Way read → (way_id, refs array<long>,
    tags map<string,string>) — keys/vals resolved through the per-block
    stringtable (r6)."""
    from pyspark.sql.types import ArrayType, MapType, StringType

    frames = [
        (off, ln) for t, off, ln in _scan_frames(path) if t == "OSMData"
    ]
    nparts = partitions or min(max(1, len(frames)), 64)
    rdf = spark.createDataFrame(
        frames or [(0, 0)], "off long, ln long"
    ).repartition(nparts)
    out_type = StructType([
        StructField("way_id", LongType()),
        StructField("refs", ArrayType(LongType())),
        StructField("tags", MapType(StringType(), StringType())),
    ])

    def gen(batches):
        fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
        name = path.rsplit("/", 1)[-1]
        for pdf in batches:
            recs = []
            with fs.open_input_file(f"{base}/{name}") as fh:
                for off, ln in zip(pdf["off"], pdf["ln"]):
                    if ln == 0:
                        continue
                    fh.seek(int(off))
                    recs.extend(parse_block_ways(
                        _parse_blob(fh.read(int(ln)))))
            yield pd.DataFrame(
                recs, columns=[f.name for f in out_type.fields]
            )

    return rdf.mapInPandas(gen, schema=out_type)


# --- relations (r6: same framing; Relation = id(1) + keys(2)/vals(3) +
# roles_sid(9) + packed delta sint64 memids(10) + packed enum types(11),
# types: 0=NODE 1=WAY 2=RELATION) -----------------------------------------


def write_osm_pbf_relations(
    df: DataFrame,
    path: str,
    id_col: str = "rel_id",
    members_col: str = "members",
    tags_col: str | None = None,
    rels_per_block: int = 4000,
    order_col: str | None = None,
) -> int:
    """Single-file emit of Relation blocks (driver-side, same posture as
    the other sequential-frame sinks). ``members_col`` is
    array<struct<ref: long, mtype: string, role: string>> with mtype in
    {'node','way','relation'}."""
    if order_col is not None:
        df = df.orderBy(order_col)
    cols = [id_col, members_col] + ([tags_col] if tags_col else [])
    rows = df.select(*cols).collect()
    out = bytearray(_blob("OSMHeader", _len_field(4, b"OsmSchema-V0.6")))
    for i in range(0, len(rows), rels_per_block):
        chunk = rows[i:i + rels_per_block]
        st = _StringTable()
        rels = b""
        for r in chunk:
            members = list(r[members_col] or [])
            refs = [int(m["ref"]) for m in members]
            deltas = [refs[0]] + [b - a for a, b in zip(refs, refs[1:])] \
                if refs else []
            rel = _field(1, 0) + _varint(int(r[id_col]))
            if tags_col and r[tags_col]:
                items = sorted(r[tags_col].items())
                rel += _packed_uint(2, [st.add(k) for k, _ in items])
                rel += _packed_uint(3, [st.add(v) for _, v in items])
            rel += _packed_uint(9, [st.add(m["role"] or "")
                                    for m in members])
            rel += _packed_sint64(10, deltas)
            rel += _packed_uint(
                11, [_MEMBER_TYPES.index(m["mtype"]) for m in members])
            rels += _len_field(4, rel)  # PrimitiveGroup.relations = 4
        block = (_len_field(1, st.encode()) + _len_field(2, rels))
        out += _blob("OSMData", block)
    fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
    name = path.rsplit("/", 1)[-1]
    with fs.open_output_stream(f"{base}/{name}") as fh:
        fh.write(bytes(out))
    return len(rows)


def read_osm_pbf_relations(
    spark: SparkSession, path: str, partitions: int = 0
) -> DataFrame:
    """Distributed Relation read → (rel_id, members array<struct<ref,
    mtype, role>>, tags map<string,string>)."""
    from pyspark.sql.types import ArrayType, MapType, StringType

    frames = [
        (off, ln) for t, off, ln in _scan_frames(path) if t == "OSMData"
    ]
    nparts = partitions or min(max(1, len(frames)), 64)
    rdf = spark.createDataFrame(
        frames or [(0, 0)], "off long, ln long"
    ).repartition(nparts)
    member_t = StructType([
        StructField("ref", LongType()),
        StructField("mtype", StringType()),
        StructField("role", StringType()),
    ])
    out_type = StructType([
        StructField("rel_id", LongType()),
        StructField("members", ArrayType(member_t)),
        StructField("tags", MapType(StringType(), StringType())),
    ])

    def gen(batches):
        fs, base = _fs_for(path.rsplit("/", 1)[0] or ".")
        name = path.rsplit("/", 1)[-1]
        for pdf in batches:
            recs = []
            with fs.open_input_file(f"{base}/{name}") as fh:
                for off, ln in zip(pdf["off"], pdf["ln"]):
                    if ln == 0:
                        continue
                    fh.seek(int(off))
                    recs.extend(parse_block_relations(
                        _parse_blob(fh.read(int(ln)))))
            yield pd.DataFrame(
                recs, columns=[f.name for f in out_type.fields]
            )

    return rdf.mapInPandas(gen, schema=out_type)
