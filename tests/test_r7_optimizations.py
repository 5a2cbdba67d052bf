"""Round-7 optimization equivalence pins.

Every r7 change is a pure performance restructure — these tests pin the
output identity the optimizations promised:

* numpy varint/zigzag codec == scalar protobuf codec, byte for byte;
* column-pruned fixture synthesis == the full table's column subset
  (bytes and phash identical, so pruning can never drift the fixture);
* optimized minhash fast path (checkpointed arrays, exact size-bound
  prune, union-from-sizes, pinned-parallelism joins) == the direct
  formulation (signatures -> banding -> array_intersect/array_union).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_varint_codec_numpy_twin_byte_identical():
    from sedona_spark.sources.osmpbf import (
        _packed_sint64, _packed_sint64_np,
        _parse_packed_sint64, _parse_packed_sint64_np, _varints_np,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-4_000_000_000, 4_000_000_000, 2000),
        np.array([0, 1, -1, 63, 64, 127, 128, -128, 2**31, -(2**31),
                  2**45, -(2**45), 2**62 - 1, -(2**62) + 1]),
    ]).astype(np.int64)
    assert _packed_sint64(9, [int(v) for v in vals]) == \
        _packed_sint64_np(9, vals)
    payload = _varints_np(
        ((vals << np.int64(1)) ^ (vals >> np.int64(63))).view(np.uint64))
    assert _parse_packed_sint64(payload) == [int(v) for v in vals]
    assert list(_parse_packed_sint64_np(payload)) == [int(v) for v in vals]


def test_fixture_column_pruning_identity():
    from sedona_spark.sources.images import _rows_for_ids

    ids = np.arange(0, 120)  # covers all 3 shapes and both formats
    full = _rows_for_ids(ids)
    for cols in (("image_id", "bytes"), ("image_id", "w", "h"),
                 ("bytes",), ("image_id", "w", "h", "caption"),
                 ("image_id", "bytes", "phash", "lon", "lat")):
        sub = _rows_for_ids(ids, columns=cols)
        assert list(sub.columns) == [c for c in full.columns if c in cols]
        for c in sub.columns:
            if c == "bytes":
                assert all(bytes(a) == bytes(b)
                           for a, b in zip(sub[c], full[c]))
            else:
                assert sub[c].tolist() == full[c].tolist()


def test_minhash_fast_path_matches_direct_formulation(spark):
    from sedona_spark.pipeline.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_dedup_pairs,
        minhash_signatures,
    )

    texts = []
    for i in range(60):
        base = f"the quick brown fox {i % 7} jumps over the lazy dog "
        texts.append((i, base * 3 + ("extra drift " * (i % 4))))
    docs = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))

    # direct formulation (the pre-r7 shape)
    sigs = minhash_signatures(docs, 16, 5, "text", "doc_id", False)
    cands = lsh_candidate_pairs(sigs, 4, "doc_id", num_hashes=16)
    sh = F.transform(char_shingles(F.col("text"), 5), lambda s: F.xxhash64(s))
    sets_ = docs.select(F.col("doc_id"), sh.alias("shingles"))
    j = (
        cands
        .join(sets_.withColumnsRenamed({"doc_id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sets_.withColumnsRenamed({"doc_id": "id_b", "shingles": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    ref = (
        j.withColumn("inter_size", inter.cast("long"))
        .withColumn("union_size", union.cast("long"))
        .filter(F.col("inter_size") >= 0.5 * F.col("union_size"))
        .select("id_a", "id_b", "inter_size", "union_size")
    )
    got = minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16, bands=4)
    a = sorted(map(tuple, ref.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and len(a) > 0


def test_pbf_columnar_decode_matches_row_decode(spark, tmp_path):
    from sedona_spark.sources.osmpbf import (
        parse_block_nodes, parse_block_nodes_df, write_osm_pbf,
        _scan_frames, _parse_blob,
    )

    pdf = pd.DataFrame({
        "id": np.arange(1, 501, dtype=np.int64),
        "lon": np.linspace(-179.5, 179.5, 500),
        "lat": np.linspace(-89.5, 89.5, 500),
    })
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "nodes.osm.pbf")
    write_osm_pbf(df, path, nodes_per_block=128, order_col="id")
    frames = [(o, l) for t, o, l in _scan_frames(path) if t == "OSMData"]
    with open(path, "rb") as fh:
        for off, ln in frames:
            fh.seek(off)
            block = _parse_blob(fh.read(ln))
            rows = parse_block_nodes(block)
            cols = parse_block_nodes_df(block)
            assert len(rows) == len(cols)
            for i, r in enumerate(rows):
                assert r[0] == int(cols["node_id"][i])
                assert r[3] == int(cols["lon_i7"][i])
                assert r[4] == int(cols["lat_i7"][i])
                assert r[1] == pytest.approx(float(cols["lon"][i]), abs=0)
                assert r[2] == pytest.approx(float(cols["lat"][i]), abs=0)
