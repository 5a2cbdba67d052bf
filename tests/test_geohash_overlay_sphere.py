"""GeoHash encoding, union-area sweep, and haversine kNN join."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_spark.operators.overlay import union_area_np


def test_geohash_known_vectors(spark):
    from sedona_spark.functions.geohash import st_geohash, st_geohash_neighbors

    df = spark.createDataFrame(
        [(1, -5.60302734375, 42.60498046875), (2, 13.361389, 38.115556)],
        "id int, lon double, lat double",
    )
    got = {
        r.id: r.gh
        for r in df.select(
            "id", st_geohash(F.col("lon"), F.col("lat"), 5).alias("gh")
        ).collect()
    }
    assert got[1] == "ezs42"  # canonical geohash test vector
    assert got[2] == "sqc8b"  # Palermo (classic redis example)

    nb = df.filter(F.col("id") == 1).select(
        st_geohash_neighbors(F.col("lon"), F.col("lat"), 5).alias("n")
    ).collect()[0]["n"]
    assert len(nb) == 8 and "ezs42" not in nb
    # all neighbors share the 3-char prefix except across parent boundaries
    assert all(len(h) == 5 for h in nb)


def test_union_area_sweep():
    # two disjoint unit squares + one overlapping
    x0 = np.array([0.0, 5.0, 0.5])
    x1 = np.array([1.0, 6.0, 1.5])
    y0 = np.array([0.0, 0.0, 0.0])
    y1 = np.array([1.0, 1.0, 1.0])
    assert union_area_np(x0, x1, y0, y1) == pytest.approx(2.5)
    # identical rects: union = one rect
    assert union_area_np([0, 0], [2, 2], [0, 0], [3, 3]) == pytest.approx(6.0)
    # monte-carlo cross-check on random rects
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 8, size=(12, 2))
    w = rng.uniform(0.5, 4, size=(12, 2))
    x0, y0 = a[:, 0], a[:, 1]
    x1, y1 = a[:, 0] + w[:, 0], a[:, 1] + w[:, 1]
    grid = np.linspace(0.005, 11.995, 1200)
    gx, gy = np.meshgrid(grid, grid)
    covered = np.zeros(gx.shape, dtype=bool)
    for i in range(12):
        covered |= (gx >= x0[i]) & (gx <= x1[i]) & (gy >= y0[i]) & (gy <= y1[i])
    mc = covered.mean() * 12.0 * 12.0
    assert union_area_np(x0, x1, y0, y1) == pytest.approx(mc, rel=0.01)


def _haversine(lon1, lat1, lon2, lat2):
    rad = math.pi / 180.0
    a = (
        math.sin((lat2 - lat1) * rad / 2) ** 2
        + math.cos(lat1 * rad) * math.cos(lat2 * rad)
        * math.sin((lon2 - lon1) * rad / 2) ** 2
    )
    return 2 * 6371008.8 * math.asin(math.sqrt(a))


def test_knn_join_sphere_antimeridian_and_pole(spark):
    """The geodesic kNN must find neighbors ACROSS the antimeridian (the
    non-wrapping grid cannot prove completeness there, so the bound falls
    back to the full-grid disk) and near the pole (lon cells are tiny in
    meters; completeness must use the latitude bound)."""
    from sedona_spark.operators.knn import knn_join

    objs = [
        (1, -179.5, 0.0),   # ~111 km across the seam from q1
        (2, 170.0, 0.0),    # ~1055 km east-side
        (3, 0.0, 89.5),     # near-pole, lon 0
        (4, 90.0, 89.3),    # near-pole, lon 90 — close in meters to 3
        (5, 0.0, 80.0),
    ]
    queries = [(100, 179.5, 0.0), (200, 180.0 - 1e-9, 89.4)]
    odf = spark.createDataFrame(objs, "oid int, ox double, oy double")
    qdf = spark.createDataFrame(queries, "qid int, qx double, qy double")
    out = knn_join(
        qdf, odf, k=2, level=3, query_id="qid", qx="qx", qy="qy",
        metric="sphere",
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.qid, []).append((r.knn_rank, r.oid))
    for q in got:
        got[q] = [oid for _, oid in sorted(got[q])]

    for (qid, qx, qy) in queries:
        d = sorted(objs, key=lambda o: (_haversine(qx, qy, o[1], o[2]), o[0]))
        assert got[qid] == [o[0] for o in d[:2]], (qid, got[qid])
    # explicitly: the cross-seam point must beat the same-side point for q1
    assert got[100][0] == 1
