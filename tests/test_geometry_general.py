"""Geometry generality: holes, MultiPolygon, LineString, predicate family.

Kernel-level tests are pure numpy (no Spark); operator tests round-trip
through the Arrow UDFs and the cell-join plans.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_spark.geometry import kernels as K

SHELL = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]
HOLE = [3.0, 3.0, 7.0, 3.0, 7.0, 7.0, 3.0, 7.0]


def test_pip_rings_holes_and_multi():
    geoms = [[SHELL, HOLE]] * 6
    px = [1, 5, 3, 0, 11, 7]
    py = [1, 5, 3, 5, 5, 5]
    got = K.point_in_rings_batch(geoms, px, py)
    assert list(got) == [K.PIP_IN, K.PIP_OUT, K.PIP_BOUNDARY, K.PIP_BOUNDARY,
                         K.PIP_OUT, K.PIP_BOUNDARY]
    mp = [[[0, 0, 2, 0, 2, 2, 0, 2], [5, 5, 7, 5, 7, 7, 5, 7]]] * 3
    assert list(K.point_in_rings_batch(mp, [1, 6, 3.5], [1, 6, 3.5])) == [
        K.PIP_IN, K.PIP_IN, K.PIP_OUT]


def test_pip_rings_brute_force_parity():
    """Even-odd multi-ring PIP == single-ring parity on random shells, and
    the hole variant flips exactly the points inside the hole."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 12, size=(500, 2))
    single = K.point_in_polygon_batch([SHELL] * 500, pts[:, 0], pts[:, 1])
    multi = K.point_in_rings_batch([[SHELL]] * 500, pts[:, 0], pts[:, 1])
    assert (single == multi).all()
    holed = K.point_in_rings_batch([[SHELL, HOLE]] * 500, pts[:, 0], pts[:, 1])
    in_hole = (
        (pts[:, 0] > 3) & (pts[:, 0] < 7) & (pts[:, 1] > 3) & (pts[:, 1] < 7)
    )
    expect = np.where(in_hole, K.PIP_OUT, single)
    assert (holed == expect).all()


def test_linestring_kernels():
    lines = [[0, 0, 1, 1], [20, 20, 30, 30], [4, 5, 6, 5], [-1, 5, 11, 5],
             [0, 11, 11, 11], [10, 10, 15, 15]]
    rl = [[SHELL]] * 6
    got = K.linestring_intersects_rings_batch(lines, rl)
    assert list(got) == [True, False, True, True, False, True]  # corner touch
    # 3-vertex polyline crossing in its second segment
    poly3 = [[-5, -5, -5, 5, 5, 5]]
    assert K.linestring_intersects_rings_batch(poly3, [[SHELL]])[0]
    a = [[0, 0, 10, 10], [0, 0, 1, 0], [0, 0, 5, 5]]
    b = [[0, 10, 10, 0], [5, 5, 6, 6], [5, 5, 9, 1]]
    assert list(K.linestrings_intersect_batch(a, b)) == [True, False, True]


def _rect(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def test_pair_flags_rect_oracle():
    """Flags vs the closed-form rect relation on random rect pairs."""
    rng = np.random.default_rng(7)
    n = 400
    a = rng.uniform(0, 10, size=(n, 2))
    b = a + rng.uniform(1, 6, size=(n, 2))
    c = rng.uniform(0, 10, size=(n, 2))
    d = c + rng.uniform(1, 6, size=(n, 2))
    A = [_rect(a[i, 0], a[i, 1], b[i, 0], b[i, 1]) for i in range(n)]
    B = [_rect(c[i, 0], c[i, 1], d[i, 0], d[i, 1]) for i in range(n)]
    f = K.polygon_pair_flags_batch(A, B)
    ix0 = np.maximum(a[:, 0], c[:, 0])
    ix1 = np.minimum(b[:, 0], d[:, 0])
    iy0 = np.maximum(a[:, 1], c[:, 1])
    iy1 = np.minimum(b[:, 1], d[:, 1])
    its = (ix0 <= ix1) & (iy0 <= iy1)
    ii = (ix0 < ix1) & (iy0 < iy1)
    w_ab = (a[:, 0] >= c[:, 0]) & (b[:, 0] <= d[:, 0]) & (a[:, 1] >= c[:, 1]) & (b[:, 1] <= d[:, 1])
    w_ba = (c[:, 0] >= a[:, 0]) & (d[:, 0] <= b[:, 0]) & (c[:, 1] >= a[:, 1]) & (d[:, 1] <= b[:, 1])
    assert (f["intersects"] == its).all()
    assert (f["ii"] == ii).all()
    assert (f["a_in_b"] == w_ab).all()
    assert (f["b_in_a"] == w_ba).all()


def test_pair_flags_exact_touch_cases():
    A = _rect(0, 0, 10, 10)
    cases = [
        (_rect(0, 0, 10, 10), dict(intersects=True, ii=True, a_in_b=True, b_in_a=True)),
        (_rect(10, 0, 20, 10), dict(intersects=True, ii=False, a_in_b=False, b_in_a=False)),
        (_rect(10, 10, 20, 20), dict(intersects=True, ii=False, a_in_b=False, b_in_a=False)),
        (_rect(5, 0, 15, 10), dict(intersects=True, ii=True, a_in_b=False, b_in_a=False)),
        (_rect(2, 2, 8, 8), dict(intersects=True, ii=True, a_in_b=False, b_in_a=True)),
        (_rect(11, 0, 20, 10), dict(intersects=False, ii=False, a_in_b=False, b_in_a=False)),
    ]
    f = K.polygon_pair_flags_batch([A] * len(cases), [c[0] for c in cases])
    for i, (_, exp) in enumerate(cases):
        for k, v in exp.items():
            assert f[k][i] == v, (i, k)


def test_pair_flags_diamond():
    """Convex non-rect pair: diamond inscribed in its bounding square —
    touches at 4 midpoints, interiors DO intersect."""
    sq = _rect(0, 0, 10, 10)
    diamond = [5, 0, 10, 5, 5, 10, 0, 5]
    f = K.polygon_pair_flags_batch([sq], [diamond])
    assert f["intersects"][0] and f["ii"][0]
    assert f["b_in_a"][0] and not f["a_in_b"][0]
    # diamonds touching at exactly one vertex (10,5)
    d2 = [10, 5, 15, 0, 20, 5, 15, 10]
    f2 = K.polygon_pair_flags_batch([diamond], [d2])
    assert f2["intersects"][0] and not f2["ii"][0]
    # fully disjoint diamonds
    d3 = [30, 5, 35, 0, 40, 5, 35, 10]
    f3 = K.polygon_pair_flags_batch([diamond], [d3])
    assert not f3["intersects"][0]


def test_spark_multi_ring_join_and_outer(spark):
    from sedona_spark.operators.spatial_join import (
        pip_join_multi,
        pip_left_outer_join,
    )

    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 5.0, 5.0), (3, 50.0, 50.0), (4, 6.0, 1.5)],
        "pid int, x double, y double",
    )
    zones = spark.createDataFrame(
        [(100, [SHELL, HOLE])],
        "zid int, geom array<array<double>>",
    )
    got = {r.pid for r in pip_join_multi(pts, zones, "covers", level=5).collect()}
    assert got == {1, 4}  # 2 is in the hole, 3 outside

    rects = spark.createDataFrame(
        [(7, 0.0, 0.0, 10.0, 10.0)], "zid int, xmin double, ymin double, xmax double, ymax double"
    )
    outer = pip_left_outer_join(pts, rects, level=5, id_col="pid").collect()
    by_pid = {r.pid: r.zid for r in outer}
    assert by_pid[1] == 7 and by_pid[2] == 7 and by_pid[4] == 7
    assert by_pid[3] is None
    assert len(outer) == 4


def test_spark_linestring_join(spark):
    from sedona_spark.operators.spatial_join import linestring_polygon_join

    lines = spark.createDataFrame(
        [(1, [-5.0, 5.0, 15.0, 5.0]), (2, [20.0, 20.0, 30.0, 30.0]),
         (3, [4.0, 4.0, 6.0, 6.0])],
        "lid int, line array<double>",
    )
    zones = spark.createDataFrame(
        [(100, [SHELL])], "zid int, geom array<array<double>>"
    )
    got = {r.lid for r in linestring_polygon_join(lines, zones, level=4).collect()}
    assert got == {1, 3}


def test_spark_predicate_join(spark):
    from sedona_spark.operators.spatial_join import polygon_predicate_join

    left = spark.createDataFrame(
        [(1, [float(v) for v in _rect(0, 0, 10, 10)])],
        "lid int, l_ring array<double>",
    )
    right = spark.createDataFrame(
        [(10, [float(v) for v in _rect(5, 0, 15, 10)]),
         (11, [float(v) for v in _rect(10, 0, 20, 10)]),
         (12, [float(v) for v in _rect(2, 2, 8, 8)])],
        "rid int, r_ring array<double>",
    )
    ov = {r.rid for r in polygon_predicate_join(left, right, "overlaps", level=4).collect()}
    assert ov == {10}
    t_ = {r.rid for r in polygon_predicate_join(left, right, "touches", level=4).collect()}
    assert t_ == {11}
    ct = {r.rid for r in polygon_predicate_join(left, right, "contains", level=4).collect()}
    assert ct == {12}


def test_simplify_dp_properties():
    rng = np.random.default_rng(9)
    n = 200
    t = np.linspace(0, 10, n)
    path = np.stack([t, np.sin(t) + rng.normal(0, 0.01, n)], axis=1)
    for tol in (0.05, 0.3, 1.0):
        out = K.simplify_dp(path, tol)
        assert (out[0] == path[0]).all() and (out[-1] == path[-1]).all()
        assert len(out) <= len(path)
        # every dropped vertex is within tol of the simplified chain
        kept_idx = 0
        keep_mask = np.zeros(len(path), dtype=bool)
        for v in out:
            while not (path[kept_idx] == v).all():
                kept_idx += 1
            keep_mask[kept_idx] = True
        for i in np.flatnonzero(~keep_mask):
            # distance to the enclosing kept segment
            prev = max(j for j in np.flatnonzero(keep_mask) if j < i)
            nxt = min(j for j in np.flatnonzero(keep_mask) if j > i)
            a, b, p = path[prev], path[nxt], path[i]
            seg = b - a
            d = abs(np.cross(seg, p - a)) / np.linalg.norm(seg)
            assert d <= tol + 1e-12
    # tol=0 keeps everything except strictly-collinear interiors
    line = np.array([[0, 0], [1, 1], [2, 2], [3, 3.5]])
    assert len(K.simplify_dp(line, 0.0)) == 3  # (1,1) is collinear


def test_convex_hull_properties():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-5, 5, size=(300, 2))
    hull = K.convex_hull(pts)
    # all points in/on the hull polygon
    inside = K.points_in_one_polygon(hull.ravel(), pts[:, 0], pts[:, 1])
    assert (inside > 0).all()
    # hull vertices are a subset of the input points
    pset = {tuple(p) for p in pts}
    assert all(tuple(v) in pset for v in hull)
    # square corners: hull of a grid is the 4 corners
    g = np.array([[x, y] for x in range(4) for y in range(4)], dtype=float)
    assert len(K.convex_hull(g)) == 4


def test_spark_wkt_simplify_hull(spark):
    from sedona_spark.functions.st import st_convex_hull, st_geom_from_wkt, st_simplify

    df = spark.createDataFrame(
        [
            (1, "POINT (3.5 -2.25)"),
            (2, "LINESTRING (0 0, 1 1, 2 2, 3 3.5)"),
            (3, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ],
        "id int, wkt string",
    )
    got = {r.id: r.g for r in df.select("id", st_geom_from_wkt(F.col("wkt")).alias("g")).collect()}
    assert got[1] == [3.5, -2.25]
    assert got[2] == [0, 0, 1, 1, 2, 2, 3, 3.5]
    assert got[3][:4] == [0.0, 0.0, 10.0, 0.0] and len(got[3]) == 10

    simp = df.filter(F.col("id") == 2).select(
        st_simplify(st_geom_from_wkt(F.col("wkt")), 0.0).alias("s")
    ).collect()[0]["s"]
    assert simp == [0, 0, 2, 2, 3, 3.5]

    hull = df.filter(F.col("id") == 3).select(
        st_convex_hull(st_geom_from_wkt(F.col("wkt"))).alias("h")
    ).collect()[0]["h"]
    assert len(hull) == 8  # 4 corners
    hv = np.asarray(hull).reshape(-1, 2)
    area = 0.5 * abs(
        float(np.cross(hv, np.roll(hv, -1, axis=0)).sum())
    )
    assert area == 100.0


def test_linear_referencing_kernels():
    import numpy as np

    from sedona_spark.geometry.kernels import (
        polyline_interpolate,
        polyline_locate,
        polyline_substring,
    )

    line = np.array([0.0, 0.0, 4.0, 0.0, 4.0, 4.0])
    assert np.allclose(polyline_interpolate(line, 0.0), [0, 0])
    assert np.allclose(polyline_interpolate(line, 1.0), [4, 4])
    assert np.allclose(polyline_interpolate(line, 0.5), [4, 0])
    assert np.allclose(polyline_interpolate(line, 0.75), [4, 2])
    # clamping
    assert np.allclose(polyline_interpolate(line, 1.5), [4, 4])
    frac, foot = polyline_locate(line, 5.0, 1.0)
    assert np.allclose(foot, [4, 1]) and abs(frac - 5.0 / 8.0) < 1e-12
    # equidistant tie between the two segments resolves to the LOWER frac
    frac, foot = polyline_locate(line, 3.0, 1.0)
    assert np.allclose(foot, [3, 0]) and abs(frac - 3.0 / 8.0) < 1e-12
    sub = polyline_substring(line, 0.25, 0.75)
    assert np.allclose(sub, [[2, 0], [4, 0], [4, 2]])
    # degenerate: zero-length line
    pt = np.array([1.0, 2.0, 1.0, 2.0])
    assert np.allclose(polyline_interpolate(pt, 0.7), [1, 2])


def test_geometric_median_and_segmentize():
    import numpy as np

    from sedona_spark.geometry.kernels import geometric_median, segmentize

    # Weiszfeld optimality: at the result, unit vectors to the points sum
    # to ~0 (interior case)
    rs = np.random.RandomState(5)
    p = rs.rand(9, 2) * 10
    mx, my = geometric_median(p.ravel())
    v = p - np.array([mx, my])
    d = np.hypot(v[:, 0], v[:, 1])
    g = (v / d[:, None]).sum(axis=0)
    assert np.hypot(*g) < 1e-6
    # 3 points: median of a very obtuse triangle is the middle vertex
    tri = np.array([0.0, 0.0, 1.0, 0.05, 2.0, 0.0])
    mx, my = geometric_median(tri)
    assert abs(mx - 1.0) < 1e-9 and abs(my - 0.05) < 1e-9
    # segmentize: vertex count and length preservation
    line = np.array([0.0, 0.0, 4.0, 0.0, 4.0, 1.0])
    out = segmentize(line, 1.5).reshape(-1, 2)
    dd = np.hypot(*(out[1:] - out[:-1]).T)
    assert len(out) == 1 + 3 + 1 and (dd <= 1.5 + 1e-12).all()
    assert abs(dd.sum() - 5.0) < 1e-12
