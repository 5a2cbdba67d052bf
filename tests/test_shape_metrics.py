"""Shape-metric kernels (r5): oriented envelope, minimum clearance,
Visvalingam simplify, polylabel, self-intersection witness, seeded point
generation. Pure numpy — the Spark/SQL surface is exercised by the
``st_shape_metrics`` / ``sql_api_5`` driver queries."""

import numpy as np
import pytest

from sedona_spark.geometry import kernels as K


def _rect(cx, cy, hx, hy):
    return np.array(
        [[cx - hx, cy - hy], [cx + hx, cy - hy],
         [cx + hx, cy + hy], [cx - hx, cy + hy]]
    )


def test_oriented_envelope_rotated_rect_recovers_dims():
    base = _rect(0, 0, 3, 1)
    for theta in (0.3, 1.1, 2.0):
        c, s = np.cos(theta), np.sin(theta)
        rot = base @ np.array([[c, s], [-s, c]])
        _, w, h, a = K.oriented_envelope(rot)
        assert sorted([w, h]) == pytest.approx([2.0, 6.0], abs=1e-9)
        assert a == pytest.approx(12.0, abs=1e-9)


def test_oriented_envelope_beats_axis_bbox_on_diamond():
    d = np.array([[5, 0], [0, 5], [-5, 0], [0, -5]], float)
    _, w, h, a = K.oriented_envelope(d)
    assert a == pytest.approx(50.0, abs=1e-9)  # axis bbox would be 100


def test_minimum_clearance_rect_is_short_side():
    d, *_ = K.minimum_clearance(_rect(10, -3, 4, 1.5).ravel())
    assert d == pytest.approx(3.0, abs=1e-12)


def test_simplify_vw_drops_collinear_then_stops():
    dense = np.array(
        [[0, 0], [2, 0], [4, 0], [4, 1], [4, 2], [2, 2], [0, 2], [0, 1]],
        float,
    )
    out = K.simplify_vw(dense.ravel(), 1e-9)
    assert len(out) == 4
    assert set(map(tuple, out)) == {(0, 0), (4, 0), (4, 2), (0, 2)}
    # threshold below nothing → unchanged
    assert len(K.simplify_vw(_rect(0, 0, 2, 1).ravel(), 1e-12)) == 4


def test_polylabel_rect_center_and_hole_band():
    x, y, d = K.polylabel([_rect(4, 2, 4, 2)])
    assert d == pytest.approx(2.0, abs=1e-9)
    assert 0 < x < 8 and 0 < y < 4
    shell = _rect(2, 1, 2, 1)
    hole = _rect(2, 1, 1, 0.5)[::-1]  # CW hole
    hx, hy_, hd = K.polylabel([shell, hole])
    assert hd == pytest.approx(0.5, abs=1e-6)
    inside = K.point_in_rings_batch(
        [[shell, hole]], np.array([hx]), np.array([hy_])
    )
    assert bool(inside[0])


def test_self_intersection_witness():
    bow = np.array([0, 0, 2, 2, 2, 0, 0, 2], float)
    w = K.self_intersection_witness(bow)
    assert w == pytest.approx((1.0, 1.0))
    assert K.self_intersection_witness(_rect(0, 0, 1, 1).ravel()) is None


def test_generate_points_deterministic_inside_count():
    rings = [_rect(100, -40, 3, 2)]
    a = K.generate_points_in_rings(rings, 16, 7)
    b = K.generate_points_in_rings(rings, 16, 7)
    assert np.array_equal(a, b)
    assert len(a) == 16
    assert (np.abs(a[:, 0] - 100) < 3).all()
    assert (np.abs(a[:, 1] + 40) < 2).all()
    # different seed → different points
    c = K.generate_points_in_rings(rings, 16, 8)
    assert not np.array_equal(a, c)
    # concave target: rejection actually rejects (L-shape)
    ell = np.array(
        [[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], float
    )
    p = K.generate_points_in_rings([ell], 32, 3)
    inside = K.point_in_rings_batch([[ell]] * 32, p[:, 0], p[:, 1])
    assert inside.all()


# --- Hilbert cell option (cells.py r5) ---------------------------------------


def test_hilbert_bijective_unit_steps_multilevel():
    from sedona_spark import cells

    for lv in (1, 2, 3, 5):
        n = 1 << lv
        gx, gy = np.meshgrid(np.arange(n), np.arange(n))
        d = cells.hilbert_np(gx.ravel(), gy.ravel(), lv)
        assert sorted(d.tolist()) == list(range(n * n))
        order = np.argsort(d)
        step = (np.abs(np.diff(gx.ravel()[order]))
                + np.abs(np.diff(gy.ravel()[order])))
        assert (step == 1).all()


def test_hilbert_locality_beats_row_major():
    """The pruning property: a contiguous INDEX range (one file /
    partition of a curve-sorted table) covers a compact bbox. Row-major
    ranges span the full grid width; Hilbert ranges stay ~sqrt(k)."""
    from sedona_spark import cells

    lv = 5
    n = 1 << lv
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()

    def max_window_extent(order_idx, k=64):
        xs, ys = gx[order_idx], gy[order_idx]
        worst = 0
        for s in range(0, n * n, k):
            wx = xs[s: s + k].max() - xs[s: s + k].min()
            wy = ys[s: s + k].max() - ys[s: s + k].min()
            worst = max(worst, int(wx), int(wy))
        return worst

    h_order = np.argsort(cells.hilbert_np(gx, gy, lv))
    rm_order = np.argsort(gy * n + gx)
    assert max_window_extent(h_order) <= 8      # 64 cells ≈ 8×8 block
    assert max_window_extent(rm_order) >= n - 1  # full-width strips


def test_hilbert_column_matches_numpy(spark):
    from pyspark.sql import functions as F

    from sedona_spark import cells

    lv = 4
    n = 1 << lv
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("gx"), (F.col("id") / n).cast("long").alias("gy")
    )
    got = (
        df.select("gx", "gy",
                  cells.hilbert_from_grid(F.col("gx"), F.col("gy"), lv)
                  .alias("d"))
        .toPandas().sort_values(["gx", "gy"])
    )
    exp = cells.hilbert_np(got.gx.to_numpy(), got.gy.to_numpy(), lv)
    assert (got.d.to_numpy() == exp).all()


# --- GML/KML markup tier (geometry/markup.py r5) ------------------------------


def test_markup_round_trip_gml_kml_and_gml3():
    from sedona_spark.geometry import markup as M

    shell = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], float)
    hole = np.array([[1, 0.5], [3, 0.5], [3, 1.5], [1, 1.5]], float)[::-1]
    for emit in (M.rings_to_gml, M.rings_to_kml):
        rl = M.parse_markup_rings(emit([shell, hole]))
        assert len(rl) == 2
        assert np.array_equal(rl[0], shell)
        assert np.array_equal(rl[1], hole)
    g3 = ("<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>"
          "0 0 4 0 4 2 0 2 0 0</gml:posList></gml:LinearRing>"
          "</gml:exterior></gml:Polygon>")
    assert np.array_equal(M.parse_markup_rings(g3)[0], shell)
    # orientation canonicalized: CW shell input comes back CCW
    g_cw = M.rings_to_gml([shell[::-1]])
    assert np.array_equal(M.parse_markup_rings(g_cw)[0][0], shell[0])
    with pytest.raises(ValueError):
        M.parse_markup_rings("<Polygon></Polygon>")
