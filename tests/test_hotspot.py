"""Getis-Ord G* vs a numpy oracle; hot blob must surface with high G*."""

import numpy as np
import pytest

from sedona_spark.operators.hotspot import getis_ord_gstar


def test_gstar_vs_numpy_oracle(spark):
    rng = np.random.default_rng(8)
    xy = rng.uniform(0, 100, size=(400, 2))
    vals = rng.uniform(0, 1, size=400)
    # plant a hot cluster
    xy[:20] = rng.normal((50, 50), 1.0, size=(20, 2))
    vals[:20] = 10.0

    df = spark.createDataFrame(
        [(i, float(a), float(b), float(v)) for i, ((a, b), v) in
         enumerate(zip(xy, vals))],
        "point_id int, x double, y double, val double",
    )
    r = 5.0
    got = {row.point_id: row for row in getis_ord_gstar(df, r, level=6).collect()}

    n = len(xy)
    mean = vals.mean()
    sd = vals.std()
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
    band = d2 <= r * r
    for i in [0, 5, 100, 399]:
        nb = int(band[i].sum())
        bsum = float(vals[band[i]].sum())
        denom = sd * np.sqrt((n * nb - nb * nb) / (n - 1))
        expect = (bsum - mean * nb) / denom
        assert got[i].n_band == nb
        assert got[i].g_star == pytest.approx(expect, rel=1e-9)

    # the hotspot is the planted blob's neighborhood: every top-10 G* point
    # lies within the band radius of the blob center (non-members adjacent
    # to the blob legitimately score high too)
    hot = sorted(got.values(), key=lambda r_: -r_.g_star)[:10]
    for h in hot:
        px, py = xy[h.point_id]
        assert (px - 50) ** 2 + (py - 50) ** 2 <= (r + 3 * 1.0) ** 2
