"""Moran's I vs numpy oracle: clustered values → strong positive I."""

import numpy as np
import pytest

from sedona_spark.operators.autocorrelation import morans_i


def test_morans_i_vs_numpy(spark):
    rng = np.random.default_rng(4)
    xy = rng.uniform(0, 50, size=(300, 2))
    # spatially autocorrelated values: value = f(position) + noise
    vals = np.sin(xy[:, 0] / 8.0) + np.cos(xy[:, 1] / 8.0) + rng.normal(0, 0.1, 300)

    df = spark.createDataFrame(
        [(i, float(a), float(b), float(v)) for i, ((a, b), v) in
         enumerate(zip(xy, vals))],
        "point_id int, x double, y double, val double",
    )
    r = 5.0
    got = morans_i(df, r, level=6).collect()[0]

    z = vals - vals.mean()
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
    w = (d2 <= r * r) & ~np.eye(len(xy), dtype=bool)
    expect = (len(xy) / w.sum()) * (z[:, None] * z[None, :])[w].sum() / (z * z).sum()

    assert got.n == 300 and got.w_sum == int(w.sum())
    assert got.moran_i == pytest.approx(expect, rel=1e-9)
    assert got.moran_i > 0.3  # clustered data → strong positive autocorrelation
