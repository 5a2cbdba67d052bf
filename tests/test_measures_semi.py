"""ST measure folds and semi/anti joins vs closed-form oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_spark.functions.st_measures import (
    st_area,
    st_centroid,
    st_distance_sphere,
    st_make_envelope,
    st_perimeter,
)
from sedona_spark.operators.spatial_join import pip_anti_join, pip_semi_join


def test_measures_on_known_shapes(spark):
    rows = [
        (1, [0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0]),  # 4x3 rect
        (2, [0.0, 0.0, 2.0, 0.0, 0.0, 2.0]),  # right triangle
    ]
    df = spark.createDataFrame(rows, "id int, ring array<double>")
    cx, cy = st_centroid(F.col("ring"))
    got = {
        r.id: r
        for r in df.select(
            "id",
            st_area(F.col("ring")).alias("area"),
            st_perimeter(F.col("ring")).alias("perim"),
            cx.alias("cx"),
            cy.alias("cy"),
        ).collect()
    }
    assert got[1].area == 12.0 and got[1].perim == 14.0
    assert (got[1].cx, got[1].cy) == (2.0, 1.5)
    assert got[2].area == 2.0
    assert got[2].perim == pytest.approx(4 + math.sqrt(8))
    assert (got[2].cx, got[2].cy) == pytest.approx((2 / 3, 2 / 3))


def test_make_envelope(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0)], "a double, b double, c double, d double")
    ring = df.select(
        st_make_envelope(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("r")
    ).collect()[0].r
    assert list(ring) == [1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 1.0, 4.0]


def test_distance_sphere_known_value(spark):
    # London (-0.1278, 51.5074) to Paris (2.3522, 48.8566) ≈ 343.5 km
    df = spark.createDataFrame([(0,)], "i int")
    d = df.select(
        st_distance_sphere(
            F.lit(-0.1278), F.lit(51.5074), F.lit(2.3522), F.lit(48.8566)
        ).alias("d")
    ).collect()[0].d
    assert d == pytest.approx(343_500, rel=0.01)


def test_semi_anti_partition(spark):
    rng = np.random.default_rng(33)
    xy = rng.uniform(0, 100, size=(500, 2))
    pdf = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(xy)],
        "point_id int, x double, y double",
    )
    rects = spark.createDataFrame(
        [(0, 10.0, 10.0, 40.0, 40.0), (1, 30.0, 30.0, 70.0, 80.0)],
        "zone_id int, xmin double, ymin double, xmax double, ymax double",
    )
    semi = {r.point_id for r in pip_semi_join(pdf, rects, level=6).collect()}
    anti = {r.point_id for r in pip_anti_join(pdf, rects, level=6).collect()}
    inside = {
        i
        for i, (a, b) in enumerate(xy)
        if (10 <= a <= 40 and 10 <= b <= 40) or (30 <= a <= 70 and 30 <= b <= 80)
    }
    assert semi == inside
    assert anti == set(range(500)) - inside
    assert len(semi & anti) == 0 and len(semi | anti) == 500
