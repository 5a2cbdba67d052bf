"""SQL-string surface parity: every registered function must agree with
its DataFrame-API implementation (the reference's Catalog.registerAll
analog, ``sedona_spark.sql_registry.register``)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import sedona_spark


@pytest.fixture(scope="module")
def reg(spark):
    sedona_spark.register(spark)
    return spark


def test_sql_scalar_functions_match_column_api(reg):
    spark = reg
    from sedona_spark.functions import st_measures as m

    df = spark.range(1, 6).select(
        (F.col("id") * 1.5).alias("x"), (F.col("id") * 0.7).alias("y"),
        (F.col("id") + 2.0).alias("w"), (F.col("id") + 1.0).alias("h"),
    )
    df.createOrReplaceTempView("t_sqlreg")
    got = spark.sql(
        "select ST_Area(ST_MakeEnvelope(x, y, x + w, y + h)) a, "
        "ST_Perimeter(ST_MakeEnvelope(x, y, x + w, y + h)) p, "
        "ST_NumPoints(ST_MakeEnvelope(x, y, x + w, y + h)) n, "
        "ST_Distance(x, y, 0e0, 0e0) d, "
        "ST_Centroid(ST_MakeEnvelope(x, y, x + w, y + h)).cx cx, "
        "ST_X(ST_Point(x, y)) px, "
        "ST_DWithin(x, y, 0e0, 0e0, 4e0) dw "
        "from t_sqlreg order by a"
    ).collect()
    ring = m.st_make_envelope(
        F.col("x"), F.col("y"), F.col("x") + F.col("w"), F.col("y") + F.col("h")
    )
    want = df.select(
        m.st_area(ring).alias("a"),
        m.st_perimeter(ring).alias("p"),
        F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y")).alias("d"),
        m.st_centroid(ring)[0].alias("cx"),
    ).orderBy("a").collect()
    for g, w in zip(got, want):
        assert abs(g["a"] - w["a"]) < 1e-9
        assert abs(g["p"] - w["p"]) < 1e-9
        assert g["n"] == 4
        assert abs(g["d"] - w["d"]) < 1e-9
        assert abs(g["cx"] - w["cx"]) < 1e-9
        assert abs(g["px"]) >= 0.0
        assert g["dw"] == (g["d"] <= 4.0)


def test_sql_sphere_and_geohash_match(reg):
    spark = reg
    from sedona_spark.functions.geohash import st_geohash
    from sedona_spark.functions.st_measures import st_distance_sphere

    df = spark.range(0, 20).select(
        ((F.col("id") * 17 % 360) - 180.0 + 0.5).alias("lon"),
        ((F.col("id") * 7 % 170) - 85.0 + 0.25).alias("lat"),
    )
    df.createOrReplaceTempView("t_geo")
    got = spark.sql(
        "select ST_DistanceSphere(lon, lat, 0e0, 0e0) d, "
        "ST_GeoHash(lon, lat, 5) g from t_geo order by lon"
    ).collect()
    want = df.select(
        st_distance_sphere(
            F.col("lon"), F.col("lat"), F.lit(0.0), F.lit(0.0)
        ).alias("d"),
        st_geohash(F.col("lon"), F.col("lat"), 5).alias("g"),
    ).orderBy("lon").collect()
    for g, w in zip(got, want):
        assert abs(g["d"] - w["d"]) < 1e-6
        assert g["g"] == w["g"]


def test_sql_pandas_tier_wkt_pip_makevalid(reg):
    spark = reg
    rows = spark.sql(
        "select ST_AsText(ST_GeomFromWKT("
        "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))'"
        ")) wkt_rt, "
        "ST_GeomStats(ST_GeomFromWKT("
        "'MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 12 0, 12 2, 10 2, 10 0)))'"
        ")).area marea, "
        "ST_Contains(ST_GeomFromWKT('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), 2e0, 2e0) cin, "
        "ST_Contains(ST_GeomFromWKT("
        "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 8, 8 8, 8 2, 2 2))'), 5e0, 5e0) inhole, "
        "ST_GeomStats(ST_MakeValid(array(0e0, 0e0, 4e0, 2e0, 4e0, 0e0, 0e0, 2e0))).area bowtie"
    ).collect()[0]
    assert rows["wkt_rt"] == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
    )
    assert abs(rows["marea"] - 20.0) < 1e-9  # 16 + 4
    assert rows["cin"] is True
    assert rows["inhole"] is False  # point sits inside the hole
    assert abs(rows["bowtie"] - 4.0) < 1e-9  # two 2.0 triangles


def test_sql_udf_inlines_into_codegen(reg):
    spark = reg
    df = spark.sql(
        "select ST_Area(ST_MakeEnvelope(cast(id as double), 0e0, "
        "cast(id as double) + 2e0, 3e0)) a from range(10)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # SQL-tier functions must inline (no python eval node in the plan)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert sum(r["a"] for r in df.collect()) == 60.0


def test_sql_spheroid_and_project_match(reg):
    spark = reg
    from sedona_spark.functions.st_measures import (
        st_distance_spheroid,
        st_project_sphere,
    )

    df = spark.range(1, 20).select(
        ((F.col("id") * 19 % 340) - 170.0 + 0.5).alias("lon"),
        ((F.col("id") * 11 % 160) - 80.0 + 0.25).alias("lat"),
    )
    df.createOrReplaceTempView("t_sph")
    got = spark.sql(
        "select ST_DistanceSpheroid(lon, lat, 2e0, 48e0) d, "
        "ST_Project(lon, lat, 3e1, 5e4).lon plon, "
        "ST_Project(lon, lat, 3e1, 5e4).lat plat from t_sph order by lon"
    ).collect()
    plon, plat = st_project_sphere(
        F.col("lon"), F.col("lat"), F.lit(30.0), F.lit(50000.0)
    )
    want = df.select(
        st_distance_spheroid(
            F.col("lon"), F.col("lat"), F.lit(2.0), F.lit(48.0)
        ).alias("d"),
        plon.alias("plon"), plat.alias("plat"),
    ).orderBy("lon").collect()
    for g, w in zip(got, want):
        assert abs(g["d"] - w["d"]) < 1e-6
        assert abs(g["plon"] - w["plon"]) < 1e-9
        assert abs(g["plat"] - w["plat"]) < 1e-9


def test_sql_azimuthal_and_orientation(reg):
    spark = reg
    from sedona_spark.functions.crs import st_transform_aeqd, st_transform_laea

    df = spark.range(1, 15).select(
        ((F.col("id") * 23 % 300) - 150.0 + 0.5).alias("lon"),
        ((F.col("id") * 13 % 120) - 60.0 + 0.25).alias("lat"),
    )
    df.createOrReplaceTempView("t_az")
    got = spark.sql(
        "select ST_TransformLAEA(lon, lat, 1e1, 45e0).x lx, "
        "ST_TransformAEQD(lon, lat, 1e1, 45e0).y ay from t_az order by lon"
    ).collect()
    lx, _ = st_transform_laea(F.col("lon"), F.col("lat"), 10.0, 45.0)
    _, ay = st_transform_aeqd(F.col("lon"), F.col("lat"), 10.0, 45.0)
    want = df.select(lx.alias("lx"), ay.alias("ay")).orderBy("lon").collect()
    for g, w in zip(got, want):
        assert abs(g["lx"] - w["lx"]) < 1e-6
        assert abs(g["ay"] - w["ay"]) < 1e-6

    r = spark.sql(
        "select ST_Reverse(array(0e0, 0e0, 4e0, 0e0, 4e0, 3e0)) rv, "
        "ST_ForcePolygonCCW(ST_Reverse(array(0e0, 0e0, 4e0, 0e0, 4e0, 3e0, 0e0, 3e0))) f, "
        "ST_Area(ST_ForcePolygonCW(array(0e0, 0e0, 4e0, 0e0, 4e0, 3e0, 0e0, 3e0))) a"
    ).collect()[0]
    assert r["rv"] == [4.0, 3.0, 4.0, 0.0, 0.0, 0.0]
    assert r["f"] == [0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0]
    assert r["a"] == 12.0


def test_sql_rs_value_and_azimuth(reg):
    spark = reg
    import math

    from sedona_spark.sources.images import synthesize_images

    imgs = synthesize_images(spark, 6)
    imgs.createOrReplaceTempView("t_imgs")
    from sedona_spark.functions.raster import rs_value
    from pyspark.sql import functions as FF

    got = spark.sql(
        "select image_id, RS_Value(bytes, 3, 4, 1) v from t_imgs order by image_id"
    ).collect()
    want = imgs.select(
        "image_id", rs_value(FF.col("bytes"), FF.lit(3), FF.lit(4), FF.lit(1)).alias("v")
    ).orderBy("image_id").collect()
    assert [(r["image_id"], r["v"]) for r in got] == [
        (r["image_id"], r["v"]) for r in want
    ]
    az = spark.sql(
        "select ST_Azimuth(0e0, 0e0, 1e0, 1e0) a, "
        "ST_Azimuth(0e0, 0e0, 0e0, -1e0) s, "
        "ST_Azimuth(0e0, 0e0, -1e0, 0e0) w"
    ).collect()[0]
    assert abs(az["a"] - math.pi / 4) < 1e-12
    assert abs(az["s"] - math.pi) < 1e-12
    assert abs(az["w"] - 3 * math.pi / 2) < 1e-12
