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


def test_sql_rs_band_array_map_algebra(reg):
    """The MapAlgebra array tier mirrors the reference's Java semantics
    (MapAlgebra.java:288-654): reversed subtract, floor(x*100+0.5)/100
    rounding, 0->-1 remap + 0-denominator guard in NormalizedDifference,
    constant->zeros Normalize, unique->unchanged Mode (largest-value
    tie-break), and fetchRegion's row-major i*dim[0]+j walk."""
    spark = reg
    r = spark.sql(
        "select RS_Add(array(1e0,2e0), array(3e0,4e0)) a, "
        "RS_Subtract(array(1e0,2e0), array(3e0,5e0)) s, "
        "RS_Divide(array(1e0,2e0), array(3e0,7e0)) d, "
        "RS_SquareRoot(array(2e0,9e0)) sq, "
        "RS_BitwiseAnd(array(6e0,5e0), array(3e0,3e0)) ba, "
        "RS_BitwiseOr(array(6e0,5e0), array(3e0,3e0)) bo, "
        "RS_Normalize(array(10e0,20e0,30e0)) nz, "
        "RS_Normalize(array(5e0,5e0)) nzc, "
        "RS_NormalizedDifference(array(0e0,2e0), array(4e0,6e0)) nd, "
        "RS_NormalizedDifference(array(0e0), array(1e0)) ndz, "
        "RS_Mean(array(1e0,2e0,4e0)) mn, "
        "RS_Mode(array(1e0,2e0,2e0,3e0)) md, "
        "RS_Mode(array(1e0,2e0,3e0)) mdu, "
        "RS_Mode(array(1e0,1e0,3e0,3e0)) mdt, "
        "RS_CountValue(array(1e0,2e0,2e0), 2e0) cv, "
        "RS_GreaterThan(array(1e0,5e0), 2e0) gt, "
        "RS_LessThanEqual(array(1e0,5e0), 1e0) le, "
        "RS_FetchRegion(array(0e0,1e0,2e0,3e0,4e0,5e0), "
        "  array(0,1,1,2), array(3,2)) fr, "
        "RS_Array(3, 7e0) ar, "
        "RS_LogicalDifference(array(1e0,2e0), array(1e0,5e0)) ld, "
        "RS_LogicalOver(array(0e0,2e0), array(9e0,8e0)) lo, "
        "RS_Modulo(array(7e0,-7e0), 3e0) mo, "
        "RS_MultiplyFactor(array(2e0,3e0), 2.5e0) mf"
    ).collect()[0]
    assert r["a"] == [4.0, 6.0]
    assert r["s"] == [2.0, 3.0]          # band2 - band1
    assert r["d"] == [0.33, 0.29]        # 2-decimal Java rounding
    assert r["sq"] == [1.41, 3.0]
    assert r["ba"] == [2.0, 1.0] and r["bo"] == [7.0, 7.0]
    assert r["nz"] == [0.0, 127.5, 255.0]
    assert r["nzc"] == [0.0, 0.0]        # constant band -> zeros
    assert r["nd"] == [1.67, 0.5]        # 0 remapped to -1 first
    assert r["ndz"] == [0.0]             # guarded 0 denominator
    assert abs(r["mn"] - 7.0 / 3) < 1e-12
    assert r["md"] == [2.0]
    assert r["mdu"] == [1.0, 2.0, 3.0]   # all unique -> unchanged
    assert r["mdt"] == [3.0]             # tie -> largest value
    assert r["cv"] == 2
    assert r["gt"] == [0.0, 1.0] and r["le"] == [1.0, 0.0]
    assert r["fr"] == [1.0, 2.0, 4.0, 5.0]
    assert r["ar"] == [7.0, 7.0, 7.0]
    assert r["ld"] == [0.0, 2.0]
    assert r["lo"] == [9.0, 2.0]
    assert r["mo"] == [1.0, -1.0]        # Java % keeps dividend sign
    assert r["mf"] == [5.0, 7.5]


def test_sql_rs_georeferenced_raster_struct(reg):
    """The georef STRUCT raster tier mirrors RasterAccessors.java: 1-based
    UPPER_LEFT-anchored grid<->world affine, GDAL/ESRI georeference
    strings, geotransform magnitudes/angles with the reference's acos sign
    tests, pixel geometry, nodata-aware MinConvexHull, and the
    envelope-based raster predicates (RasterPredicates.java)."""
    import numpy as np

    from sedona_spark.sources.images import encode_image

    spark = reg
    arr = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)  # w=4, h=3
    df = spark.createDataFrame([(encode_image(arr, "fpng"),)], "buf binary")
    df.createOrReplaceTempView("rst_t")
    r = spark.sql("""
with r as (select RS_SetGeoReference(
             RS_SetSRID(RS_MakeRasterMeta(buf, 4, 3, 3, 0e0, 0e0, 1e0),
                        4326),
             10e0, 20e0, 2e0, -2e0, 0e0, 0e0) as r from rst_t)
select RS_UpperLeftX(r) ulx, RS_ScaleY(r) sy, RS_SRID(r) srid,
       RS_GeoReference(r, 'GDAL') gd, RS_GeoReference(r, 'ESRI') es,
       RS_GeoTransform(r) gt, RS_Rotation(r) rot,
       RS_RasterToWorldCoordX(r, 2, 3) wx,
       RS_RasterToWorldCoordY(r, 2, 3) wy,
       RS_WorldToRasterCoord(r, 13e0, 15e0) gc,
       RS_PixelAsCentroid(r, 1, 1) pc,
       RS_PixelAsPolygon(r, 2, 2) pp,
       RS_Envelope(r) env, RS_ConvexHull(r) ch,
       element_at(RS_PixelAsPoints(r, 0), 3) p3,
       RS_ValueAt(r, 13e0, 15e0, 0) va,
       RS_SummaryStatsAll(r, 0) ss,
       RS_BandIsNoData(RS_SetBandNoDataValue(r, 0e0), 0) bnd_f,
       RS_Intersects(r, array(12e0,12e0, 30e0,12e0, 30e0,19e0, 12e0,19e0))
           ri,
       RS_Contains(r, array(11e0,15e0, 13e0,15e0, 13e0,17e0, 11e0,17e0))
           rc,
       RS_Contains(r, array(5e0,15e0, 13e0,15e0, 13e0,17e0, 5e0,17e0))
           rc_out,
       RS_Within(r, array(0e0,0e0, 99e0,0e0, 99e0,99e0, 0e0,99e0)) rw
from r
""").collect()[0]
    assert r["ulx"] == 10.0 and r["sy"] == -2.0 and r["srid"] == 4326
    assert r["gd"].split(" \n") == [
        "2.000000", "0.000000", "0.000000", "-2.000000", "10.000000",
        "20.000000"]
    assert r["es"].split(" \n")[4:] == ["11.000000", "19.000000"]
    assert r["gt"][:2] == [2.0, 2.0] and r["gt"][4:] == [10.0, 20.0]
    assert r["rot"] == 0.0
    assert abs(r["gt"][3] + 1.5707963267948966) < 1e-12  # north-up: -pi/2
    assert (r["wx"], r["wy"]) == (12.0, 16.0)  # 1-based corner anchor
    assert r["gc"] == [2.0, 3.0]               # floor + 1
    assert r["pc"] == [11.0, 19.0]
    assert r["pp"] == [12.0, 18.0, 14.0, 18.0, 14.0, 16.0, 12.0, 16.0]
    assert r["env"] == [10.0, 14.0, 18.0, 14.0, 18.0, 20.0, 10.0, 20.0]
    assert r["ch"][:4] == [10.0, 20.0, 18.0, 20.0]
    assert (r["p3"]["cx"], r["p3"]["cy"], r["p3"]["v"]) == (3, 1, 6.0)
    assert r["va"] == 27.0                     # arr[2, 1, 0]
    assert r["ss"]["cnt"] == 12 and r["ss"]["sum"] == 198.0
    assert abs(r["ss"]["stddev"] - 3 * np.arange(12).std()) < 1e-9
    assert r["bnd_f"] is False                 # band has non-nodata pixels
    assert r["ri"] and r["rc"] and r["rw"] and not r["rc_out"]


def test_sql_rs_constructor_editor_io_tier(reg):
    """Constructor/band-editor/IO sugar over the codec primitives:
    RS_MakeEmptyRaster zero-fill, RS_MakeRaster uint8 clip + georef copy,
    RS_SetValue(s) 1-based window burn, band append/copy/select, matrix
    formatting, and the ESRI ASCII grid emit->parse round trip with the
    lower-left -> upper-left anchor flip."""
    spark = reg
    r = spark.sql("""
with e as (select RS_MakeEmptyRaster(2, 4, 3, 10e0, 20e0, 2e0) as r),
x as (select r,
             RS_SetValues(r, 1, 2, 1, 2, 3, 9e0) as rs,
             RS_MakeRaster(r, transform(sequence(0, 11),
                 i -> cast(i * 30 as double))) as rm
      from e)
select aggregate(RS_BandAsArray(r.buf, 0), 0, (a, v) -> a + v) empty_sum,
       r.bands nb,
       aggregate(RS_BandAsArray(rs.buf, 1), 0, (a, v) -> a + v) set_sum,
       aggregate(RS_BandAsArray(rm.buf, 0), 0, (a, v) -> a + v) mk_sum,
       rm.bands mk_nb,
       RS_AsArcGrid(rm, 0) arc,
       RS_AsMatrix(RS_MakeRaster(RS_MakeEmptyRaster(1, 2, 2, 0e0, 0e0,
           1e0), array(1e0, 2e0, 3e0, 4e0)), 0) mat,
       RS_FromArcInfoAsciiGrid(RS_AsArcGrid(rm, 0)).uly rt_uly,
       aggregate(RS_BandAsArray(
           RS_FromArcInfoAsciiGrid(RS_AsArcGrid(rm, 0)).buf, 0), 0,
           (a, v) -> a + v) rt_sum,
       RS_AddBandFromArray(r, RS_Array(12, 7e0)).bands ab_nb,
       aggregate(RS_BandAsArray(
           RS_AddBandFromArray(r, RS_Array(12, 7e0)).buf, 2), 0,
           (a, v) -> a + v) ab_sum,
       aggregate(RS_BandAsArray(RS_Band(
           RS_AddBandFromArray(r, RS_Array(12, 7e0)).buf, array(2)), 0),
           0, (a, v) -> a + v) selb_sum,
       RS_AddBand(r, rm, 0).bands adb_nb,
       RS_BandPixelType(r, 0) bpt
from x
""").collect()[0]
    assert r["empty_sum"] == 0 and r["nb"] == 2
    assert r["set_sum"] == 9 * 6          # 2x3 burn window on band 1
    # values 0,30,...,330 clipped at 255: sum(0..240 step 30) + 255*3
    assert r["mk_sum"] == sum(min(i * 30, 255) for i in range(12))
    assert r["mk_nb"] == 1
    assert r["arc"].startswith(
        "ncols 4\nnrows 3\nxllcorner 10\nyllcorner 14\ncellsize 2\n"
        "NODATA_value -9999\n")
    assert r["mat"] == "| 1  2 |\n| 3  4 |\n"
    assert r["rt_uly"] == 20.0            # yll + nrows*cellsize
    assert r["rt_sum"] == r["mk_sum"]     # lossless text round trip
    assert r["ab_nb"] == 3 and r["ab_sum"] == 7 * 12
    assert r["selb_sum"] == 7 * 12        # RS_Band selected the new band
    assert r["adb_nb"] == 3
    assert r["bpt"] == "UNSIGNED_8BITS"


def test_sql_st_straggler_tier(reg):
    """Catalog-tail stragglers: orientation predicates with the
    exterior-CW + interiors-CCW split, LineFromMultiPoint, MySQL WKB
    (4-byte LE SRID prefix), trajectory/measure functions, and the
    table-driven general ST_TransformEpsg."""
    spark = reg
    r = spark.sql("""
select GeometryType(array(array(0e0,0e0,4e0,0e0,4e0,3e0,0e0,3e0))) gt,
       ST_IsPolygonCCW(array(array(0e0,0e0,4e0,0e0,4e0,3e0,0e0,3e0))) ccw,
       ST_IsPolygonCW(array(array(0e0,0e0,0e0,3e0,4e0,3e0,4e0,0e0),
                            array(1e0,1e0,2e0,1e0,2e0,2e0,1e0,2e0))) cw_h,
       ST_LineFromMultiPoint(array(array(1e0,2e0), array(3e0,4e0))) lmp,
       ST_IsValidTrajectory(array(1e0,2e0,3e0)) vt,
       ST_IsValidTrajectory(array(1e0,1e0,3e0)) vt_f,
       ST_InterpolatePoint(array(0e0,0e0,10e0,0e0,10e0,10e0),
                           array(0e0,5e0,9e0), 4e0, 1e0) ip,
       ST_InterpolatePoint(array(0e0,0e0,10e0,0e0,10e0,10e0),
                           array(0e0,5e0,9e0), 11e0, 5e0) ip2,
       round(ST_TransformEpsg(2e0, 48e0, 3857).x, 2) tx,
       round(ST_TransformEpsg(7e0, 12e0, 99999).x, 6) fall,
       size(ST_GeomFromMySQL(concat(unhex('E6100000'),
           ST_AsBinary(array(array(0e0,0e0,4e0,0e0,4e0,3e0,0e0,3e0))))))
           nrings,
       ST_Area(element_at(ST_GeomFromMySQL(concat(unhex('E6100000'),
           ST_AsBinary(array(array(0e0,0e0,4e0,0e0,4e0,3e0,0e0,3e0))))),
           1)) my_area
""").collect()[0]
    assert r["gt"] == "POLYGON"
    assert r["ccw"] is True
    assert r["cw_h"] is True      # CW shell + CCW hole
    assert r["lmp"] == [1.0, 2.0, 3.0, 4.0]
    assert r["vt"] is True and r["vt_f"] is False
    assert r["ip"] == 2.0         # closest (4,0), t=0.4 on m 0->5
    assert r["ip2"] == 7.0        # closest (10,5), t=0.5 on m 5->9
    assert abs(r["tx"] - 222638.98) < 0.01
    assert r["fall"] == 7.0       # unknown code -> identity
    assert r["nrings"] == 1 and r["my_area"] == 12.0


def test_sql_address_functions(reg):
    """Rule-based ParseAddress/ExpandAddress (deterministic
    '#-street, city, ST zip' subset of the reference's libpostal
    binding)."""
    spark = reg
    r = spark.sql(
        "select ParseAddress('123 Main St, Springfield, IL 62704') p, "
        "ExpandAddress('9 Oak Ave, Denver, CO 80014') e"
    ).collect()[0]
    p = r["p"]
    assert (p["house_number"], p["road"], p["city"], p["state"],
            p["postcode"]) == (
        "123", "Main St", "Springfield", "IL", "62704")
    assert "9 oak avenue, denver, co 80014" in r["e"]


def test_sql_png_reproject_test_raster(reg):
    """RS_AsPNG emits genuine PNG bytes (signature + IHDR dims) that
    RS_FromPNG round-trips; RS_MakeRasterForTesting fills k + y*w + x;
    RS_ReprojectMatch nearest-neighbor-resamples onto the reference
    grid and carries its georeference."""
    spark = reg
    r = spark.sql("""
with e as (select RS_MakeRasterForTesting(2, 4, 3, 10e0, 20e0,
                      1e0, -1e0, 0e0, 0e0, 4326) as t),
x as (select t, RS_AsPNG(t) as png,
             RS_ReprojectMatch(t,
                 RS_SetGeoReference(
                     RS_MakeEmptyRaster(1, 2, 1, 0e0, 0e0, 1e0),
                     10e0, 20e0, 2e0, -2e0, 0e0, 0e0)) as rp
      from e)
select hex(substring(png, 1, 8)) as magic,
       hex(substring(png, 17, 4)) as pw,
       hex(substring(png, 21, 4)) as ph,
       RS_FromPNG(png).bands as nb,
       aggregate(RS_BandAsArray(RS_FromPNG(png).buf, 0), 0,
                 (a, v) -> a + v) as s0,
       aggregate(RS_BandAsArray(t.buf, 1), 0, (a, v) -> a + v) as s1,
       rp.w as rp_w, round(rp.sx, 6) as rp_sx, rp.srid as rp_srid,
       RS_BandAsArray(rp.buf, 0) as rp_vals
from x
""").collect()[0]
    assert r["magic"] == "89504E470D0A1A0A"
    assert r["pw"] == "00000004" and r["ph"] == "00000003"
    assert r["nb"] == 2
    assert r["s0"] == sum(range(12))          # band 0: y*w + x
    assert r["s1"] == sum(range(12)) + 12     # band 1: +1 per pixel
    assert (r["rp_w"], r["rp_sx"], r["rp_srid"]) == (2, 2.0, 0)
    # srid follows the REFERENCE grid (r2), which was never SetSRID
    # target pixel centers land on source pixels (1,1) and (3,1)
    assert r["rp_vals"] == [5, 7]


def test_sql_catalog_final_batch(reg):
    """RS_NormalizeAll / RS_Union / RS_Values / RS_SetPixelType /
    RS_Clip, ST_GeoHashNeighbors (pandas twin == Column k-ring),
    ST_Transform string spelling, ST_SubDivideExplode alias."""
    from pyspark.sql import functions as F2

    from sedona_spark.functions.geohash import st_geohash_neighbors

    spark = reg
    r = spark.sql("""
with e as (select RS_MakeRasterForTesting(1, 4, 4, 10e0, 20e0,
                      1e0, -1e0, 0e0, 0e0, 4326) as t)
select RS_BandAsArray(RS_NormalizeAll(t).buf, 0)[15] as nz15,
       RS_Union(t, t).bands as un_nb,
       RS_Values(t, array(10.5e0, 99e0), array(19.5e0, 99e0), 0) as vals,
       RS_SetPixelType(t, 'B').w as spt_w,
       RS_Clip(t, array(11e0,17e0, 13e0,17e0, 13e0,19e0, 11e0,19e0)) cl,
       round(ST_Transform(2e0, 48e0, 'EPSG:3857').x, 2) as tfx,
       size(ST_SubDivideExplode(
           array(0e0,0e0, 4e0,0e0, 4e0,4e0, 0e0,4e0), 2, 2)) as sde
from e
""").collect()[0]
    assert r["nz15"] == 255            # max value -> 255
    assert r["un_nb"] == 2
    assert r["vals"] == [0.0, None]    # in-range pixel, out-of-range NULL
    assert r["spt_w"] == 4
    cl = r["cl"]
    # bbox (11,17)-(13,19) -> 2x2 crop anchored one pixel in
    assert (cl["w"], cl["h"], cl["ulx"], cl["uly"]) == (2, 2, 11.0, 19.0)
    assert abs(r["tfx"] - 222638.98) < 0.01
    assert r["sde"] == 4

    pts = spark.createDataFrame(
        [(0.1, 0.1), (-179.9, 0.0), (10.0, 89.5)], "lon double, lat double"
    )
    both = pts.select(
        F2.expr("ST_GeoHashNeighbors(lon, lat, 4)").alias("a"),
        st_geohash_neighbors(F2.col("lon"), F2.col("lat"), 4).alias("b"),
    ).collect()
    for row in both:
        assert row["a"] == row["b"]    # pandas twin == Column k-ring


def test_sql_raster_scalar_spellings(reg):
    """Scalar RS_Resample / RS_Tile(Explode) / RS_ZonalStats(All) /
    RS_Interpolate over the same kernels as the DataFrame ops."""
    spark = reg
    r = spark.sql("""
with e as (select RS_MakeRasterForTesting(1, 4, 4, 0e0, 0e0,
                      1e0, -1e0, 0e0, 0e0, 0) as t)
select RS_Resample(t, 8, 8) as up,
       aggregate(RS_BandAsArray(RS_Resample(t, 8, 8).buf, 0), 0,
                 (a, v) -> a + v) as up_sum,
       size(RS_TileExplode(t, 2, 2)) as n_tiles,
       RS_TileExplode(t, 3, 3)[3].tx as t3x,
       RS_ZonalStats(t, array(0e0,-4e0, 2e0,-4e0, 2e0,0e0, 0e0,0e0),
                     0, 'sum') as zs_left,
       RS_ZonalStatsAll(t, array(0e0,-4e0, 4e0,-4e0, 4e0,0e0, 0e0,0e0),
                        0) as za,
       aggregate(RS_BandAsArray(
           RS_Interpolate(RS_SetValue(t, 0, 1, 1, 0e0), 0e0, 1).buf, 0),
           0, (a, v) -> a + v) as idw_sum
from e
""").collect()[0]
    assert r["up"]["w"] == 8 and r["up"]["sx"] == 0.5
    assert r["up_sum"] == 4 * sum(range(16))   # x2 nearest upsample
    assert r["n_tiles"] == 4
    assert r["t3x"] == 1                       # row-major 2x2 grid of 3x3
    # left half columns of values y*4+x: sum over x<2
    assert r["zs_left"] == sum(y * 4 + x for y in range(4)
                               for x in range(2))
    assert r["za"]["cnt"] == 16.0 and r["za"]["max"] == 15.0
    assert r["za"]["median"] == 7.5 and r["za"]["mode"] == 15.0
    assert abs(r["za"]["variance"] - r["za"]["stddev"] ** 2) < 1e-9
    # pixel (1-based 1,1) already holds 0 == nodata; IDW fills it
    # from neighbors 1, 4, 5 (weights 1, 1, 1/2) -> 7.5/2.5 = 3
    assert r["idw_sum"] == sum(range(16)) + 3


def test_sql_map_algebra_expressions(reg):
    """Jiffle-subset RS_MapAlgebra scripts: band refs, precedence,
    parentheses, unary minus, min/max/abs/sqrt/pow, bad input raises."""
    import numpy as np

    from sedona_spark.functions.raster import eval_map_algebra

    spark = reg
    r = spark.sql("""
with e as (select RS_MakeRasterForTesting(2, 4, 3, 0e0, 0e0,
                      1e0, -1e0, 0e0, 0e0, 0) as t)
select aggregate(RS_BandAsArray(
           RS_MapAlgebra(t, 'out = rast[0] * 0.5 + rast[1] / 2;').buf,
           0), 0, (a, v) -> a + v) as s,
       RS_MapAlgebra(t, 'out = max(rast[0], 5);').buf as mx,
       RS_MapAlgebra(t, 'rast[1] - 1').bands as nb
from e
""").collect()[0]
    # band0 = p, band1 = p+1 -> floor(p + 0.5) = p
    assert r["s"] == sum(range(12))
    assert r["nb"] == 1

    b = np.array([[4.0, 9.0]])
    assert eval_map_algebra("sqrt(rast[0]) * -1", [b]).tolist() == \
        [[-2.0, -3.0]]
    assert eval_map_algebra("pow(rast[0], 0.5) + (1 + 1) * 2",
                            [b])[0][0] == 6.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eval_map_algebra("out = rast[0] @ 2;", [b])
    with _pytest.raises(ValueError):
        eval_map_algebra("frobnicate(rast[0])", [b])


def test_sql_transform_epsg_utm_and_laea(reg):
    """The general EPSG dispatch covers every WGS84 UTM zone through two
    runtime-meridian arms, the national TM grids, and the LAEA family;
    SQL results equal the Column-API path."""
    from pyspark.sql import functions as F2

    from sedona_spark.functions.crs import st_transform_epsg

    spark = reg
    r = spark.sql(
        "select round(ST_TransformEpsg(2.2945e0, 48.8584e0, 32631).x, 1) e,"
        " round(ST_TransformEpsg(-58.3816e0, -34.6037e0, 32721).y, 1) sn,"
        " round(ST_TransformEpsg(10e0, 52e0, 3035).x, 6) c0,"
        " round(ST_TransformEpsg(-0.1276e0, 51.5072e0, 27700).x, 1) os"
    ).collect()[0]
    assert abs(r["e"] - 448252.0) < 0.2          # UTM 31N easting, Paris
    assert 6_000_000 < r["sn"] < 7_000_000       # south false northing
    assert r["c0"] == 4321000.0                  # ETRS89-LAEA false easting
    assert 500_000 < r["os"] < 560_000           # OSGB easting, London

    for code, lon, lat in [(32631, 2.2945, 48.8584), (3035, 15.0, 52.0),
                           (32721, -58.38, -34.6), (27700, -0.13, 51.5)]:
        x, y = st_transform_epsg(F2.lit(lon), F2.lit(lat), code)
        col = spark.range(1).select(
            F2.round(x, 3).alias("x"), F2.round(y, 3).alias("y")
        ).collect()[0]
        sql = spark.sql(
            f"select round(ST_TransformEpsg({lon}e0, {lat}e0, {code}).x, 3)"
            f" x, round(ST_TransformEpsg({lon}e0, {lat}e0, {code}).y, 3) y"
        ).collect()[0]
        assert (col["x"], col["y"]) == (sql["x"], sql["y"])


def test_sql_image_pipeline_spellings(reg):
    """RS_ImageStatus / RS_Exif / RS_ImageQuality address the same
    Arrow-batched UDFs as the DataFrame API."""
    spark = reg
    from sedona_spark.pipeline.integrity import corrupt_by_id
    from sedona_spark.pipeline.quality import quality_signals
    from sedona_spark.sources.exif import (
        build_exif_app1, geotag_e7, inject_app1)
    from sedona_spark.sources.images import _caption, make_pixels
    from sedona_spark.sources.jpeg import encode_jpeg

    rows = []
    for i in (3, 4, 10):  # i%5: 3 -> truncated, 4 -> bad_marker, 0 -> ok
        jpg = encode_jpeg(make_pixels(i, 16, 16), quality=90)
        lat_e7, lon_e7 = geotag_e7(i)
        tagged = inject_app1(jpg, build_exif_app1(lat_e7, lon_e7, _caption(i)))
        damaged, want = corrupt_by_id(tagged, i)
        rows.append((i, damaged, want))
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in rows], "i long, bytes binary")
    df.createOrReplaceTempView("t_imgsql")

    got = {r["i"]: r for r in spark.sql(
        "select i, RS_ImageStatus(bytes) as st, RS_Exif(bytes) as e "
        "from t_imgsql").collect()}
    for i, _b, want in rows:
        assert got[i]["st"] == want
    lat_e7, lon_e7 = geotag_e7(10)
    assert got[10]["e"]["exif_lat"] == lat_e7 / 1e7
    assert got[10]["e"]["description"] == _caption(10)

    # quality over the deterministic lossless codec
    from sedona_spark.sources.images import encode_image
    q = spark.createDataFrame(
        [(7, encode_image(make_pixels(7, 16, 16), "fpng"))],
        "i long, bytes binary")
    q.createOrReplaceTempView("t_imgsql_q")
    r = spark.sql(
        "select RS_ImageQuality(bytes) as q from t_imgsql_q").first()["q"]
    want = quality_signals(make_pixels(7, 16, 16))
    assert (r["n_px"], r["sum_lum"], r["lap_sum"], r["lap_sumsq"],
            r["n_clip_lo"], r["n_clip_hi"]) == want


def test_sql_gif_bmp_codecs(reg):
    """RS_From/As GIF and BMP round-trip through SQL: pixel-exact for
    the <=256-color GIF path and always for BMP."""
    spark = reg
    import numpy as np

    from sedona_spark.sources.bmp import decode_bmp, encode_bmp
    from sedona_spark.sources.gif import encode_gif, gif_indices, gif_palette
    from sedona_spark.sources.images import decode_image

    pal = gif_palette()
    gif = encode_gif(gif_indices(4), pal)
    arr = pal[gif_indices(4)]
    bmp = encode_bmp(arr)
    df = spark.createDataFrame([(gif, bmp)], "g binary, b binary")
    df.createOrReplaceTempView("t_gifbmp")
    r = spark.sql(
        "select RS_FromGIF(g) as rg, RS_FromBMP(b) as rb, "
        "RS_AsBMP(RS_FromGIF(g)) as as_bmp, "
        "RS_AsGIF(RS_FromBMP(b)) as as_gif from t_gifbmp").first()
    assert (r["rg"]["w"], r["rg"]["h"], r["rg"]["bands"]) == (24, 18, 3)
    assert (r["rb"]["w"], r["rb"]["h"]) == (24, 18)
    a1, _ = decode_image(bytes(r["rg"]["buf"]))
    a2, _ = decode_image(bytes(r["rb"]["buf"]))
    assert (a1 == arr).all() and (a2 == arr).all()
    assert (decode_bmp(bytes(r["as_bmp"])) == arr).all()
    a3, _ = decode_image(bytes(spark.sql(
        "select RS_FromGIF(RS_AsGIF(RS_FromBMP(b))).buf as v "
        "from t_gifbmp").first()["v"]))
    assert (a3 == arr).all()

    # BMP round trip incl. stride padding (w=33 -> stride 100) and 32bpp
    import struct as _s
    odd = np.arange(33 * 5 * 3, dtype=np.uint8).reshape(5, 33, 3) % 251
    assert (decode_bmp(encode_bmp(odd)) == odd).all()
