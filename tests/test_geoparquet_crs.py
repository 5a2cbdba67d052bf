"""Spatially-pruned storage (GeoParquet-bbox analog) and CRS transform."""

import math

import numpy as np

import pytest
from pyspark.sql import functions as F

from sedona_spark.sources.geoparquet import read_spatial_range, write_spatial
from sedona_spark.sources.testdata import points_from_events

SF = "/root/testdata/sf0.001"


def test_write_read_spatial_prunes(spark, tmp_path):
    path = str(tmp_path / "geo")
    pts = points_from_events(spark, "/root/testdata/sf0.001")
    write_spatial(pts, path, level=3)

    bbox = (-30.0, -20.0, 10.0, 25.0)
    got = read_spatial_range(spark, path, bbox, level=3)
    brute = pts.filter(
        (F.col("x") >= bbox[0]) & (F.col("x") <= bbox[2])
        & (F.col("y") >= bbox[1]) & (F.col("y") <= bbox[3])
    )
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in brute.collect()
    )

    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition pruning (file-bbox analog) reaches the scan...
    assert "PartitionFilters: [" in plan and "part_cell" in plan
    # ...and the residual coordinate range pushes to parquet row groups
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(x" in plan


def test_crs_transform_roundtrip_and_check(spark):
    from sedona_spark.functions.crs import (
        require_same_crs,
        st_transform_from_mercator,
        st_transform_to_mercator,
        tag_crs,
    )

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 13.4, 52.5), (3, -179.9, -85.0), (4, 100.0, 84.9)],
        "id int, lon double, lat double",
    )
    mx, my = st_transform_to_mercator(F.col("lon"), F.col("lat"))
    m = df.select("id", "lon", "lat", mx.alias("x"), my.alias("y"))
    lon2, lat2 = st_transform_from_mercator(F.col("x"), F.col("y"))
    back = m.select("id", "lon", "lat", lon2.alias("lon2"), lat2.alias("lat2"))
    for r in back.collect():
        assert r.lon2 == pytest.approx(r.lon, abs=1e-9)
        assert r.lat2 == pytest.approx(r.lat, abs=1e-9)
    # known vector: Berlin (13.4, 52.5) → x ≈ 1491681.3, y ≈ 6887893.5
    b = {r.id: r for r in m.collect()}
    assert b[2].x == pytest.approx(13.4 * math.pi / 180 * 6378137.0)
    assert b[2].y == pytest.approx(6886418.0, rel=1e-3)

    a = tag_crs(df, "EPSG:4326", ("lon", "lat"))
    c = tag_crs(m, "EPSG:3857", ("x", "y"))
    require_same_crs(a, "lon", a, "lon")  # same → ok
    with pytest.raises(ValueError, match="CRS mismatch"):
        require_same_crs(a, "lon", c, "x")


def test_geoarrow_roundtrip(spark):
    """GeoArrow interchange (reference geoarrow.py:39-104): the exported
    pyarrow Table tags the WKB column with the geoarrow.wkb extension
    name + CRS, and the bytes round-trip exactly."""
    import json

    from pyspark.sql import functions as F

    from sedona_spark.functions.st import st_point_wkb
    from sedona_spark.sources.geoarrow import from_geoarrow_table, to_geoarrow_table
    from sedona_spark.sources.testdata import points_from_events

    pts = points_from_events(spark, SF).limit(50)
    gdf = pts.select(
        "event_id", st_point_wkb(F.col("x"), F.col("y")).alias("geometry")
    )
    tbl = to_geoarrow_table(gdf, crs="EPSG:4326")
    meta = tbl.schema.field("geometry").metadata
    assert meta[b"ARROW:extension:name"] == b"geoarrow.wkb"
    assert json.loads(meta[b"ARROW:extension:metadata"])["crs"] == "EPSG:4326"
    back = from_geoarrow_table(spark, tbl)
    a = {r["event_id"]: bytes(r["geometry"]) for r in gdf.collect()}
    b = {r["event_id"]: bytes(r["geometry"]) for r in back.collect()}
    assert a == b


def test_azimuthal_projections(spark):
    """LAEA/AEQD closed forms: the center maps to (0,0); AEQD's defining
    property holds — hypot(x, y) equals the great-circle distance from
    the projection center (same sphere radius)."""
    from sedona_spark.functions.crs import st_transform_aeqd, st_transform_laea
    from sedona_spark.functions.st_measures import st_distance_sphere

    pts = points_from_events(spark, SF).limit(200)
    ax, ay = st_transform_aeqd(F.col("x"), F.col("y"), 10.0, 45.0)
    lx, ly = st_transform_laea(F.col("x"), F.col("y"), 10.0, 45.0)
    d = st_distance_sphere(F.col("x"), F.col("y"), F.lit(10.0), F.lit(45.0))
    rows = pts.select(
        F.sqrt(ax * ax + ay * ay).alias("r_aeqd"),
        d.alias("d_gc"),
        lx.alias("lx"), ly.alias("ly"),
    ).collect()
    for r in rows:
        assert abs(r["r_aeqd"] - r["d_gc"]) < 1e-3 * max(1.0, r["d_gc"])
    center = spark.range(1).select(
        *st_transform_laea(F.lit(10.0), F.lit(45.0), 10.0, 45.0),
        *st_transform_aeqd(F.lit(10.0), F.lit(45.0), 10.0, 45.0),
    ).collect()[0]
    assert all(abs(v) < 1e-6 for v in center)


def test_geojson_ndjson_roundtrip(spark, tmp_path):
    """GeoJSON interop (reference GeoJSONFileFormat.scala seam): write
    ring-list geometries as newline-delimited Features, read back, and
    recover identical net areas + properties; FeatureCollection reader
    explodes the single-value form too."""
    import json

    from sedona_spark.functions.st import st_geom_rings_from_wkt, st_rings_stats
    from sedona_spark.sources.geojson import (
        read_geojson,
        read_geojson_collection,
        write_geojson,
    )

    wkts = [
        ("a", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
        ("b", "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 12 0, 12 2, 10 2, 10 0)))"),
        ("c", "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),
    ]
    df = spark.createDataFrame(wkts, "name string, wkt string").select(
        "name", st_geom_rings_from_wkt(F.col("wkt")).alias("geom"),
        F.format_string('{"name": "%s"}', F.col("name")).alias("props"),
    )
    want = {
        r["name"]: round(r["s"]["area"], 9)
        for r in df.select(
            "name", st_rings_stats(F.col("geom")).alias("s")
        ).collect()
    }
    path = str(tmp_path / "gj")
    write_geojson(df, path, geom_col="geom", properties_col="props")
    back = read_geojson(spark, path)
    got = {
        json.loads(r["properties"])["name"]: round(r["s"]["area"], 9)
        for r in back.select(
            "properties", st_rings_stats(F.col("geom")).alias("s")
        ).collect()
    }
    assert got == want
    kinds = {json.loads(r["properties"])["name"]: r["kind"]
             for r in back.collect()}
    assert kinds == {"a": "polygon", "b": "multipolygon", "c": "polygon"}

    # FeatureCollection form
    feats = [json.loads(l["value"]) for l in
             spark.read.text(path).collect() if l["value"]]
    coll = {"type": "FeatureCollection", "features": feats}
    cpath = tmp_path / "coll.geojson"
    cpath.write_text(json.dumps(coll))
    back2 = read_geojson_collection(spark, str(cpath))
    got2 = {
        json.loads(r["properties"])["name"]: round(r["s"]["area"], 9)
        for r in back2.select(
            "properties", st_rings_stats(F.col("geom")).alias("s")
        ).collect()
    }
    assert got2 == want


def test_shapefile_roundtrip(spark, tmp_path):
    """Shapefile source/sink (reference ShapefileDataSource.scala): write
    polygon-with-hole + multipolygon ring lists as .shp/.shx (ESRI
    winding), read back via the .shx-driven distributed parser, and
    recover identical canonical ring lists (areas, holes, kinds)."""
    from sedona_spark.functions.st import st_geom_rings_from_wkt, st_rings_stats
    from sedona_spark.sources.shapefile import read_shapefile, write_shapefile

    wkts = [
        (0, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
        (1, "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 12 0, 12 2, 10 2, 10 0)))"),
        (2, "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),
    ]
    df = spark.createDataFrame(wkts, "id long, wkt string").orderBy("id").select(
        st_geom_rings_from_wkt(F.col("wkt")).alias("geom")
    )
    want = [
        (round(r["s"]["area"], 9), r["s"]["n_rings"], r["s"]["n_holes"])
        for r in df.select(st_rings_stats(F.col("geom")).alias("s")).collect()
    ]
    base = str(tmp_path / "layer")
    n = write_shapefile(df, base, kind="polygon")
    assert n == 3
    back = read_shapefile(spark, base).orderBy("rec_id")
    rows = back.select(
        "rec_id", "kind", st_rings_stats(F.col("geom")).alias("s")
    ).collect()
    got = [(round(r["s"]["area"], 9), r["s"]["n_rings"], r["s"]["n_holes"])
           for r in rows]
    assert got == want
    assert all(r["kind"] == "polygon" for r in rows)

    # point layer
    pts = spark.createDataFrame(
        [([np.array([1.5, 2.5]).tolist()],), ([np.array([-3.0, 4.0]).tolist()],)],
        "geom array<array<double>>",
    )
    base2 = str(tmp_path / "pts")
    assert write_shapefile(pts, base2, kind="point") == 2
    got_pts = sorted(
        tuple(r["geom"][0]) for r in read_shapefile(spark, base2).collect()
    )
    assert got_pts == [(-3.0, 4.0), (1.5, 2.5)]
