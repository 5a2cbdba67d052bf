#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py is FROZEN — this file
carries the extra instrumentation the optimization loop needs):

* per-query isolated timing with the same session confs / Arrow batch
  sizing as bench.py (warm run discarded, min of timed runs reported);
* optional noop-sink timing (guide §1.4) so the computation is timed
  eagerly for every column without sink effects;
* optional ``.explain("formatted")`` capture to plans/r07/<q>_<tag>.txt.

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--noop] [--plans TAG] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# keep in sync with bench.py (frozen there; mirrored here for parity)
BYTE_HEAVY = {
    "rs_value", "rs_map_algebra", "rs_clip_stats", "image_decode",
    "tile_bytes", "tile_assign", "rs_pixel_points", "rs_as_raster",
    "rs_zonal_stats", "rs_resample", "rs_interpolate", "rs_pyramid",
    "image_tensorize", "image_patchify", "image_channel_stats",
    "channel_histogram",
    "webdataset_manifest", "aspect_bucket_batches",
    "image_downsample", "image_augment", "image_text_align",
    "exif_geotags", "image_validate", "image_quality", "gif_decode",
    "audio_features", "audio_wide_decode", "audio_resample",
    "audio_resample_linear", "audio_chunks",
    "audio_silence", "audio_spectral",
    "video_meta", "video_frame_stats", "video_scene_cuts",
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 2
    use_noop = False
    plans_tag = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        elif a == "--plans":
            plans_tag = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    import __spark_entry__ as entrymod
    from sedona_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench_extra", cpus=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    out = {}
    for name in names:
        fn = qs[name]
        spark.conf.set(batch_key, "64" if name in BYTE_HEAVY else "10000")
        if plans_tag:
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(
                    REPO, "plans", "r07", f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            d = fn(spark, sf_dir)
            if use_noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.count()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls[1:]), "walls": walls}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
