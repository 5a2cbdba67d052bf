#!/usr/bin/env python
"""spark-submit entry point for the checkpointed image pipeline.

Usage (multi-executor cluster; local[] here stands in for it):

    bash tools/run_spark_submit.sh [n_images] [out_root]

which effectively runs:

    spark-submit --py-files sedona_spark.zip tools/submit_job.py \
        --images <path|synth:N> --out <root> --sf-dir <testdata sf dir>

The script only uses SparkSession.getOrCreate() + the sedona_spark package
from --py-files — no driver-local imports beyond the shipped zip — so the
same invocation works with ``--master yarn/k8s`` on a real cluster.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="parquet path or synth:N")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--level", type=int, default=8)
    ap.add_argument("--publish-table", default=None,
                    help="icetable path to publish the zonal result to")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("sedona_spark_pipeline").getOrCreate()

    from sedona_spark.pipeline_job import run_image_pipeline
    from sedona_spark.sources.images import synthesize_images
    from sedona_spark.sources.testdata import rect_zones_from_nation

    if args.images.startswith("synth:"):
        n = int(args.images.split(":", 1)[1])
        path = f"{args.out}/_images"
        synthesize_images(spark, n, partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    else:
        path = args.images

    zones = rect_zones_from_nation(spark, args.sf_dir).drop("ring")
    # rescale testdata-lattice zones onto the image geotag domain [0,100)
    zones = zones.select(
        "n_nationkey",
        ((F.col("xmin") + 180.0) / 3.6).alias("xmin"),
        ((F.col("ymin") + 90.0) / 1.8).alias("ymin"),
        ((F.col("xmax") + 180.0) / 3.6).alias("xmax"),
        ((F.col("ymax") + 90.0) / 1.8).alias("ymax"),
    )
    manifests = run_image_pipeline(
        spark, path, zones, args.out, tile=args.tile, level=args.level,
        publish_table=args.publish_table,
    )
    out = {}
    for s, m in manifests.items():
        if "partitions" in m:
            out[s] = {"rows": sum(p["rows"] for p in m["partitions"].values())}
        else:  # the publish step reports its snapshot, not buckets
            out[s] = m
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
