#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: runs the north-rule throughput job (spatial join +
tile assignment, images/sec) at two parallelism levels (local[8] vs
local[32] standing in for N vs 4N executors — see BASELINE.md) in separate
JVMs and writes BENCH/BASELINE.md with the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", "200000"))

# headline query subset (each must terminate in seconds at sf0.1)
BENCH_QUERIES = [
    "range_query",
    "pip_rect_join",
    "pip_poly_join",
    "distance_join",
    "knn_join",
    "overlap_join",
    "cell_counts",
    "envelope_aggr",
    "tile_assign",
    "dedup_exact",
    "text_stats",
    "lang_id",
    "fingerprint",
    "jaccard_adjacent",
    "ann_topk",
    "minhash_pairs",
    "simhash_pairs",
]


def _throughput_job(spark, sf_dir: str, n_images: int) -> int:
    """North-rule job: n synthetic image rows (metadata; bytes live in the
    separate rs_tile path) → PIP join to zones → tile assignment → count.
    Returns number of images processed."""
    from pyspark.sql import functions as F

    from sedona_spark.operators import pip_join_rect
    from sedona_spark.operators.tile import tile_assign
    from sedona_spark.sources.testdata import rect_zones_from_nation

    imgs = spark.range(n_images).select(
        F.col("id").alias("image_id"),
        (F.lit(32) + (F.col("id") % 3) * 16).cast("int").alias("w"),
        (F.lit(32) + (F.col("id") % 5) * 16).cast("int").alias("h"),
        (((F.col("id") * 2654435761) % 3600000 + 0.5) / 10000.0 - 180.0).alias("lon"),
        (((F.col("id") * 2246822519) % 1800000 + 0.5) / 10000.0 - 90.0).alias("lat"),
    )
    zones = rect_zones_from_nation(spark, sf_dir).drop("ring")
    joined = pip_join_rect(
        imgs.withColumnsRenamed({"lon": "x", "lat": "y"}), zones, "covers", level=6
    )
    tiles = tile_assign(
        joined.withColumnsRenamed({"x": "lon", "y": "lat"}), 16, 16, level=10
    )
    tiles.groupBy("n_nationkey").agg(F.count(F.lit(1))).collect()
    return n_images


def run_queries(cpus: int, sf_dir: str) -> dict:
    from sedona_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus, 8))
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + python workers once
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    t0 = time.time()
    n_imgs = _throughput_job(spark, sf_dir, N_IMAGES)
    tput_wall = time.time() - t0
    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "throughput_images_per_sec": round(n_imgs / tput_wall, 1),
        "throughput_job_sec": round(tput_wall, 3),
        "n_images": n_imgs,
        "cpus": cpus,
    }


def run_scaling(sf_dir: str) -> None:
    """Run the throughput job at local[8] and local[32] in fresh JVMs and
    write BENCH/BASELINE.md (north rule: efficiency ≥ 0.8 from N to 4N)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        out = subprocess.run(
            [sys.executable, __file__, "--throughput-only"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8 = results[8]["throughput_images_per_sec"]
    t32 = results[32]["throughput_images_per_sec"]
    eff = t32 / (4.0 * t8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — scaling evidence (north rule)\n\n"
            "Same spatial-join + tile-assignment job, same input "
            f"({results[8]['n_images']} images, zones from {sf_dir}), two\n"
            "parallelism levels standing in for N vs 4N executors "
            "(no real cluster in this sandbox).\n\n"
            "| config | images/sec | wall sec |\n|---|---|---|\n"
            f"| local[8] (N) | {t8} | {results[8]['throughput_job_sec']} |\n"
            f"| local[32] (4N) | {t32} | {results[32]['throughput_job_sec']} |\n\n"
            f"**Scaling efficiency = throughput(32) / (4 × throughput(8)) = "
            f"{eff:.3f}** (target ≥ 0.8)\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "images_per_sec": {"local8": t8, "local32": t32}}))


def main() -> None:
    if "--scaling" in sys.argv:
        run_scaling(SF_DIR)
        return
    if "--throughput-only" in sys.argv:
        from sedona_spark.session import get_spark

        spark = get_spark("bench_tput", cpus=CPUS, shuffle_partitions=max(CPUS, 8))
        spark.range(1000).selectExpr("sum(id)").collect()  # warmup
        t0 = time.time()
        n = _throughput_job(spark, SF_DIR, N_IMAGES)
        wall = time.time() - t0
        spark.stop()
        print(json.dumps({
            "throughput_images_per_sec": round(n / wall, 1),
            "throughput_job_sec": round(wall, 3),
            "n_images": n,
            "cpus": CPUS,
        }))
        return
    print(json.dumps(run_queries(CPUS, SF_DIR)))


if __name__ == "__main__":
    main()
