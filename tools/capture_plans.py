#!/usr/bin/env python
"""Capture .explain("formatted") for a list of queries into plans/<dir>/.

Usage: python tools/capture_plans.py <repo_root> <out_dir> <tag> <q1> <q2> ...
Driver-only (no jobs run); used for the optimization round's before/after
plan evidence.
"""
import os
import sys

root = sys.argv[1]
out_dir = sys.argv[2]
tag = sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

os.makedirs(out_dir, exist_ok=True)

from sedona_spark.session import get_spark  # noqa: E402

import __spark_entry__ as em  # noqa: E402

spark = get_spark("plan_capture", cpus=8, shuffle_partitions=32,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "8m"})
qs = em.queries()
sf = "/root/testdata/sf0.1"
for name in names:
    try:
        df = qs[name](spark, sf)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:  # a query whose build runs jobs may still work
        txt = f"EXPLAIN FAILED: {e}"
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(txt)
    print("captured", name, flush=True)
spark.stop()
