#!/usr/bin/env python
"""Mimic the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB at the given sf dir; compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, canonicalize values, sort
    rows, md5."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted(
        ",".join(canon(v) for v in rec) for rec in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as em
    from sedona_spark.session import get_spark

    spark = get_spark("driver_check", cpus=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = em.queries()
    oracles = em.oracle_sql()

    print("== entry() smoke ==")
    edf = em.entry(spark)
    erows = edf.limit(5).collect()
    print(f"entry ok: schema={[f.name for f in edf.schema.fields]} sample={len(erows)}")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok_cnt = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = value_hash(sdf) == value_hash(odf) if ok_cnt and ok_cols else False
        if ok_cnt and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}, "
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}, "
                f"hash_match={ok_hash}"
            )
            if ok_cols and not ok_hash:
                merged = _diff(sdf, odf)
                print(merged)
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


def _diff(sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    """Dump the first differing rows using the SAME %.10g canonicalization
    the hash uses, so boundary-sitting float flips are visible verbatim."""
    cols = sorted(sdf.columns)

    def canon_rows(df):
        def canon(v):
            if isinstance(v, float):
                return f"{v:.10g}"
            return str(v)
        return set(
            tuple(canon(v) for v in rec)
            for rec in df[cols].itertuples(index=False)
        )

    a, b = canon_rows(sdf), canon_rows(odf)
    lines = []
    for t in sorted(a - b)[:5]:
        lines.append(f"  spark-only: {dict(zip(cols, t))}")
    for t in sorted(b - a)[:5]:
        lines.append(f"  oracle-only: {dict(zip(cols, t))}")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
