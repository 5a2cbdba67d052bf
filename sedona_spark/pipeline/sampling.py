"""Deterministic sampling operators for training-data curation.

A 100 TB pipeline cannot re-draw random samples per run — curation
sampling must be a PURE FUNCTION of the row key so that reruns, resumed
checkpoints, and audits all see the same subset (the same reason the
dedup tier hashes instead of sampling). Both operators here key on a
Knuth multiplicative hash of the stable id column, expressed as exact
int64 Column arithmetic (JVM codegen, engine-portable to the DuckDB
oracle verbatim):

* :func:`stratified_sample` — per-stratum keep-fractions (domain/quota
  mixing, e.g. "keep 10% of web, 100% of books"). Zero shuffle: a
  filter the scanner can evaluate, so at scale it composes with
  predicate pushdown and never materializes the rejected rows.
* :func:`sample_per_key` — exactly min(k, n) rows per key, uniformly
  without replacement (per-domain caps, eval-set carving). One shuffle
  on the key (the same partitioning any per-key op needs); the per-key
  top-k is a window over the hash order, so skewed keys cost the same
  as the groupBy the pipeline would run anyway.

Reference frame: the engine's spatial tier ships samplers only inside
its partitioner builders (``RDDSampleUtils.java``); these operators
expose the same hash-based determinism as first-class curation ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative constant (2654435761 = 2^32·φ⁻¹ rounded to odd),
# the same family the synthetic fixtures use; modulus 2^20 gives
# fraction resolution of ~1e-6
_KNUTH = 2654435761
_MOD = 1 << 20


def hash_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 2^20) from a stable integer id —
    exact int64 arithmetic, identical text on Spark and DuckDB. The
    pre-multiply ``pmod 2^31`` keeps the product under int64 (2^31 ·
    2654435761 < 2^63), so snowflake-scale ids neither wrap in Spark
    nor overflow DuckDB's checked multiply; ids below 2^31 hash
    identically to the unreduced form."""
    return F.pmod(
        F.pmod(id_col.cast("long") + F.lit(int(salt)), F.lit(1 << 31))
        * F.lit(_KNUTH),
        F.lit(_MOD),
    )


def sql_hash_bucket(id_expr: str, salt: int = 0) -> str:
    """Oracle twin of :func:`hash_bucket` (``pmod`` spelled portably —
    the operand is non-negative for non-negative ids + salt)."""
    return (f"((((cast({id_expr} as bigint) + {int(salt)}) "
            f"% {1 << 31}) * {_KNUTH}) % {_MOD})")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    fraction. Deterministic (same id + salt → same verdict forever),
    exact int threshold per stratum (floor(frac · 2^20)), zero shuffle —
    the filter is a pure Column over existing columns, so Catalyst
    pushes it to the scan and the rejected ~1−f of 100 TB is never
    shuffled, cached, or returned."""
    bucket = hash_bucket(F.col(id_col), salt)
    thr = F.lit(int(default_fraction * _MOD))
    for val, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == val,
                     F.lit(int(frac * _MOD))).otherwise(thr)
    return df.where(bucket < thr)


def sample_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Exactly min(k, n) rows per key, uniform without replacement:
    rank rows within each key by (hash(id), id) — the id tiebreak makes
    the order TOTAL, so the result is deterministic even if two ids
    collide in the 2^20 bucket space — and keep rank ≤ k. One shuffle
    on ``key_col``; no driver state, no sampling pass."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_sp_rank", F.row_number().over(w))
        .where(F.col("_sp_rank") <= k)
        .drop("_sp_rank")
    )
