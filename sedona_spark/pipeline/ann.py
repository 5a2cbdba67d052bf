"""Similarity search over an embedding column (``array<float>``).

* brute-force cosine top-k — the exact baseline: dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM codegen, no Python), global top-k via
  TakeOrderedAndProject (same shape as the spatial kNN query collapse,
  ``KNNQuery.java:47-79``);
* LSH-bucketed variant — the 100 TB path: random-hyperplane sign buckets
  turn all-pairs scan into an equi-join on an int bucket key (identical
  architecture to the cell-join spatial engine: bucket = cell);
* near-dup pairs — blocked self-join + exact cosine verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector. Scan + codegen'd fold +
    TakeOrderedAndProject: no shuffle at all (each partition keeps k)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, _lit_vec(q)) / (F.sqrt(_norm_sq(v)) * F.lit(qn))
    return (
        embeddings.withColumn("cosine", cos)
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign bucket (int64) — pure Column arithmetic."""
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot(v, _lit_vec(p)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec,
    k: int,
    n_planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: scan only vectors whose sign-bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe LSH).
    At scale the table is written bucketed/partitioned by ``lsh_bucket`` so
    this becomes partition pruning, not a scan."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ q) > 0))
    probe = [qbits]
    if probe_hamming >= 1:
        probe += [qbits ^ (1 << i) for i in range(n_planes)]
    b = lsh_bucket(F.col(vec_col), planes)
    pruned = embeddings.withColumn("bucket", b).filter(F.col("bucket").isin(probe))
    return cosine_topk_bruteforce(pruned, q, k, vec_col, id_col).drop("bucket")


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate (cosine ≥ threshold) pairs via blocked self-join.

    Blocking key = ``block_col`` if given (e.g. a cluster/label column) else
    the LSH sign bucket; exact cosine verifies each candidate. One shuffle
    per side on the block key; AQE splits hot blocks."""
    if block_col is None:
        dim = len(embeddings.select(vec_col).limit(1).collect()[0][0])
        planes = _hyperplanes(dim, n_planes, seed)
        embeddings = embeddings.withColumn("_blk", lsh_bucket(F.col(vec_col), planes))
        key = "_blk"
    else:
        key = block_col
    a = embeddings.select(
        F.col(key).alias("_k"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(key).alias("_k"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    j = a.join(b, "_k").filter(F.col("id_a") < F.col("id_b"))
    va = F.col("_va").cast("array<double>")
    vb = F.col("_vb").cast("array<double>")
    cos = _dot(va, vb) / (F.sqrt(_norm_sq(va)) * F.sqrt(_norm_sq(vb)))
    return (
        j.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def planted_lsh_axes(
    dim: int = 64, n_planes: int = 8, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (u, w) pair for a planted LSH fixture with a PROVABLE
    no-loss guarantee under the seeded hyperplanes:

    * ``u`` solves ``planes @ u = 1`` (minimum-norm via pinv): every
      hyperplane margin of u is EQUAL and positive — u sits centrally in
      its sign bucket;
    * ``w`` is e₁ projected into the null space of ``planes`` (then
      normalized): ``planes @ w ≈ 0`` to machine precision.

    Any vector ``v = cos θ·u/|u| + σ sin θ·w`` (θ < π/2) has
    ``planes @ v = cos θ·(planes@u)/|u| ± sin θ·O(1e-15)`` — the SAME sign
    pattern as u for every plane, hence the same LSH bucket. A fixture
    whose cluster-A members all take this form puts the entire true top-k
    in the query's own bucket, so the bucketed search equals exact
    brute-force and a plain exact-cosine oracle applies (the r4 gap:
    ``ann_lsh_topk`` had only a recall gate)."""
    planes = _hyperplanes(dim, n_planes, seed)
    u = np.linalg.pinv(planes) @ np.ones(n_planes)
    u = u / np.sqrt((u * u).sum())
    e1 = np.zeros(dim)
    e1[0] = 1.0
    w = e1 - planes.T @ (np.linalg.pinv(planes).T @ e1)
    # remove any u component (u lies in the row space, so this is ~0 —
    # belt and braces for exact orthogonality of the analytic cosine)
    w = w - (w @ u) * u
    w = w / np.sqrt((w * w).sum())
    return u, w


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the kmeans-partitioned scale path
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic distributed k-means (Lloyd) for IVF coarse centroids.

    Init = the ``n_centroids`` lowest-id vectors (seedless, reproducible).
    Each iteration is ONE mapInPandas pass emitting per-partition partial
    (centroid, count, sum-vector) rows — only ``partitions × k`` tiny rows
    reach the driver, never data (the same driver-state shape as
    MLlib KMeans). Assignment is a numpy matmul per Arrow batch."""
    init = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(int(n_centroids))
        .select(vec_col)
        .collect()
    )
    cents = np.array([list(map(float, r[0])) for r in init])
    dim = cents.shape[1]
    vecs = embeddings.select(F.col(vec_col).cast("array<double>").alias("v"))

    for _ in range(int(iters)):
        c = cents  # capture for closure

        def partials(batches):
            sums = np.zeros((len(c), dim))
            counts = np.zeros(len(c), dtype=np.int64)
            for b in batches:
                m = np.stack(b["v"].to_numpy())
                # nearest centroid by euclidean distance
                d = ((m * m).sum(1)[:, None]
                     - 2.0 * m @ c.T
                     + (c * c).sum(1)[None, :])
                a = d.argmin(1)
                np.add.at(sums, a, m)
                np.add.at(counts, a, 1)
            yield pd.DataFrame(
                {
                    "cid": np.arange(len(c), dtype=np.int64),
                    "cnt": counts,
                    "s": list(sums),
                }
            )

        rows = vecs.mapInPandas(
            partials, "cid long, cnt long, s array<double>"
        ).collect()
        sums = np.zeros((len(c), dim))
        counts = np.zeros(len(c), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["s"])
            counts[r["cid"]] += r["cnt"]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents


def ivf_assign(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id for a vector column (vectorized numpy matmul
    per Arrow batch). At scale this is the WRITE-TIME partition key: store
    the table partitioned/bucketed by it and probing = partition pruning."""
    from pyspark.sql.types import LongType

    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(LongType())
    def _assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        d = ((m * m).sum(1)[:, None] - 2.0 * m @ c.T + (c * c).sum(1)[None, :])
        return pd.Series(d.argmin(1).astype(np.int64))

    return _assign(vec.cast("array<double>"))


def ivf_build_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """WRITE-TIME IVF index: train coarse centroids, assign every vector
    its ``ivf_cell``, and persist the table PARTITIONED BY ivf_cell —
    the faiss inverted-file layout expressed as Hive-style partitioning.
    Probing a stored index is then pure partition pruning: Catalyst turns
    the cell filter into PartitionFilters and never opens non-probed
    files (the 100 TB difference between IVF and brute force).

    Centroids are persisted beside the data in ``_ivf_centroids`` (the
    underscore prefix makes Spark's file index ignore it when reading the
    main table)."""
    cents = ivf_train_centroids(embeddings, n_centroids, iters, vec_col, id_col)
    spark = embeddings.sparkSession
    (
        embeddings.withColumn("ivf_cell", ivf_assign(F.col(vec_col), cents))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(path)
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cid long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_ivf_centroids")
    return cents


def ivf_load_centroids(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/_ivf_centroids").orderBy("cid").collect()
    return np.array([list(map(float, r["centroid"])) for r in rows])


def ivf_topk_stored(
    spark,
    path: str,
    query_vec,
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a STORED IVF index (written by :func:`ivf_build_index`):
    nearest-``nprobe`` cells by centroid distance, then the zero-shuffle
    exact-cosine collapse over ONLY those partitions. The ``isin`` filter
    sits on the Hive partition column, so the scan's PartitionFilters
    prune every other cell at file-listing time (plan-asserted in
    tests/test_ann_recall.py)."""
    cents = ivf_load_centroids(spark, path)
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(1)
    probe = [int(i) for i in np.argsort(d)[: int(nprobe)]]
    df = spark.read.parquet(path)
    pruned = df.filter(F.col("ivf_cell").isin(probe))
    return cosine_topk_bruteforce(pruned, q, k, vec_col, id_col).drop("ivf_cell")


def ivf_topk(
    embeddings: DataFrame,
    query_vec,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: train (or reuse) coarse centroids,
    probe the ``nprobe`` centroids nearest the query, exact cosine only
    inside the probed cells — the faiss-IVF architecture re-expressed as
    partition pruning + the zero-shuffle brute-force collapse."""
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, n_centroids, iters, vec_col, id_col
        )
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(1)
    probe = [int(i) for i in np.argsort(d)[: int(nprobe)]]
    cell = ivf_assign(F.col(vec_col), centroids)
    pruned = embeddings.withColumn("ivf_cell", cell).filter(
        F.col("ivf_cell").isin(probe)
    )
    return cosine_topk_bruteforce(pruned, q, k, vec_col, id_col).drop("ivf_cell")
