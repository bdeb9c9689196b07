"""K-means embedding clustering as a first-class corpus operator —
the building block under SemDeDup-style semantic dedup, curriculum
bucketing, and IVF index builds (``similarity.train_ivf_centroids`` is
the IVF-specific variant; this module exposes clustering itself, with
per-vector assignments and cluster sizes as queryable outputs).

Architecture (the FAISS/offline-quantizer shape, restated for Spark):

- TRAIN on a bounded deterministic sample: rows are picked by the
  md5-variate order of their id (``order by md5(id||salt) limit n`` —
  a distributed TakeOrderedAndProject, never a full sort, never the
  corpus on the driver), then Lloyd's algorithm runs driver-side in
  numpy float64 over that sample only.
- ASSIGN as a map-only Column expression: squared-L2 distance to each
  of the k literal centroids (rounded to 9 decimals so argmin ties
  break identically in any engine), first-index argmin. The corpus is
  touched exactly once, embarrassingly parallel, no Python workers.
- Cluster sizes are one map-side-combined k-row aggregate.

Cross-engine determinism: the sample-id selection is pure md5 string
ordering, Lloyd is plain shared numpy code, and both the DuckDB oracle
and the Spark plan inline the SAME trained centroid floats — so the
oracle replays training + assignment bit-for-bit (the q43/q99
literal-inlining pattern).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.similarity import _centroid_dists


def sample_order_key(id_val: int | str, salt: str = "km") -> str:
    """Python twin of the Spark/SQL sample-order md5 variate."""
    return hashlib.md5(f"{id_val}:{salt}".encode()).hexdigest()


def lloyd(X, k: int, iters: int = 10, seed: int = 7):
    """Plain numpy float64 k-means (k-means++ seeding, fixed-seed
    generator, empty cells keep their old center). Shared verbatim by
    the engine and the DuckDB-oracle replica so both derive identical
    centroids from an identical sample."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    if X.shape[0] < k:
        raise ValueError(f"need >= k={k} sample vectors, got {X.shape[0]}")
    rng = np.random.default_rng(seed)
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.integers(X.shape[0])]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        idx = rng.choice(X.shape[0], p=probs) if probs is not None else 0
        centers[j] = X[idx]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(axis=1))
    xsq = (X**2).sum(axis=1, keepdims=True)
    for _ in range(iters):
        dists = xsq - 2.0 * (X @ centers.T) + (centers**2).sum(axis=1)
        assign = dists.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if members.shape[0]:
                centers[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in centers]


def kmeans_fit(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 200,
    iters: int = 10,
    seed: int = 7,
    salt: str = "km",
) -> list[list[float]]:
    """Train centroids on a bounded md5-ordered sample. The collected
    sample is re-sorted by id before Lloyd so the training input order
    (which seeds k-means++) is canonical regardless of partitioning."""
    rows = (
        emb.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .orderBy(
            F.md5(F.concat(F.col("__id").cast("string"), F.lit(":" + salt)))
        )
        .limit(sample_cap)
        # driver-bound: <= sample_cap (default 200) vectors — k-means training sample
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["__id"])
    return lloyd([r["__v"] for r in rows], k, iters, seed)


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) — map-only nearest-centroid assignment
    against literal centroids; dist2 is the rounded squared L2."""
    k = len(centroids)
    dim = len(centroids[0])
    dists = _centroid_dists(
        F.col(vec_col), dim, k, seed=0, centroids=centroids
    )
    return emb.select(
        F.col(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.round(F.array_min(dists), 6).alias("dist2"),
    )


def kmeans_cluster(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 200,
    iters: int = 10,
    seed: int = 7,
    salt: str = "km",
) -> DataFrame:
    """End-to-end: fit on the bounded sample, assign the full corpus,
    annotate each row with its cluster's population (k-row broadcast
    join). Output: (id, cluster, dist2, cluster_size)."""
    centers = kmeans_fit(emb, k, id_col, vec_col, sample_cap, iters, seed, salt)
    assigned = assign_clusters(emb, centers, id_col, vec_col)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(F.broadcast(sizes), "cluster").select(
        id_col, "cluster", "dist2", "cluster_size"
    )
