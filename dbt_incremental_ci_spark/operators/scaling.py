"""Parallelism guard for compute-bound operator inputs.

A Parquet scan can never be more parallel than its row-group layout:
the local test fixtures are single-row-group files, so every
pre-shuffle stage — exactly where the CPU-heavy operator work happens
(Arrow-batch signature computation, cosine folds) — runs on ONE core
no matter what ``spark.sql.files.*`` says.

:func:`ensure_min_parallelism` repartitions only when the input's
planned partition count is below the session's default parallelism.
On a real cluster (row groups ≈ 128 MB, thousands per table) the
condition is false and this is a zero-cost no-op — it exists for the
many-cores-few-row-groups regime, where one round-robin shuffle of
the operator's (already column-pruned) input buys a
``defaultParallelism``-way speedup of everything after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism ×
    factor`` partitions iff it is currently planned with fewer.

    Cost note (round-11 ADVICE): the ``df.rdd.getNumPartitions()``
    gate forces full physical planning of the subtree on the driver,
    pre-AQE — a per-call-site build-time cost, and on exchanged
    subtrees the planned count can disagree with the AQE-executed
    count, making the no-op guard a heuristic (harmless to results —
    both branches compute the same rows). Call it on cheap, scan-
    rooted inputs (project first), not on deep joined subtrees."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def balanced_range_buckets(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 8,
    sample_rate: float = 0.1,
    salt: str = "rb",
    bucket_col: str = "bucket",
) -> tuple[DataFrame, list[float]]:
    """Skew-balanced range bucketing from sampled exact quantiles —
    the deterministic, cross-engine-replayable core of what Spark's
    ``repartitionByRange`` does with its private RangePartitioner
    sampling (sortBy / range-clustered writes use the same idea).

    Boundaries are the (i/n)-quantiles (R-7 interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the definition)
    of a DETERMINISTIC md5-hash sample, so the same buckets come out
    of every run, engine, and partitioning — unlike the RNG sample
    inside ``repartitionByRange``, which reshuffles rows differently
    per run. Bucket id = number of boundaries strictly below the
    value (0..n_buckets-1); heavily-duplicated boundary values
    degrade gracefully (duplicate boundaries produce empty buckets
    rather than wrong assignments).

    Scale shape: one aggregate over the sample (O(sample) with
    map-side partials), n_buckets-1 scalars to the driver, then a
    pure per-row CASE — no data-sized collect, no extra shuffle. The
    caller chains ``.repartition(n_buckets, bucket_col)`` (or writes
    partitioned by it) to get balanced layout under value skew.

    Returns (bucketed df, boundary list).
    """
    from pyspark.sql import functions as F

    from dbt_incremental_ci_spark.operators.sampling import hash_uniform

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if not 0.0 < sample_rate <= 1.0:
        raise ValueError(f"sample_rate must be in (0, 1], got {sample_rate}")
    v = F.col(value_col).cast("double")
    sample = df.filter(hash_uniform(key_col, salt) < sample_rate)
    ps = [i / n_buckets for i in range(1, n_buckets)]
    row = sample.agg(
        F.percentile(v, F.lit(ps)).alias("bounds")
    # driver-bound: 1 row of n_buckets quantile bounds
    ).first()
    bounds = list(row["bounds"] or [])
    if not bounds:
        raise ValueError(
            "balanced_range_buckets: the sample is empty — raise "
            "sample_rate or check the key column"
        )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (v > F.lit(float(b))).cast("int")
    return df.withColumn(bucket_col, bucket), bounds
