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
    factor`` partitions iff it is currently planned with fewer."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
