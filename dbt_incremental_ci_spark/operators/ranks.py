"""Distributed global ranking — row_number / rank / percent_rank over
a GLOBAL ordering without the single-task window.

``F.percent_rank().over(Window.orderBy(c))`` forces
``Exchange SinglePartition`` of the whole input: every row funnels
through one task — the canonical Spark scale trap (fine on a 10k-row
dimension, fatal on anything that grows with the data). The round-3
plan audit caught exactly that shape in q13 over the supplier table,
which grows linearly with scale factor.

The scalable shape is the two-phase rank this codebase already uses in
``dsir.dsir_select`` and ``sampling.epoch_shuffle_rank``, factored out
here for reuse:

1. range-partition by the sort key (contiguous key ranges per
   partition),
2. per-partition local ``row_number`` (parallel; state = 1 counter),
3. per-partition counts (O(partitions) rows) exclusive-prefix-summed
   through a partition-count-sized window and broadcast back as
   offsets.

``rank()`` tie semantics (ties share the MINIMUM position) come from a
``min(row_number) over (partition by order-value)`` pass — a per-value
group window whose state is bounded by the tie multiplicity, never the
table. ``percent_rank`` is then ``(rank - 1) / (n - 1)`` with the row
count joined in as a broadcast literal (the W7 grand-total pattern —
no single-partition shuffle anywhere in the plan).

The ``repartitionByRange`` boundaries are RNG-sampled, so the frame is
``localCheckpoint``-pinned before both consuming branches — the same
double-evaluation hazard documented at ``sampling.epoch_shuffle_rank``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_row_number(
    df: DataFrame,
    sort_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` in ``sort_cols`` order (which must
    be a unique total order for a deterministic result), computed with
    partition-local windows + broadcast offsets. Adds ``out_col``."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    lw = Window.partitionBy("__pid").orderBy(*sort_cols)
    local = ranged.withColumn("__local", F.row_number().over(lw))
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__t"))
    # O(partitions) rows — the deliberate tiny single-task step
    tw = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(tw), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__local", "__off")
    )


def global_percent_rank(
    df: DataFrame,
    order_col: str,
    unique_col: str,
    out_col: str = "pct_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``percent_rank() OVER (ORDER BY order_col)`` — identical
    semantics (ties share the minimum rank; result is
    ``(rank-1)/(n-1)``, and 0.0 for a single-row input) — with no
    data-sized single-partition exchange in the plan. ``unique_col``
    breaks row_number ties arbitrarily; it does not affect the output
    because tied rows collapse to the same rank anyway."""
    rn = two_phase_row_number(
        df,
        [F.asc(order_col), F.asc(unique_col)],
        out_col="__rn",
        num_partitions=num_partitions,
    )
    # tie collapse: per-order-value group window, state = multiplicity
    tie = Window.partitionBy(order_col)
    ranked = rn.withColumn("__rank", F.min("__rn").over(tie))
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            out_col,
            F.when(
                F.col("__n") > 1,
                (F.col("__rank") - 1).cast("double")
                / (F.col("__n") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__rn", "__rank", "__n")
    )
