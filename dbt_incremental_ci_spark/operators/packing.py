"""Sequence packing (concat-and-chunk) for LLM training pipelines.

Packing concatenates documents in a canonical order and slices the
token stream into fixed-size context windows; every document needs its
global token offset. The naive Spark expression — ``sum(tokens) over
(order by id)`` with no partitionBy — collapses the whole table into
ONE task and is the canonical scale trap. The scalable plan here is
the classic two-phase distributed prefix sum:

1. range-partition by the order key (so partitions hold contiguous
   key ranges),
2. per-partition running sums via a window *partitioned by* the
   partition id (parallel),
3. per-partition totals (one tiny row per partition) are collected,
   exclusive-prefix-summed on the driver, and broadcast-joined back
   as offsets.

Step 3's collect is O(num_partitions) — thousands of rows at 100 TB,
not data-sized. Results are identical to the single-task window (the
offsets correct for any partition boundary placement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in ``order_col`` order,
    computed with partition-parallel windows + broadcast offsets (no
    single-task global window). ``order_col`` must be unique and
    numeric (it is bucketed by its own quantiles).

    The range buckets come from exact quantiles of a DETERMINISTIC
    md5-hash sample of the order column — not ``repartitionByRange``,
    whose RNG-seeded sampler draws different boundaries on every
    evaluation of the plan. This operator's local-sums and
    bucket-totals branches both re-derive the bucket id; with RNG
    boundaries the two branches can disagree whenever Catalyst fails
    to reuse the exchange between them (measured: the nested
    two-column cumsum in ``drift.ks_statistic`` mis-offset every
    bucket after the first), so determinism here is a correctness
    requirement, not a reproducibility nicety.
    """
    from pyspark.sql.types import BooleanType, NumericType

    from dbt_incremental_ci_spark.operators.sampling import hash_uniform

    # Fail loudly on a non-numeric order column (ADVICE r3): a string
    # order_col that casts to NULL for some rows would silently put
    # those rows in bucket NULL and give them wrong offsets. A
    # plan-time dtype check is deterministic and can't be pruned away
    # the way a runtime assert_true column can.
    dt = df.schema[order_col].dataType
    if not isinstance(dt, (NumericType, BooleanType)):
        raise TypeError(
            f"global_cumsum: order_col '{order_col}' must be numeric, "
            f"got {dt.simpleString()} (a non-numeric order would bucket "
            "NULL-casting rows silently)"
        )
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Materialize the input once: this operator reads it from THREE
    # plan branches (quantile sample, per-bucket local sums, bucket
    # totals), and without truncation each branch re-executes the
    # caller's upstream pipeline — nested two-column cumsums (KS) or
    # expensive scoring expressions upstream (ROC-AUC) multiplied that
    # into ~10x re-execution (measured q136 9.7 s -> 2.6 s, q165
    # 26.7 s -> 2.5 s at sf0.1). Same cost class as the exchange the
    # cumsum needs anyway.
    df = df.localCheckpoint(eager=False)
    oc = F.col(order_col).cast("double")
    ps = [i / n for i in range(1, n)]
    sample = df.filter(
        hash_uniform(F.col(order_col).cast("string"), "gcs") < 0.05
    )
    # driver-bound: O(num_partitions) quantile bounds, one row
    bounds = sample.agg(F.percentile(oc, F.lit(ps)).alias("b")).first()["b"]
    if not bounds:
        # tiny input: the 5% sample came up empty — exact quantiles of
        # the full (small) input keep the parallel path; an empty df
        # yields no bounds and a single bucket.
        # driver-bound: O(num_partitions) quantile bounds, one row (tiny-input fallback)
        bounds = df.agg(F.percentile(oc, F.lit(ps)).alias("b")).first()["b"]
    bucket = F.lit(0)
    for b in sorted({float(x) for x in (bounds or [])}):
        bucket = bucket + (oc > F.lit(b)).cast("int")
    bucketed = df.withColumn("__b", bucket)
    w = Window.partitionBy("__b").orderBy(order_col)
    local = bucketed.withColumn("__local", F.sum(value_col).over(w))
    # exclusive prefix sum of the per-bucket totals: one row per
    # bucket, so the unpartitioned window is a deliberate single-task
    # step over O(num_partitions) rows — never data-sized. Staying in
    # the plan (vs collect + createDataFrame) saves driver round trips
    # and keeps lineage in one job.
    # Round-12 MEASURED NEGATIVE result (do not re-try blind): the
    # exact_quantiles driver-scalar rewrite — collect the O(buckets)
    # totals and inline offsets as a literal CASE — read paired
    # 1.06–1.17 WORSE here (q136/q42/q264): a bucket-count-deep CASE
    # evaluated per DATA row loses to the broadcast-hash probe, and
    # the extra driver round trip costs more than the in-plan
    # broadcast sub-job it replaces. It paid in exact_quantiles only
    # because the ladder there was several broadcasts deep and the
    # CASE lands on probed-bucket rows, not the whole frame.
    totals = bucketed.groupBy("__b").agg(F.sum(value_col).alias("__total"))
    tw = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    off_df = totals.select(
        "__b",
        F.coalesce(F.sum("__total").over(tw), F.lit(0)).alias("__offset"),
    )
    return (
        local.join(F.broadcast(off_df), "__b")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("bigint"))
        .drop("__b", "__local", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    context_len: int,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are concatenated in
    ``order_col`` order and the token stream is cut into
    ``context_len``-token windows. Emits each document's global token
    span and the window range it lands in (a document may straddle a
    boundary — ``bin_start < bin_end`` — exactly like real
    concat-and-chunk LLM pretraining batches).

    Output columns: id, n_tokens, tok_start, tok_end (exclusive),
    bin_start, bin_end (inclusive).
    """
    order_col = order_col or id_col
    c = global_cumsum(df, order_col, token_col, out_col="tok_end")
    tok_start = F.col("tok_end") - F.col(token_col)
    return c.select(
        F.col(id_col),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        tok_start.cast("bigint").alias("tok_start"),
        F.col("tok_end"),
        F.floor(tok_start / context_len).cast("bigint").alias("bin_start"),
        F.floor((F.col("tok_end") - 1) / context_len)
        .cast("bigint")
        .alias("bin_end"),
    )
