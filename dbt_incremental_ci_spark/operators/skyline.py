"""2-D Pareto skyline (maximize y at minimal x) — the multi-criteria
"best tradeoffs" query (Börzsönyi et al., "The Skyline Operator", ICDE
2001): a point survives iff no other point is <= in x and >= in y with
one strict. The classic price/quality, latency/accuracy frontier.

Spark-first shape: the textbook single pass is a sort by (x asc,
y desc) + a running max of y over STRICTLY PRECEDING rows — a global
ordered window, i.e. a single-task sort at scale. Here it runs
two-phase (the ``packing.global_cumsum`` pattern): deterministic
hash-sampled x-quantiles bucket the data, each bucket computes its
local running max in parallel, and each bucket adds the PREFIX max of
all earlier buckets' y maxima — an O(buckets) broadcast — so no
data-sized frame ever funnels into one task. Ties on x keep only the
bucket-sorted first (max-y) point; exact duplicates collapse to one
survivor (strict-> comparison).

Determinism: the sort key carries an id tiebreak, bucket bounds come
from the md5-hash sample (not RNG — the global_cumsum lesson), and
the comparison is on round-6 values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    num_buckets: int | None = None,
    sample_rate: float = 0.2,
) -> DataFrame:
    """Rows on the (minimize ``x_col``, maximize ``y_col``) Pareto
    frontier: ``(id, x, y)``, one survivor per frontier point."""
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform

    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("__id"),
        F.round(F.col(x_col), 6).cast("double").alias("__x"),
        F.round(F.col(y_col), 6).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    # deterministic x-quantile bucket bounds (hash sample, md5 — the
    # RNG-free global_cumsum convention)
    sample = base.filter(hash_uniform(F.col("__id"), "skyline") < sample_rate)
    probs = [i / n for i in range(1, n)]
    # driver-bound: O(buckets) boundary values from an approx-quantile
    # sketch over the hash sample
    bounds = sample.approxQuantile("__x", probs, 0.01) if probs else []
    bucket = F.lit(0)
    for b in sorted(set(bounds)):
        bucket = bucket + (F.col("__x") > F.lit(float(b))).cast("int")
    bucketed = base.withColumn("__bkt", bucket).localCheckpoint(eager=False)

    order = [F.col("__x").asc(), F.col("__y").desc(), F.col("__id").asc()]
    w_prev = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__runmax_prev", F.max("__y").over(w_prev))

    # prefix max of earlier buckets' y maxima — O(buckets) rows
    per_bucket = bucketed.groupBy("__bkt").agg(F.max("__y").alias("__bmax"))
    w_pref = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # O(buckets)-row frame: the deliberate tiny single-task window
    prefix = per_bucket.select(
        "__bkt", F.max("__bmax").over(w_pref).alias("__premax")
    )
    joined = local.join(F.broadcast(prefix), "__bkt")
    runmax = F.greatest(
        F.coalesce(F.col("__runmax_prev"), F.lit(float("-inf"))),
        F.coalesce(F.col("__premax"), F.lit(float("-inf"))),
    )
    return (
        joined.filter(F.col("__y") > runmax)
        .select(
            F.col("__id").alias(id_col),
            F.col("__x").alias(x_col),
            F.col("__y").alias(y_col),
        )
    )


def skyline_2d_sql(
    table_expr: str, x_col: str, y_col: str, id_col: str
) -> str:
    """DuckDB twin of :func:`skyline_2d` — the single-pass sorted
    running max (the oracle can afford the global sort)."""
    return f"""
    WITH base AS (
      SELECT {id_col} AS id,
             CAST(ROUND({x_col}, 6) AS DOUBLE) AS x,
             CAST(ROUND({y_col}, 6) AS DOUBLE) AS y
      FROM {table_expr}
      WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ),
    r AS (
      SELECT id, x, y,
             max(y) OVER (ORDER BY x ASC, y DESC, id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS runmax_prev
      FROM base
    )
    SELECT id AS {id_col}, x AS {x_col}, y AS {y_col}
    FROM r WHERE runmax_prev IS NULL OR y > runmax_prev
    """
