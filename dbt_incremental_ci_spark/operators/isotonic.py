"""Isotonic (monotone) calibration over a bounded score grid — PAVA
without the sequential pooling loop.

The pool-adjacent-violators solution has the closed MINIMAX form
(Robertson, Wright & Dykstra 1988, Thm 1.4.4):

    iso(k) = max_{i <= k} min_{j >= k} mean(y over bins i..j)

which is enumerable EXACTLY over a bounded bin grid: prefix sums give
every interval mean from two lookups, a per-i suffix-min window and a
per-k max-aggregate finish it. For B bins that is a B²-pair frame —
trivially small (the score grid is fixed: B=100 here), while the
corpus is touched exactly once by the binning aggregate. This is the
scale-correct shape: the classic left-to-right PAVA sweep is
inherently sequential over bins, and pooling on the DRIVER would make
the model fit depend on a collect; the minimax form stays entirely in
the engine and gives the DuckDB twin the same non-recursive SQL.

Determinism: bin counts/sums are exact integers; interval means are
single double divisions of exact ints; min/max over identical doubles
agree across engines; readouts ROUND-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def isotonic_calibrate_binned(
    df: DataFrame, bin_col: str, outcome: F.Column
) -> DataFrame:
    """Fit iso(k) over integer bins of ``bin_col`` (ascending order)
    for a binary ``outcome``; returns per-bin
    ``(bin, n, rate_raw, rate_iso)`` with iso monotone non-decreasing.
    """
    bins = (
        df.select(F.col(bin_col).alias("b"), outcome.cast("int").alias("y"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("s"),
        )
        .localCheckpoint(eager=False)  # bin-bounded; pairs + output read it
    )
    # bin-grid-bounded frames: deliberate tiny 1-part windows
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "b",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("s").over(wcum).alias("cs"),
    ).localCheckpoint(eager=False)
    # interval mean avg(i..j) from prefix sums:
    # (cs_j - cs_{i-1}) / (cn_j - cn_{i-1}), with the i-1 prefix
    # recovered as (cum at i) - (bin i's own n/s)
    left2 = cum.join(
        bins.select(F.col("b").alias("bi"), "n", "s"),
        cum["b"] == F.col("bi"),
    ).select(
        F.col("b").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cs") - F.col("s")).alias("cs0"),
    )
    right = cum.select(
        F.col("b").alias("j"),
        F.col("cn").alias("cnj"),
        F.col("cs").alias("csj"),
    )
    pairs = left2.crossJoin(right).where(F.col("j") >= F.col("i")).select(
        "i",
        "j",
        (
            (F.col("csj") - F.col("cs0")).cast("double")
            / (F.col("cnj") - F.col("cn0")).cast("double")
        ).alias("avg_ij"),
    )
    # suffmin(i, k) = min over j >= k of avg(i, j): suffix-min per i
    wsuf = (
        Window.partitionBy("i")
        .orderBy(F.desc("j"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suff = pairs.select(
        "i",
        F.col("j").alias("k"),
        F.min("avg_ij").over(wsuf).alias("suffmin"),
    )
    iso = (
        suff.where(F.col("k") >= F.col("i"))
        .groupBy("k")
        .agg(F.max("suffmin").alias("iso"))
    )
    return (
        bins.join(iso, bins["b"] == iso["k"])
        .select(
            F.col("b").alias("bin"),
            "n",
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 6
            ).alias("rate_raw"),
            F.round(F.col("iso"), 6).alias("rate_iso"),
        )
    )


def isotonic_calibrate_binned_sql(
    rows: str, bin_expr: str, outcome_expr: str
) -> str:
    """DuckDB twin of :func:`isotonic_calibrate_binned` — the same
    minimax enumeration (no recursion)."""
    return f"""
    WITH bins AS (
      SELECT {bin_expr} AS b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST({outcome_expr} AS INT)) AS BIGINT) AS s
      FROM {rows} GROUP BY 1
    ),
    cum AS (
      SELECT b, n, s,
             sum(n) OVER (ORDER BY b) AS cn,
             sum(s) OVER (ORDER BY b) AS cs
      FROM bins
    ),
    pairs AS (
      SELECT l.b AS i, r.b AS j,
             CAST(r.cs - (l.cs - l.s) AS DOUBLE)
               / CAST(r.cn - (l.cn - l.n) AS DOUBLE) AS avg_ij
      FROM cum l JOIN cum r ON r.b >= l.b
    ),
    suff AS (
      SELECT i, j AS k,
             min(avg_ij) OVER (
               PARTITION BY i ORDER BY j DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS suffmin
      FROM pairs
    ),
    iso AS (
      SELECT k, max(suffmin) AS iso
      FROM suff WHERE k >= i GROUP BY k
    )
    SELECT bins.b AS bin, bins.n,
           ROUND(CAST(bins.s AS DOUBLE) / CAST(bins.n AS DOUBLE), 6)
             AS rate_raw,
           ROUND(iso.iso, 6) AS rate_iso
    FROM bins JOIN iso ON bins.b = iso.k
    """
