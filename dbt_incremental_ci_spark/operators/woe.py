"""Weight-of-evidence / information-value feature binning — the
credit-scoring and feature-selection staple (Siddiqi, "Credit Risk
Scorecards", 2006): per feature bin, WOE = ln(P(bin|good)/P(bin|bad))
measures how strongly the bin separates the classes, and
IV = Σ (P(bin|good) − P(bin|bad))·WOE grades the whole feature
(rule of thumb: < 0.02 useless, > 0.3 strong). A training pipeline
runs this over candidate features to rank them before fitting.

Shape: one hash aggregate over (bin, label) → #bins rows, then pure
column arithmetic — shuffled bytes scale with bin cardinality, never
rows. Laplace smoothing (+0.5 per cell, the standard continuity
correction) keeps WOE finite for pure bins; with it, the statistic is
a deterministic function of exact integer counts (rounded to 6).

No counterpart in the reference repo; part of the ML-data surface
(evalmetrics.py, drift.py) this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def woe_iv(
    df: DataFrame,
    bin_col: str | Column,
    label_col: str | Column,
    smooth: float = 0.5,
) -> DataFrame:
    """Per-bin ``(bin, n, events, non_events, event_rate, woe,
    iv_term)``; ``label_col`` must be boolean-like (event = true).
    Summing ``iv_term`` gives the feature's information value."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    per = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(y, 1).otherwise(0)).alias("events"),
    )
    tot = per.agg(
        F.sum("events").alias("__te"),
        F.sum(F.col("n") - F.col("events")).alias("__tn"),
        F.count(F.lit(1)).alias("__k"),
    )
    ev, ne = F.col("events").cast("double"), (
        F.col("n") - F.col("events")
    ).cast("double")
    # smoothed class-conditional shares: (cell + s) / (total + k*s)
    pg = (ev + F.lit(smooth)) / (
        F.col("__te") + F.col("__k") * F.lit(smooth)
    ).cast("double")
    pb = (ne + F.lit(smooth)) / (
        F.col("__tn") + F.col("__k") * F.lit(smooth)
    ).cast("double")
    woe = F.log(pg / pb)
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("events").cast("bigint").alias("events"),
        (F.col("n") - F.col("events")).cast("bigint").alias("non_events"),
        F.round(ev / F.col("n").cast("double"), 6).alias("event_rate"),
        F.round(woe, 6).alias("woe"),
        F.round((pg - pb) * woe, 6).alias("iv_term"),
    )


def woe_iv_sql(
    table: str,
    bin_expr: str,
    label_expr: str,
    smooth: float = 0.5,
) -> str:
    """DuckDB twin of :func:`woe_iv` (same smoothing, same rounding)."""
    return f"""
    WITH per AS (
      SELECT {bin_expr} AS bin,
             count(*) AS n,
             sum(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS events
      FROM {table} GROUP BY 1
    ),
    tot AS (
      SELECT sum(events) AS te, sum(n - events) AS tn, count(*) AS k
      FROM per
    )
    SELECT bin,
           CAST(n AS BIGINT) AS n,
           CAST(events AS BIGINT) AS events,
           CAST(n - events AS BIGINT) AS non_events,
           ROUND(CAST(events AS DOUBLE) / n, 6) AS event_rate,
           ROUND(ln(((events + {smooth!r}) / (te + k * {smooth!r}))
                    / ((n - events + {smooth!r}) / (tn + k * {smooth!r}))),
                 6) AS woe,
           ROUND((((events + {smooth!r}) / (te + k * {smooth!r}))
                  - ((n - events + {smooth!r}) / (tn + k * {smooth!r})))
                 * ln(((events + {smooth!r}) / (te + k * {smooth!r}))
                      / ((n - events + {smooth!r}) / (tn + k * {smooth!r}))),
                 6) AS iv_term
    FROM per CROSS JOIN tot
    """
