"""Kaplan-Meier survival estimation over distributed cohorts — the
time-to-event view a training-data / product pipeline needs for
"how long until a user converts / a document is re-crawled / a job
finishes", with right-censoring handled correctly (Kaplan & Meier
1958, the standard nonparametric estimator).

Shape: one corpus-sized hash aggregate collapses rows to the
``(duration, d_events, c_censored)`` life table — a frame bounded by
the number of DISTINCT integer durations (days in an observation
window: hundreds, never corpus-scaled) — then the at-risk counts and
the survival product run as tiny windows over that life table. The
cumulative product is computed as ``exp(cumsum(ln(1 - d/n)))`` with
the window ordered ascending by duration, so both engines fold the
same terms in the same order; the output survival is rounded to 6 dp
(the engine's inherently-floating rule, workload_base).

No data-sized sort, window, or collect: the only single-partition
exchange is the life-table window (distinct-duration-sized, bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Life table + Kaplan-Meier survival curve.

    ``duration_col``: non-negative integer time-to-event-or-censor
    (e.g. days). ``event_col``: 1 when the event was observed at that
    duration, 0 when the subject was censored there.

    Output, one row per distinct duration, ascending:
    ``(duration, n_risk, d_events, c_censored, survival)`` where
    ``n_risk`` counts subjects with duration >= t and ``survival`` is
    the KM product over event times <= t, rounded to 6 dp. A duration
    where every remaining subject dies (d = n_risk) sets survival to
    exactly 0.0 from there on (no ln(0) is ever evaluated).
    """
    life = (
        df.select(
            F.col(duration_col).cast("bigint").alias("duration"),
            F.col(event_col).cast("int").alias("__e"),
        )
        .groupBy("duration")
        .agg(
            F.sum("__e").cast("bigint").alias("d_events"),
            F.sum(1 - F.col("__e")).cast("bigint").alias("c_censored"),
        )
    )
    # life table is distinct-duration-sized (bounded by the
    # observation window in time units) — the windows below are the
    # deliberate tiny single-partition class (equi-width-histogram
    # spine precedent).
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prior = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum(F.col("d_events") + F.col("c_censored")).over(w_all)
    prior = F.coalesce(
        F.sum(F.col("d_events") + F.col("c_censored")).over(w_prior),
        F.lit(0),
    )
    lt = life.select(
        "duration",
        "d_events",
        "c_censored",
        (total - prior).cast("bigint").alias("n_risk"),
    )
    # ln(1 - d/n) only where the factor is positive; a d == n row (and
    # everything after it) is forced to survival 0 via the cumulative
    # extinct flag instead of evaluating ln(0).
    frac = F.col("d_events").cast("double") / F.col("n_risk").cast("double")
    term = F.when(
        (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_risk")),
        F.log(F.lit(1.0) - frac),
    ).otherwise(F.lit(0.0))
    extinct = F.max(
        (F.col("d_events") >= F.col("n_risk")).cast("int")
    ).over(w_cum)
    surv = F.when(extinct == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(term).over(w_cum)), 6)
    )
    return lt.select(
        "duration",
        "n_risk",
        "d_events",
        "c_censored",
        surv.alias("survival"),
    ).orderBy("duration")


def kaplan_meier_sql(rows: str, duration_col: str, event_col: str) -> str:
    """DuckDB twin of :func:`kaplan_meier`. ``rows`` is a FROM-able
    relation exposing ``duration_col`` and ``event_col``."""
    return f"""
    WITH life AS (
      SELECT CAST({duration_col} AS BIGINT) AS duration,
             CAST(SUM(CAST({event_col} AS INT)) AS BIGINT) AS d_events,
             CAST(SUM(1 - CAST({event_col} AS INT)) AS BIGINT)
               AS c_censored
      FROM {rows} GROUP BY 1
    ),
    risk AS (
      SELECT duration, d_events, c_censored,
             CAST(SUM(d_events + c_censored) OVER ()
                  - COALESCE(SUM(d_events + c_censored) OVER (
                      ORDER BY duration
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) AS BIGINT) AS n_risk
      FROM life
    ),
    terms AS (
      SELECT *,
             CASE WHEN d_events > 0 AND d_events < n_risk
                  THEN ln(1.0 - CAST(d_events AS DOUBLE) / n_risk)
                  ELSE 0.0 END AS term,
             MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS extinct
      FROM risk
    )
    SELECT duration, n_risk, d_events, c_censored,
           CASE WHEN extinct = 1 THEN 0.0
                ELSE ROUND(exp(SUM(term) OVER (
                       ORDER BY duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )), 6) END AS survival
    FROM terms
    ORDER BY duration
    """
