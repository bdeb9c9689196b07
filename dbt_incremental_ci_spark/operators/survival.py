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


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) — "do these survival
    curves differ", the companion hypothesis test to
    :func:`kaplan_meier`: at each event time compare group A's
    observed events to its hypergeometric expectation under the
    shared-hazard null, chi-square with 1 df.

    Same shape as the KM estimator: one hash aggregate to the
    two-group life table (distinct-duration-sized, bounded), at-risk
    counts from tiny windows over it, then one scalar aggregate.
    E and V per time are fixed double expressions over exact integer
    counts; their sums fold as rounded DECIMAL(38,10) (order-exact).
    p-value via the Bowling logistic normal-CDF approximation on
    z = sqrt(chi2) (two-sided — the chi2_1 tail identity).

    Output ONE row: ``(n_a, n_b, events_a, events_b, expected_a,
    chi2, p_value)``.
    """
    is_a = F.col(group_col) == label_a
    life = (
        df.filter(F.col(group_col).isin(label_a, label_b))
        .select(
            F.col(duration_col).cast("bigint").alias("duration"),
            F.col(event_col).cast("int").alias("__e"),
            is_a.cast("int").alias("__a"),
        )
        .groupBy("duration")
        .agg(
            F.sum(F.col("__e") * F.col("__a")).alias("d_a"),
            F.sum((1 - F.col("__e")) * F.col("__a")).alias("c_a"),
            F.sum(F.col("__e") * (1 - F.col("__a"))).alias("d_b"),
            F.sum((1 - F.col("__e")) * (1 - F.col("__a"))).alias("c_b"),
        )
    )
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prior = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot_a = F.sum(F.col("d_a") + F.col("c_a")).over(w_all)
    tot_b = F.sum(F.col("d_b") + F.col("c_b")).over(w_all)
    pri_a = F.coalesce(
        F.sum(F.col("d_a") + F.col("c_a")).over(w_prior), F.lit(0)
    )
    pri_b = F.coalesce(
        F.sum(F.col("d_b") + F.col("c_b")).over(w_prior), F.lit(0)
    )
    risk = life.select(
        "duration",
        "d_a",
        "d_b",
        (tot_a - pri_a).cast("bigint").alias("n_a_t"),
        (tot_b - pri_b).cast("bigint").alias("n_b_t"),
        tot_a.cast("bigint").alias("__na"),
        tot_b.cast("bigint").alias("__nb"),
    )
    big_n = (F.col("n_a_t") + F.col("n_b_t")).cast("double")
    big_d = (F.col("d_a") + F.col("d_b")).cast("double")
    e_a = big_d * F.col("n_a_t").cast("double") / big_n
    v = F.when(
        big_n > 1,
        big_d
        * (F.col("n_a_t").cast("double") / big_n)
        * (F.col("n_b_t").cast("double") / big_n)
        * (big_n - big_d)
        / (big_n - 1.0),
    ).otherwise(F.lit(0.0))

    def sdec(c: F.Column) -> F.Column:
        return F.sum(F.round(c, 10).cast("decimal(38,10)")).cast("double")

    agg = risk.agg(
        F.max("__na").cast("bigint").alias("n_a"),
        F.max("__nb").cast("bigint").alias("n_b"),
        F.sum("d_a").cast("bigint").alias("events_a"),
        F.sum("d_b").cast("bigint").alias("events_b"),
        sdec(e_a).alias("__ea"),
        sdec(F.col("d_a").cast("double") - e_a).alias("__oe"),
        sdec(v).alias("__v"),
    )
    chi2 = F.when(
        F.col("__v") > 0,
        F.col("__oe") * F.col("__oe") / F.col("__v"),
    ).otherwise(F.lit(0.0))
    z = F.sqrt(F.round(chi2, 6))
    p = F.round(
        F.lit(2.0)
        / (
            F.lit(1.0)
            + F.exp(F.lit(0.070566) * z * z * z + F.lit(1.5976) * z)
        ),
        10,
    )
    return agg.select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        F.round(F.col("__ea"), 6).alias("expected_a"),
        F.round(chi2, 6).alias("chi2"),
        p.alias("p_value"),
    )


def logrank_test_sql(
    rows: str,
    duration_col: str,
    event_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
) -> str:
    """DuckDB twin of :func:`logrank_test`."""
    return f"""
    WITH life AS (
      SELECT CAST({duration_col} AS BIGINT) AS duration,
        SUM(CAST({event_col} AS INT)
            * CASE WHEN {group_col} = '{label_a}' THEN 1 ELSE 0 END)
          AS d_a,
        SUM((1 - CAST({event_col} AS INT))
            * CASE WHEN {group_col} = '{label_a}' THEN 1 ELSE 0 END)
          AS c_a,
        SUM(CAST({event_col} AS INT)
            * CASE WHEN {group_col} = '{label_b}' THEN 1 ELSE 0 END)
          AS d_b,
        SUM((1 - CAST({event_col} AS INT))
            * CASE WHEN {group_col} = '{label_b}' THEN 1 ELSE 0 END)
          AS c_b
      FROM {rows}
      WHERE {group_col} IN ('{label_a}', '{label_b}')
      GROUP BY 1
    ),
    risk AS (
      SELECT duration, d_a, d_b,
        CAST(SUM(d_a + c_a) OVER ()
             - COALESCE(SUM(d_a + c_a) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS n_a_t,
        CAST(SUM(d_b + c_b) OVER ()
             - COALESCE(SUM(d_b + c_b) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS n_b_t,
        CAST(SUM(d_a + c_a) OVER () AS BIGINT) AS na,
        CAST(SUM(d_b + c_b) OVER () AS BIGINT) AS nb
      FROM life
    ),
    terms AS (
      SELECT *,
        CAST(n_a_t + n_b_t AS DOUBLE) AS bn,
        CAST(d_a + d_b AS DOUBLE) AS bd
      FROM risk
    ),
    agg AS (
      SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
        CAST(SUM(d_a) AS BIGINT) AS events_a,
        CAST(SUM(d_b) AS BIGINT) AS events_b,
        CAST(SUM(CAST(ROUND(bd * n_a_t / bn, 10) AS DECIMAL(38,10)))
          AS DOUBLE) AS ea,
        CAST(SUM(CAST(ROUND(d_a - bd * n_a_t / bn, 10)
          AS DECIMAL(38,10))) AS DOUBLE) AS oe,
        CAST(SUM(CAST(ROUND(CASE WHEN bn > 1
            THEN bd * (n_a_t / bn) * (n_b_t / bn) * (bn - bd)
                 / (bn - 1.0)
            ELSE 0.0 END, 10) AS DECIMAL(38,10))) AS DOUBLE) AS v
      FROM terms
    ),
    fin AS (
      SELECT n_a, n_b, events_a, events_b,
        ROUND(ea, 6) AS expected_a,
        ROUND(CASE WHEN v > 0 THEN oe * oe / v ELSE 0.0 END, 6) AS chi2
      FROM agg
    )
    SELECT n_a, n_b, events_a, events_b, expected_a, chi2,
      ROUND(2.0 / (1.0 + exp(0.070566 * pow(sqrt(chi2), 3)
                             + 1.5976 * sqrt(chi2))), 10) AS p_value
    FROM fin
    """


def competing_risks(
    df: DataFrame,
    duration_col: str,
    cause_col: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions for TWO competing
    causes (cause 1 / cause 2; 0 = censored) — the correct replacement
    for "1 − KM per cause" when events compete (naive per-cause KM
    overstates every incidence because it treats the rival cause as
    censoring).

    Life table per integer duration (bounded by the observation
    window, the :func:`kaplan_meier` class): overall survival
    S(t) = Π(1 − d_tot/n) via the same exp-ln-cumsum device, and
    CIF_k(t) = Σ_{s≤t} S(s−) · d_k(s)/n(s). Every ln/exp input is a
    ratio of exact integers and every cumulative sum runs in the one
    duration order, so the doubles replay bit-equal in DuckDB; CIFs
    round to 6 dp at the edge. Extinction rows (d_tot = n) force
    S to exactly 0.0 without evaluating ln(0).

    Output per distinct duration, ascending: ``(duration, n_risk,
    d_cause1, d_cause2, c_censored, cif1, cif2)``.
    """
    life = (
        df.select(
            F.col(duration_col).cast("bigint").alias("duration"),
            F.col(cause_col).cast("int").alias("__k"),
        )
        .groupBy("duration")
        .agg(
            F.sum((F.col("__k") == 1).cast("int"))
            .cast("bigint")
            .alias("d_cause1"),
            F.sum((F.col("__k") == 2).cast("int"))
            .cast("bigint")
            .alias("d_cause2"),
            F.sum((F.col("__k") == 0).cast("int"))
            .cast("bigint")
            .alias("c_censored"),
        )
    )
    # duration-bounded frame: the deliberate tiny 1-part window class
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prior = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sz = F.col("d_cause1") + F.col("d_cause2") + F.col("c_censored")
    total = F.sum(sz).over(w_all)
    prior = F.coalesce(F.sum(sz).over(w_prior), F.lit(0))
    lt = life.withColumn(
        "n_risk", (total - prior).cast("bigint")
    ).withColumn("__dtot", F.col("d_cause1") + F.col("d_cause2"))
    frac = F.col("__dtot").cast("double") / F.col("n_risk").cast("double")
    term = F.when(
        (F.col("__dtot") > 0) & (F.col("__dtot") < F.col("n_risk")),
        F.log(F.lit(1.0) - frac),
    ).otherwise(F.lit(0.0))
    extinct_prior = F.coalesce(
        F.max((F.col("__dtot") >= F.col("n_risk")).cast("int")).over(
            w_prior
        ),
        F.lit(0),
    )
    s_prior = F.when(extinct_prior == 1, F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.sum(term).over(w_prior), F.lit(0.0)))
    )
    stepped = lt.withColumn(
        "__inc1",
        s_prior
        * (F.col("d_cause1").cast("double") / F.col("n_risk").cast("double")),
    ).withColumn(
        "__inc2",
        s_prior
        * (F.col("d_cause2").cast("double") / F.col("n_risk").cast("double")),
    )
    return stepped.select(
        "duration",
        "n_risk",
        "d_cause1",
        "d_cause2",
        "c_censored",
        F.round(F.sum("__inc1").over(w_cum), 6).alias("cif1"),
        F.round(F.sum("__inc2").over(w_cum), 6).alias("cif2"),
    ).orderBy("duration")


def competing_risks_sql(rows: str, duration_col: str, cause_col: str) -> str:
    """DuckDB twin of :func:`competing_risks` — identical life table,
    identical ln/exp expression shapes, identical cumulative order."""
    return f"""
    WITH life AS (
      SELECT CAST({duration_col} AS BIGINT) AS duration,
             CAST(sum(CASE WHEN {cause_col} = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS d_cause1,
             CAST(sum(CASE WHEN {cause_col} = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS d_cause2,
             CAST(sum(CASE WHEN {cause_col} = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_censored
      FROM {rows}
      GROUP BY 1
    ),
    lt AS (
      SELECT *,
             CAST(sum(d_cause1 + d_cause2 + c_censored) OVER ()
                  - COALESCE(sum(d_cause1 + d_cause2 + c_censored)
                    OVER (ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS n_risk,
             d_cause1 + d_cause2 AS dtot
      FROM life
    ),
    terms AS (
      SELECT *,
             CASE WHEN dtot > 0 AND dtot < n_risk
                  THEN ln(1.0 - CAST(dtot AS DOUBLE)
                                / CAST(n_risk AS DOUBLE))
                  ELSE 0.0 END AS term,
             CASE WHEN dtot >= n_risk THEN 1 ELSE 0 END AS ext
      FROM lt
    ),
    s AS (
      SELECT *,
             CASE WHEN COALESCE(max(ext) OVER (ORDER BY duration
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) = 1
                  THEN 0.0
                  ELSE exp(COALESCE(sum(term) OVER (ORDER BY duration
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0.0)) END AS s_prior
      FROM terms
    )
    SELECT duration, n_risk, d_cause1, d_cause2, c_censored,
           ROUND(sum(s_prior * (CAST(d_cause1 AS DOUBLE)
                 / CAST(n_risk AS DOUBLE)))
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS cif1,
           ROUND(sum(s_prior * (CAST(d_cause2 AS DOUBLE)
                 / CAST(n_risk AS DOUBLE)))
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS cif2
    FROM s ORDER BY duration
    """
