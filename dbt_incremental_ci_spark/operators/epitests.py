"""Epidemiology-style categorical inference: Cochran-Armitage trend
and Mantel-Haenszel stratified odds ratio.

Both reduce the corpus to a tiny exact-count frame in ONE map-side-
combinable hash aggregate (per-score counts / per-stratum 2x2 cells)
and finish with scalar expression math — the q229/q239 shape. Nothing
data-sized crosses a 1-partition boundary.

Determinism (workload_base rules): every sum is over exact integers
(DECIMAL(38,0) products — the q303 bigint-overflow lesson: the CA
variance product R(N-R)(NC-B²) reaches ~8e29 at sf1) or over
ROUND-9 DECIMAL(38,9) per-stratum rational terms (the srm rule);
the final statistic is one double expression over those exact sums,
ROUND-6, composed with the identical operation sequence in the DuckDB
twin.

Public algorithm notes: Armitage (1955) trend test; Mantel & Haenszel
(1959) pooled odds ratio. No counterpart exists in the reference repo
(pure dbt-CI tooling); these extend the stats/eval band (q228+).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def _d(c: Column) -> Column:
    return c.cast(_D38)


def cochran_armitage_trend(
    df: DataFrame, score_col: str, outcome: Column
) -> DataFrame:
    """Cochran-Armitage test for a linear trend in a binary outcome
    across ordered integer scores.

    z = (N·A − R·B) / sqrt(R·(N−R)·(N·C − B²) / N), with
    N = Σn_s, R = Σr_s, A = Σ s·r_s, B = Σ s·n_s, C = Σ s²·n_s —
    all exact DECIMAL(38,0) integers from one per-score hash agg.

    Output: one row ``(n_total, n_events, z_trend)``.
    """
    per = df.select(
        F.col(score_col).cast("bigint").alias("s"),
        outcome.cast("int").alias("y"),
    ).groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("r"),
    )
    sums = per.agg(
        F.sum(_d(F.col("n"))).alias("N"),
        F.sum(_d(F.col("r"))).alias("R"),
        F.sum(_d(F.col("s") * F.col("r"))).alias("A"),
        F.sum(_d(F.col("s") * F.col("n"))).alias("B"),
        F.sum(_d(F.col("s") * F.col("s") * F.col("n"))).alias("C"),
    )
    num = _d(F.col("N") * F.col("A") - F.col("R") * F.col("B"))
    den2 = _d(
        F.col("R")
        * (F.col("N") - F.col("R"))
        * (F.col("N") * F.col("C") - F.col("B") * F.col("B"))
    )
    return sums.select(
        F.col("N").cast("bigint").alias("n_total"),
        F.col("R").cast("bigint").alias("n_events"),
        F.round(
            num.cast("double")
            / F.sqrt(den2.cast("double") / F.col("N").cast("double")),
            6,
        ).alias("z_trend"),
    )


def cochran_armitage_trend_sql(
    rows: str, score_expr: str, outcome_expr: str
) -> str:
    """DuckDB twin of :func:`cochran_armitage_trend` (HUGEINT-exact
    products, identical double expression sequence)."""
    return f"""
    WITH per AS (
      SELECT CAST({score_expr} AS BIGINT) AS s,
             count(*) AS n,
             sum(CAST({outcome_expr} AS INT)) AS r
      FROM {rows} GROUP BY 1
    ),
    sums AS (
      SELECT CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS N,
             CAST(sum(CAST(r AS HUGEINT)) AS HUGEINT) AS R,
             CAST(sum(CAST(s * r AS HUGEINT)) AS HUGEINT) AS A,
             CAST(sum(CAST(s * n AS HUGEINT)) AS HUGEINT) AS B,
             CAST(sum(CAST(s * s * n AS HUGEINT)) AS HUGEINT) AS C
      FROM per
    )
    SELECT CAST(N AS BIGINT) AS n_total,
           CAST(R AS BIGINT) AS n_events,
           ROUND(
             CAST(N * A - R * B AS DOUBLE)
             / sqrt(CAST(R * (N - R) * (N * C - B * B) AS DOUBLE)
                    / CAST(N AS DOUBLE)),
             6
           ) AS z_trend
    FROM sums
    """


def mantel_haenszel_or(
    df: DataFrame,
    stratum: Column,
    exposed: Column,
    outcome: Column,
) -> DataFrame:
    """Mantel-Haenszel common odds ratio across per-stratum 2x2
    tables, next to the crude (collapsed) odds ratio — the classic
    confounding readout (Simpson's-paradox guard, the q232 theme at
    the odds-ratio level).

    OR_MH = Σ_i (a_i·d_i / n_i) / Σ_i (b_i·c_i / n_i); each rational
    term is ROUND-9 into DECIMAL(38,9) before the exact sum (srm
    rule), the final ratio is one ROUND-6 double.

    Output: one row ``(n_strata, n_rows, or_crude, or_mh)``.
    """
    cells = df.select(
        stratum.alias("st"),
        exposed.cast("int").alias("e"),
        outcome.cast("int").alias("y"),
    ).groupBy("st").agg(
        F.sum((F.col("e") * F.col("y"))).cast("bigint").alias("a"),
        F.sum((F.col("e") * (1 - F.col("y")))).cast("bigint").alias("b"),
        F.sum(((1 - F.col("e")) * F.col("y"))).cast("bigint").alias("c"),
        F.sum(((1 - F.col("e")) * (1 - F.col("y"))))
        .cast("bigint")
        .alias("d"),
    )
    n_i = (
        F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ).cast("double")
    r_term = F.round(
        (F.col("a") * F.col("d")).cast("double") / n_i, 9
    ).cast("decimal(38,9)")
    s_term = F.round(
        (F.col("b") * F.col("c")).cast("double") / n_i, 9
    ).cast("decimal(38,9)")
    agg = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .cast("bigint")
        .alias("n_rows"),
        F.sum(_d(F.col("a"))).alias("A"),
        F.sum(_d(F.col("b"))).alias("B"),
        F.sum(_d(F.col("c"))).alias("C"),
        F.sum(_d(F.col("d"))).alias("D"),
        F.sum(r_term).alias("SR"),
        F.sum(s_term).alias("SS"),
    )
    return agg.select(
        "n_strata",
        "n_rows",
        F.round(
            (F.col("A") * F.col("D")).cast("double")
            / (F.col("B") * F.col("C")).cast("double"),
            6,
        ).alias("or_crude"),
        F.round(
            F.col("SR").cast("double") / F.col("SS").cast("double"), 6
        ).alias("or_mh"),
    )


def mantel_haenszel_or_sql(
    rows: str, stratum_expr: str, exposed_expr: str, outcome_expr: str
) -> str:
    """DuckDB twin of :func:`mantel_haenszel_or`."""
    return f"""
    WITH cells AS (
      SELECT {stratum_expr} AS st,
             CAST(sum(e * y) AS BIGINT) AS a,
             CAST(sum(e * (1 - y)) AS BIGINT) AS b,
             CAST(sum((1 - e) * y) AS BIGINT) AS c,
             CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d
      FROM (
        SELECT *,
               CAST({exposed_expr} AS INT) AS e,
               CAST({outcome_expr} AS INT) AS y
        FROM {rows}
      ) GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a + b + c + d) AS BIGINT) AS n_rows,
             CAST(sum(CAST(a AS HUGEINT)) AS HUGEINT) AS A,
             CAST(sum(CAST(b AS HUGEINT)) AS HUGEINT) AS B,
             CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS C,
             CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS D,
             sum(CAST(ROUND(CAST(a * d AS DOUBLE)
                            / CAST(a + b + c + d AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS SR,
             sum(CAST(ROUND(CAST(b * c AS DOUBLE)
                            / CAST(a + b + c + d AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS SS
      FROM cells
    )
    SELECT n_strata, n_rows,
           ROUND(CAST(A * D AS DOUBLE) / CAST(B * C AS DOUBLE), 6)
             AS or_crude,
           ROUND(CAST(SR AS DOUBLE) / CAST(SS AS DOUBLE), 6) AS or_mh
    FROM agg
    """
