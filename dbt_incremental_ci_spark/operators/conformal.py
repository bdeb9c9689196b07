"""Split-conformal calibration thresholds — distribution-free
prediction intervals (Vovk et al. 2005; Angelopoulos & Bates 2023
tutorial): given a held-out calibration set of nonconformity scores,
the (1−α) conformal quantile is the k-th smallest score with
k = ⌈(1−α)(n+1)⌉; predicting "conforms if score ≤ threshold" then
guarantees ≥ 1−α marginal coverage on exchangeable data. Per-group
thresholds (class-conditional / per-segment conformal) are the
production variant — each group calibrates independently.

Shape: one per-group window (row_number over score with an id
tiebreak) — state bounded by group size — plus a per-group count;
selecting the k-th row is a filter, not a driver-side sort. The small
finite-sample correction (n+1 instead of n) is what distinguishes the
conformal quantile from a naive empirical one; when k > n the
threshold is undefined (NULL → "reject nothing at this α with so few
calibration points"), reported with ``covered`` false.

Determinism: rank ties are broken by the id column on both engines, so
the selected score is unique; all outputs are exact column values.

No counterpart in the reference repo; part of the eval surface
(evalmetrics.py) this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_thresholds(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-group ``(group, n, k, threshold, covered)``: threshold =
    k-th smallest score, k = ceil((1−α)(n+1)); ``covered`` false (and
    threshold NULL) when the group is too small for this α."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(score_col).alias("__s"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(group_col))
        .alias("__n"),
    )
    # exact integer k: ceil((1-a)(n+1)) via the rationalized form used
    # across this repo (setsim._ceil_mul precedent) — (1-a) from its
    # decimal string so 0.9*(n+1) never lands one ULP high
    from fractions import Fraction

    frac = Fraction(str(1.0 - alpha)).limit_denominator(10**9)
    num, den = frac.numerator, frac.denominator
    k = F.expr(f"(({num} * (__n + 1)) + {den - 1}) div {den}")
    ranked = ranked.withColumn("__k", k)
    picked = ranked.filter(F.col("__rn") == F.col("__k")).select(
        "grp",
        F.col("__n").alias("n"),
        F.col("__k").alias("k"),
        F.col("__s").alias("threshold"),
    )
    # groups where k > n have no picked row: re-attach via the group
    # spine so they surface with covered = false
    spine = ranked.groupBy("grp").agg(
        F.first("__n").alias("n"), F.first("__k").alias("k")
    )
    return (
        spine.join(picked.select("grp", "threshold"), "grp", "left")
        .select(
            F.col("grp"),
            F.col("n").cast("bigint").alias("n"),
            F.col("k").cast("bigint").alias("k"),
            F.col("threshold"),
            (F.col("k") <= F.col("n")).alias("covered"),
        )
    )


def conformal_thresholds_sql(
    table: str,
    group_expr: str,
    score_expr: str,
    id_expr: str,
    alpha: float = 0.1,
) -> str:
    """DuckDB twin of :func:`conformal_thresholds` (same integer k)."""
    from fractions import Fraction

    frac = Fraction(str(1.0 - alpha)).limit_denominator(10**9)
    num, den = frac.numerator, frac.denominator
    return f"""
    WITH ranked AS (
      SELECT {group_expr} AS grp,
             {score_expr} AS s,
             row_number() OVER (PARTITION BY {group_expr}
                                ORDER BY {score_expr} ASC, {id_expr} ASC)
               AS rn,
             count(*) OVER (PARTITION BY {group_expr}) AS n
      FROM {table}
    ),
    keyed AS (
      SELECT *, (({num} * (n + 1)) + {den - 1}) // {den} AS k FROM ranked
    ),
    spine AS (SELECT grp, min(n) AS n, min(k) AS k FROM keyed GROUP BY grp),
    picked AS (SELECT grp, s AS threshold FROM keyed WHERE rn = k)
    SELECT sp.grp,
           CAST(sp.n AS BIGINT) AS n,
           CAST(sp.k AS BIGINT) AS k,
           p.threshold,
           sp.k <= sp.n AS covered
    FROM spine sp LEFT JOIN picked p ON sp.grp = p.grp
    """
