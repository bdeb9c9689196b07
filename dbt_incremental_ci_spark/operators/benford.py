"""Benford's-law first-digit audit — the classic anomaly screen for
"organically grown" numeric columns (amounts, populations, counts):
the leading significant digit d of natural multiplicative data follows
P(d) = log10(1 + 1/d) (Newcomb 1881; Benford 1938), and fabricated or
truncated data visibly doesn't. Standard forensic-accounting /
data-quality check; here it audits measure columns before a corpus
ships.

Shape: one map-side expression extracts the first significant digit
(|x| scaled into [1, 10) — digit = floor(|x| / 10^floor(log10|x|))),
one 9-row hash aggregate counts digits, and a 9-row spine join fills
absent digits with zero. The chi-square statistic against the Benford
expectation is a sum over 9 rows. Zero/NULL values carry no leading
digit and are excluded (reported via ``n_skipped`` in the companion
summary).

Determinism: counts are exact integers; expected probabilities are the
same IEEE log10 doubles in Spark and DuckDB; ratios/statistics are
rounded to 6.

No counterpart in the reference repo; part of the data-quality surface
(expectations.py, profiling.py) this engine adds on top.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """Per-digit audit rows ``(digit, n, observed_p, expected_p,
    chi_term)`` for digits 1..9, ordered by digit; ``chi_term`` is the
    per-digit chi-square contribution n_total·(o−e)²/e."""
    x = F.abs(F.col(value_col).cast("double"))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counted = (
        df.filter(x > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    tot = counted.agg(F.sum("n").alias("__t"))
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs_p = F.col("n") / F.col("__t").cast("double")
    return (
        spine.join(counted, "digit", "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs_p, 6).alias("observed_p"),
            F.round(exp_p, 6).alias("expected_p"),
            F.round(
                F.col("__t") * F.pow(obs_p - exp_p, F.lit(2.0)) / exp_p, 6
            ).alias("chi_term"),
        )
        .orderBy("digit")
    )


def benford_first_digit_sql(table: str, value_col: str) -> str:
    """DuckDB twin of :func:`benford_first_digit`."""
    x = f"abs(CAST({value_col} AS DOUBLE))"
    return f"""
    WITH counted AS (
      SELECT CAST(floor({x} / pow(10.0, floor(log10({x})))) AS INT) AS digit,
             count(*) AS n
      FROM {table} WHERE {x} > 0 GROUP BY 1
    ),
    spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
    tot AS (SELECT sum(n) AS t FROM counted)
    SELECT CAST(s.digit AS INT) AS digit,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           ROUND(COALESCE(c.n, 0) / CAST(t AS DOUBLE), 6) AS observed_p,
           ROUND(log10(1.0 + 1.0 / s.digit), 6) AS expected_p,
           ROUND(t * pow(COALESCE(c.n, 0) / CAST(t AS DOUBLE)
                         - log10(1.0 + 1.0 / s.digit), 2)
                   / log10(1.0 + 1.0 / s.digit), 6) AS chi_term
    FROM spine s LEFT JOIN counted c ON s.digit = c.digit
    CROSS JOIN tot
    ORDER BY s.digit
    """


# two-sided 95% critical value for chi-square with 8 degrees of freedom
CHI2_8DF_95 = 15.50731305586545


def benford_summary(audit: DataFrame) -> DataFrame:
    """One-row verdict over a :func:`benford_first_digit` frame:
    ``(n_total, chi_square, conforms)`` at the 8-df 95% critical
    value."""
    chi = F.sum("chi_term")
    return audit.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.round(chi, 6).alias("chi_square"),
        (chi < F.lit(CHI2_8DF_95)).alias("conforms"),
    )


def _benford_expected(digit: int) -> float:
    return math.log10(1.0 + 1.0 / digit)
