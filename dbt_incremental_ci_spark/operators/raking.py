"""Iterative proportional fitting (IPF / raking): calibrate cell
weights of a two-way contingency table to target row and column
margins — the survey-statistics way to reweight a corpus toward a
target (source × language) mix without dropping documents.

Scale shape: the corpus reduces to the (row, col) cell frame in ONE
map-side-combinable hash agg (cells are category-bounded — sources ×
languages — never data-sized); each IPF iteration is two margin
aggregates + two broadcast joins over that bounded frame. The number
of iterations is fixed, so the whole plan is static and the DuckDB
twin unrolls the same scalings as CTEs.

Determinism: weights live on a ROUND-9 DECIMAL(20,9) grid after every
scaling (the srm rule — both engines walk identical numbers), margin
masses are exact DECIMAL sums of n·w, and every ratio is a single
double expression composed identically in both engines.

Public algorithm: Deming & Stephan (1940). No counterpart in the
reference repo; extends the sampling/budget band (q153/q300/q307).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_W = "decimal(20,9)"
# n joins the mass product as DECIMAL(14,0): bigint×decimal(20,9)
# would want precision 41, and Spark's precision-loss adjustment then
# TRUNCATES the product scale to 6 while DuckDB keeps 9 — the masses
# drift in the 7th decimal (measured: 2 cells off at 6dp after 3
# iterations). (14,0)×(20,9) → (35,9), exact in BOTH engines; bound:
# no (row,col) cell may exceed 10^14 documents.
_N = "decimal(14,0)"


def ipf_rake(
    df: DataFrame,
    row_col: str,
    col_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Rake unit weights over the ``(row_col, col_col)`` table toward
    UNIFORM row and column margins (target mass N/K per row category,
    N/L per column category).

    Output: one row per cell —
    ``(row_col, col_col, n, weight, weighted_share)`` with ``weight``
    ROUND-6 and ``weighted_share`` the cell's share of total raked
    mass (ROUND-6).
    """
    cells = (
        df.groupBy(F.col(row_col).alias("__r"), F.col(col_col).alias("__c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("w", F.lit(1).cast(_W))
        .localCheckpoint(eager=False)  # bounded: categories², reused per pass
    )
    tot = cells.agg(
        F.sum("n").cast("double").alias("__N"),
        F.count_distinct("__r").cast("double").alias("__K"),
        F.count_distinct("__c").cast("double").alias("__L"),
    )
    cur = cells.crossJoin(F.broadcast(tot))

    def scale(frame: DataFrame, key: str, target: F.Column) -> DataFrame:
        marg = frame.groupBy(key).agg(
            F.sum(F.col("n").cast(_N) * F.col("w")).alias("__mass")
        )
        return (
            frame.join(F.broadcast(marg), key)
            .withColumn(
                "w",
                F.round(
                    F.col("w").cast("double")
                    * (target / F.col("__mass").cast("double")),
                    9,
                ).cast(_W),
            )
            .drop("__mass")
        )

    for _ in range(iterations):
        # pin between scalings: each margin aggregate re-reads the
        # frame, so unpinned lineage DOUBLES per scaling (the audit
        # measured 129 nested joins for 3 iterations); the pinned
        # frame stays cells-bounded
        cur = scale(cur, "__r", F.col("__N") / F.col("__K")).localCheckpoint(
            eager=False
        )
        cur = scale(cur, "__c", F.col("__N") / F.col("__L")).localCheckpoint(
            eager=False
        )

    total_mass = cur.agg(
        F.sum(F.col("n").cast(_N) * F.col("w")).alias("__T")
    )
    return (
        cur.crossJoin(F.broadcast(total_mass))
        .select(
            F.col("__r").alias(row_col),
            F.col("__c").alias(col_col),
            "n",
            F.round(F.col("w").cast("double"), 6).alias("weight"),
            F.round(
                (F.col("n").cast(_N) * F.col("w")).cast("double")
                / F.col("__T").cast("double"),
                6,
            ).alias("weighted_share"),
        )
    )


def ipf_rake_sql(
    rows: str, row_expr: str, col_expr: str, iterations: int = 3
) -> str:
    """DuckDB twin of :func:`ipf_rake` — the same scalings unrolled as
    CTEs (weights ROUND-9 DECIMAL(20,9) after each, identical ratio
    expressions)."""
    ctes = [
        f"""cells0 AS (
      SELECT {row_expr} AS r, {col_expr} AS c,
             CAST(count(*) AS BIGINT) AS n,
             CAST(1 AS DECIMAL(20,9)) AS w
      FROM {rows} GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS N,
             CAST(count(DISTINCT r) AS DOUBLE) AS K,
             CAST(count(DISTINCT c) AS DOUBLE) AS L
      FROM cells0
    )"""
    ]
    prev = "cells0"
    step = 0
    for _ in range(iterations):
        for key, tgt in (("r", "N / K"), ("c", "N / L")):
            step += 1
            ctes.append(
                f"""m{step} AS (
      SELECT {key}, sum(CAST(n AS DECIMAL(14,0)) * w) AS mass
      FROM {prev} GROUP BY 1
    ),
    cells{step} AS (
      SELECT p.r, p.c, p.n,
             CAST(ROUND(CAST(p.w AS DOUBLE)
                        * ((SELECT {tgt} FROM tot)
                           / CAST(m.mass AS DOUBLE)), 9)
                  AS DECIMAL(20,9)) AS w
      FROM {prev} p JOIN m{step} m USING ({key})
    )"""
            )
            prev = f"cells{step}"
    return f"""
    WITH {",".join(ctes)},
    tmass AS (
      SELECT sum(CAST(n AS DECIMAL(14,0)) * w) AS T FROM {prev}
    )
    SELECT r AS {row_expr}, c AS {col_expr}, n,
           ROUND(CAST(w AS DOUBLE), 6) AS weight,
           ROUND(CAST(CAST(n AS DECIMAL(14,0)) * w AS DOUBLE)
                 / CAST((SELECT T FROM tmass) AS DOUBLE), 6)
             AS weighted_share
    FROM {prev}
    """
