"""Distribution-concentration / inequality measures per group —
the corpus-composition monitors a training-data pipeline runs over
source/domain/author mixes: a handful of domains dominating the token
budget (high Gini / HHI, low entropy) is the classic pretraining-mix
failure mode, and these three statistics are the standard way to
gate it.

- :func:`group_concentration` — per-group Gini coefficient of a
  value column (rank-weighted exact-decimal form), Herfindahl-
  Hirschman index (sum of squared shares), and Shannon entropy of
  the share distribution (+ the normalized evenness ratio).

The reference engine has no counterpart (its workload is dbt-model
SQL — SURVEY.md §2); this extends the engine for the pipeline
charter, next to the drift family (``drift.py``) and the token-budget
mixer (``sampling.py``).

Scale design: one member-keyed pre-aggregate (map-side combined),
then a per-group window sort for the Gini rank — in-partition sort
after a group-keyed shuffle, never global — and a final per-group
fold. Rank-weighted sums run in exact DECIMAL arithmetic
(``i * x`` with x in decimal micro-units), so the fold is
order-exact and the single float division at the end is
deterministic cross-engine. HHI / entropy terms are rounded to 12 dp
and summed as DECIMAL(26,12) — same order-exact pattern. Ties in
the Gini sort need no tiebreaker for the VALUE (swapping equal x's
leaves sum(i*x) unchanged) but carry one anyway so the physical plan
is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_concentration(
    df: DataFrame,
    group_col: str,
    member_col: str,
    value_col: str,
) -> DataFrame:
    """Per ``group_col``: Gini, HHI, and Shannon entropy of how
    ``value_col`` (summed per ``member_col``) is distributed across
    members. Output: ``(group, n_members, total, gini, hhi,
    entropy, evenness)`` — entropy in nats; evenness = entropy /
    ln(n_members) (NULL for single-member groups); gini of the
    n=1 group is 0 by convention.

    ``value_col`` must be non-negative; values are summed per member
    as DECIMAL(18,2) (exact), so shares and rank-weights derive from
    exact numerators/denominators.
    """
    per = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(member_col).alias("__m"),
    ).agg(F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__x"))
    w = Window.partitionBy("grp").orderBy(
        F.col("__x").asc(), F.col("__m").asc()
    )
    ranked = per.select(
        "grp",
        "__x",
        F.row_number().over(w).alias("__i"),
    )
    # per-member share terms against the group total: two-pass via a
    # group-keyed totals join (groups-sized, AQE-broadcastable)
    tot = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("__x").alias("__tot"),
    ).where(F.col("__tot") > 0)
    # ^ zero-total groups drop: their shares are 0/0, which Spark
    # nulls and DuckDB infs — no meaningful concentration exists for
    # an all-zero distribution anyway
    j = ranked.join(tot, "grp")
    p = F.col("__x").cast("double") / F.col("__tot").cast("double")
    hterm = F.round(p * p, 12).cast("decimal(26,12)")
    eterm = F.when(
        p > 0, F.round(-p * F.log(p), 12)
    ).otherwise(F.lit(0.0)).cast("decimal(26,12)")
    # Gini rank weight: i * x is exact decimal (i integer, x decimal)
    iw = (F.col("__i").cast("decimal(18,0)") * F.col("__x")).cast(
        "decimal(38,2)"
    )
    agg = j.groupBy("grp").agg(
        F.first("n_members").alias("n_members"),
        F.first("__tot").alias("__tot"),
        F.sum(iw).alias("__siw"),
        F.sum(hterm).alias("__hhi"),
        F.sum(eterm).alias("__ent"),
    )
    n = F.col("n_members").cast("double")
    gini = F.when(
        (F.col("n_members") > 1) & (F.col("__tot") > 0),
        (F.lit(2.0) * F.col("__siw").cast("double"))
        / (n * F.col("__tot").cast("double"))
        - (n + 1) / n,
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("grp").alias(group_col),
        "n_members",
        F.col("__tot").cast("double").alias("total"),
        F.round(gini, 6).alias("gini"),
        F.round(F.col("__hhi").cast("double"), 6).alias("hhi"),
        F.round(F.col("__ent").cast("double"), 6).alias("entropy"),
        F.round(
            F.when(
                F.col("n_members") > 1,
                F.col("__ent").cast("double") / F.log(n),
            ),
            6,
        ).alias("evenness"),
    )


def group_concentration_sql(
    rows: str,
    group_col: str,
    member_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`group_concentration`; ``rows`` is a
    parenthesized row-set subquery."""
    return f"""
    WITH per AS (
      SELECT {group_col} AS grp, {member_col} AS m,
             sum(CAST({value_col} AS DECIMAL(18,2))) AS x
      FROM {rows} GROUP BY 1, 2
    ),
    ranked AS (
      SELECT grp, x,
             row_number() OVER (PARTITION BY grp
               ORDER BY x ASC, m ASC) AS i
      FROM per
    ),
    tot AS (
      SELECT grp, count(*) AS n_members, sum(x) AS tot
      FROM ranked GROUP BY grp
      HAVING sum(x) > 0
    ),
    terms AS (
      SELECT r.grp, t.n_members, t.tot,
             CAST(r.i AS DECIMAL(18,0)) * r.x AS iw,
             CAST(ROUND((CAST(r.x AS DOUBLE) / CAST(t.tot AS DOUBLE))
                 * (CAST(r.x AS DOUBLE) / CAST(t.tot AS DOUBLE)),
               12) AS DECIMAL(26,12)) AS hterm,
             CAST(CASE WHEN r.x > 0 THEN
               ROUND(-(CAST(r.x AS DOUBLE) / CAST(t.tot AS DOUBLE))
                 * ln(CAST(r.x AS DOUBLE) / CAST(t.tot AS DOUBLE)), 12)
               ELSE 0.0 END AS DECIMAL(26,12)) AS eterm
      FROM ranked r JOIN tot t ON r.grp = t.grp
    ),
    agg AS (
      SELECT grp, any_value(n_members) AS n_members,
             any_value(tot) AS tot,
             sum(iw) AS siw, sum(hterm) AS hhi, sum(eterm) AS ent
      FROM terms GROUP BY grp
    )
    SELECT grp AS {group_col}, n_members,
           CAST(tot AS DOUBLE) AS total,
           ROUND(CASE WHEN n_members > 1 AND tot > 0 THEN
                 (2.0 * CAST(siw AS DOUBLE))
                   / (CAST(n_members AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n_members AS DOUBLE) + 1)
                   / CAST(n_members AS DOUBLE)
                 ELSE 0.0 END, 6) AS gini,
           ROUND(CAST(hhi AS DOUBLE), 6) AS hhi,
           ROUND(CAST(ent AS DOUBLE), 6) AS entropy,
           ROUND(CASE WHEN n_members > 1 THEN
                 CAST(ent AS DOUBLE) / ln(CAST(n_members AS DOUBLE))
                 END, 6) AS evenness
    FROM agg
    """
