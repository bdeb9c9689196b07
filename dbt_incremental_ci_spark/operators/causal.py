"""Causal-inference hygiene for distributed experiments: covariate
balance (standardized mean difference) and CUPED variance reduction
(Deng, Xu, Kohavi & Walker, WSDM'13 "Improving the Sensitivity of
Online Controlled Experiments by Utilizing Pre-Experiment Data").

Both are pure aggregate pipelines:

- **SMD**: per covariate one conditional power-sum aggregate →
  (mean, var) per arm → SMD = (m_a − m_b)/sqrt((v_a + v_b)/2), the
  standard |SMD| ≤ 0.1 balance rule. One corpus pass for ALL
  covariates (union of single-row aggregates, the expectations.py
  shape).
- **CUPED**: per-unit (pre, post) metric pair, θ = cov(pre, post) /
  var(pre), adjusted = post − θ·(pre − mean(pre)); reports the
  variance reduction (= ρ² by construction) and the raw vs adjusted
  A/B lift. Unit reduction is one keyed aggregate; θ and the
  moments come from decimal-folded power sums — no second pass over
  the corpus, no collect.

Determinism: per-row terms round to fixed dp and fold as DECIMAL
(order-exact); moments are single double expressions over those
exact sums, rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sdec(c: F.Column, dp: int = 6) -> F.Column:
    return F.sum(F.round(c, dp).cast(f"decimal(38,{dp})")).cast("double")


def covariate_balance(
    df: DataFrame,
    variant_col: str,
    covariate_cols: list[str],
    label_a: str = "A",
    label_b: str = "B",
) -> DataFrame:
    """Per-covariate standardized mean difference between arms.

    Output one row per covariate: ``(covariate, n_a, n_b, mean_a,
    mean_b, smd, balanced)`` — balanced ⇔ |SMD| ≤ 0.1 (Austin 2009's
    reporting convention). SMD is NULL when both arm variances are 0.
    """
    outs = []
    for c in covariate_cols:
        is_a = F.col(variant_col) == label_a
        is_b = F.col(variant_col) == label_b
        x = F.col(c).cast("double")
        agg = df.filter(is_a | is_b).agg(
            F.sum(is_a.cast("int")).cast("bigint").alias("n_a"),
            F.sum(is_b.cast("int")).cast("bigint").alias("n_b"),
            _sdec(F.when(is_a, x)).alias("__sa"),
            _sdec(F.when(is_a, x * x), 4).alias("__sa2"),
            _sdec(F.when(is_b, x)).alias("__sb"),
            _sdec(F.when(is_b, x * x), 4).alias("__sb2"),
        )
        na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
        ma = F.col("__sa") / na
        mb = F.col("__sb") / nb
        va = F.col("__sa2") / na - ma * ma
        vb = F.col("__sb2") / nb - mb * mb
        pooled = F.sqrt((va + vb) / 2.0)
        smd = F.when(pooled > 0, F.round((ma - mb) / pooled, 6))
        outs.append(
            agg.select(
                F.lit(c).alias("covariate"),
                "n_a",
                "n_b",
                F.round(ma, 6).alias("mean_a"),
                F.round(mb, 6).alias("mean_b"),
                smd.alias("smd"),
                F.coalesce(F.abs(smd) <= 0.1, F.lit(True)).alias(
                    "balanced"
                ),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def covariate_balance_sql(
    rows: str,
    variant_col: str,
    covariate_cols: list[str],
    label_a: str = "A",
    label_b: str = "B",
) -> str:
    """DuckDB twin of :func:`covariate_balance`."""
    parts = []
    for c in covariate_cols:
        parts.append(f"""
    SELECT '{c}' AS covariate, n_a, n_b,
           ROUND(sa / n_a, 6) AS mean_a,
           ROUND(sb / n_b, 6) AS mean_b,
           CASE WHEN sqrt(((sa2/n_a - (sa/n_a)*(sa/n_a))
                          + (sb2/n_b - (sb/n_b)*(sb/n_b))) / 2.0) > 0
             THEN ROUND((sa/n_a - sb/n_b)
                  / sqrt(((sa2/n_a - (sa/n_a)*(sa/n_a))
                         + (sb2/n_b - (sb/n_b)*(sb/n_b))) / 2.0), 6)
           END AS smd,
           COALESCE(abs(CASE WHEN sqrt(((sa2/n_a - (sa/n_a)*(sa/n_a))
                          + (sb2/n_b - (sb/n_b)*(sb/n_b))) / 2.0) > 0
             THEN ROUND((sa/n_a - sb/n_b)
                  / sqrt(((sa2/n_a - (sa/n_a)*(sa/n_a))
                         + (sb2/n_b - (sb/n_b)*(sb/n_b))) / 2.0), 6)
           END) <= 0.1, TRUE) AS balanced
    FROM (
      SELECT
        CAST(SUM(CASE WHEN {variant_col} = '{label_a}' THEN 1 ELSE 0
             END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN {variant_col} = '{label_b}' THEN 1 ELSE 0
             END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN {variant_col} = '{label_a}'
             THEN CAST(ROUND(CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6))
             END) AS DOUBLE) AS sa,
        CAST(SUM(CASE WHEN {variant_col} = '{label_a}'
             THEN CAST(ROUND(CAST({c} AS DOUBLE)
                             * CAST({c} AS DOUBLE), 4)
                  AS DECIMAL(38,4)) END) AS DOUBLE) AS sa2,
        CAST(SUM(CASE WHEN {variant_col} = '{label_b}'
             THEN CAST(ROUND(CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6))
             END) AS DOUBLE) AS sb,
        CAST(SUM(CASE WHEN {variant_col} = '{label_b}'
             THEN CAST(ROUND(CAST({c} AS DOUBLE)
                             * CAST({c} AS DOUBLE), 4)
                  AS DECIMAL(38,4)) END) AS DOUBLE) AS sb2
      FROM {rows}
      WHERE {variant_col} IN ('{label_a}', '{label_b}')
    )""")
    return " UNION ALL ".join(parts)


def cuped(
    df: DataFrame,
    unit_col: str,
    pre_col: str,
    post_col: str,
    variant_col: str,
    label_a: str = "A",
    label_b: str = "B",
) -> DataFrame:
    """CUPED-adjusted experiment readout from unit-level
    ``(unit, variant, pre, post)`` rows.

    θ is fit on ALL units (the standard pooled estimator — fitting
    per-arm leaks treatment effect into the adjustment); the adjusted
    metric is ``post − θ·(pre − mean(pre))`` and its variance shrinks
    by exactly ρ²(pre, post). Output ONE row: ``(n, theta, var_post,
    var_adjusted, var_reduction_pct, lift_raw, lift_cuped)`` where
    lifts are mean(A) − mean(B) on raw vs adjusted post.
    """
    u = df.filter(F.col(variant_col).isin(label_a, label_b)).select(
        F.col(unit_col).alias("__u"),
        F.col(variant_col).alias("__v"),
        F.col(pre_col).cast("double").alias("__pre"),
        F.col(post_col).cast("double").alias("__post"),
    )
    is_a = F.col("__v") == label_a
    agg = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(is_a.cast("int")).cast("bigint").alias("__na"),
        _sdec(F.col("__pre")).alias("__sp"),
        _sdec(F.col("__post")).alias("__sq"),
        _sdec(F.col("__pre") * F.col("__pre"), 4).alias("__spp"),
        _sdec(F.col("__pre") * F.col("__post"), 4).alias("__spq"),
        _sdec(F.col("__post") * F.col("__post"), 4).alias("__sqq"),
        _sdec(F.when(is_a, F.col("__pre"))).alias("__spa"),
        _sdec(F.when(is_a, F.col("__post"))).alias("__sqa"),
        _sdec(F.when(~is_a, F.col("__pre"))).alias("__spb"),
        _sdec(F.when(~is_a, F.col("__post"))).alias("__sqb"),
    )
    nd = F.col("n").cast("double")
    na = F.col("__na").cast("double")
    nb = nd - na
    mp = F.col("__sp") / nd
    mq = F.col("__sq") / nd
    var_pre = F.col("__spp") / nd - mp * mp
    var_post = F.col("__sqq") / nd - mq * mq
    cov = F.col("__spq") / nd - mp * mq
    theta = F.when(var_pre > 0, cov / var_pre).otherwise(F.lit(0.0))
    var_adj = var_post - F.when(
        var_pre > 0, cov * cov / var_pre
    ).otherwise(F.lit(0.0))
    lift_raw = F.col("__sqa") / na - F.col("__sqb") / nb
    # mean-adjusted lift: the mean(pre) recentering cancels in the
    # difference, so lift_cuped = lift_raw - theta*(mean_pre_a -
    # mean_pre_b)
    lift_cuped = lift_raw - theta * (
        F.col("__spa") / na - F.col("__spb") / nb
    )
    return agg.select(
        "n",
        F.round(theta, 6).alias("theta"),
        F.round(var_post, 6).alias("var_post"),
        F.round(var_adj, 6).alias("var_adjusted"),
        F.round(
            F.when(
                var_post > 0,
                F.lit(100.0) * (F.lit(1.0) - var_adj / var_post),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("var_reduction_pct"),
        F.round(lift_raw, 6).alias("lift_raw"),
        F.round(lift_cuped, 6).alias("lift_cuped"),
    )


def cuped_sql(
    rows: str,
    unit_col: str,
    pre_col: str,
    post_col: str,
    variant_col: str,
    label_a: str = "A",
    label_b: str = "B",
) -> str:
    """DuckDB twin of :func:`cuped`."""
    return f"""
    WITH u AS (
      SELECT {unit_col} AS un, {variant_col} AS v,
             CAST({pre_col} AS DOUBLE) AS pre,
             CAST({post_col} AS DOUBLE) AS post
      FROM {rows}
      WHERE {variant_col} IN ('{label_a}', '{label_b}')
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        SUM(CASE WHEN v = '{label_a}' THEN 1 ELSE 0 END) AS na,
        CAST(SUM(CAST(ROUND(pre, 6) AS DECIMAL(38,6))) AS DOUBLE)
          AS sp,
        CAST(SUM(CAST(ROUND(post, 6) AS DECIMAL(38,6))) AS DOUBLE)
          AS sq,
        CAST(SUM(CAST(ROUND(pre * pre, 4) AS DECIMAL(38,4)))
          AS DOUBLE) AS spp,
        CAST(SUM(CAST(ROUND(pre * post, 4) AS DECIMAL(38,4)))
          AS DOUBLE) AS spq,
        CAST(SUM(CAST(ROUND(post * post, 4) AS DECIMAL(38,4)))
          AS DOUBLE) AS sqq,
        CAST(SUM(CASE WHEN v = '{label_a}'
             THEN CAST(ROUND(pre, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
          AS spa,
        CAST(SUM(CASE WHEN v = '{label_a}'
             THEN CAST(ROUND(post, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
          AS sqa,
        CAST(SUM(CASE WHEN v = '{label_b}'
             THEN CAST(ROUND(pre, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
          AS spb,
        CAST(SUM(CASE WHEN v = '{label_b}'
             THEN CAST(ROUND(post, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
          AS sqb
      FROM u
    ),
    m AS (
      SELECT n, na, CAST(n AS DOUBLE) AS nd, CAST(na AS DOUBLE) AS nad,
             CAST(n - na AS DOUBLE) AS nbd,
             sp / n AS mp, sq / n AS mq,
             spp / n - (sp / n) * (sp / n) AS var_pre,
             sqq / n - (sq / n) * (sq / n) AS var_post,
             spq / n - (sp / n) * (sq / n) AS cov,
             spa, sqa, spb, sqb
      FROM agg
    ),
    fin AS (
      SELECT n,
        CASE WHEN var_pre > 0 THEN cov / var_pre ELSE 0.0 END AS theta,
        var_post,
        var_post - CASE WHEN var_pre > 0 THEN cov * cov / var_pre
                        ELSE 0.0 END AS var_adj,
        sqa / nad - sqb / nbd AS lift_raw,
        (sqa / nad - sqb / nbd)
          - (CASE WHEN var_pre > 0 THEN cov / var_pre ELSE 0.0 END)
            * (spa / nad - spb / nbd) AS lift_cuped
      FROM m
    )
    SELECT n, ROUND(theta, 6) AS theta,
           ROUND(var_post, 6) AS var_post,
           ROUND(var_adj, 6) AS var_adjusted,
           ROUND(CASE WHEN var_post > 0
             THEN 100.0 * (1.0 - var_adj / var_post)
             ELSE 0.0 END, 4) AS var_reduction_pct,
           ROUND(lift_raw, 6) AS lift_raw,
           ROUND(lift_cuped, 6) AS lift_cuped
    FROM fin
    """
