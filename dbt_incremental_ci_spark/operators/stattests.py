"""Classical hypothesis tests and effect sizes as distributed
aggregates: Kruskal-Wallis H, one-way ANOVA F (+ the Brown-Forsythe /
Levene variance-homogeneity variant built on it), Cohen's d /
Hedges' g / Cliff's delta, and Spearman rank correlation.

The reference has no statistics surface (its models stop at
means/stddev — SURVEY.md §2 A8); this extends the engine's
experimentation stack (two-proportion z `evalmetrics.py`,
Mann-Whitney U / KS / PSI `drift.py`, log-rank `survival.py`) with
the remaining staples an A/B readout or data-drift audit needs when
there are MORE than two groups or when effect size, not significance,
is the question.

Public formulas: Kruskal & Wallis 1952 (tie-corrected H); Fisher's
one-way ANOVA; Brown & Forsythe 1974 (median-centered Levene);
Cohen 1988 / Hedges 1981 (standardized mean difference); Cliff 1993
(ordinal dominance delta = 2U/(n1·n2) − 1); Spearman 1904 (Pearson
correlation of midranks).

Scale design (the 100 TB story — shared by every function here):

- NOTHING ranks rows globally. Rank statistics reduce the corpus to
  ONE hash aggregate keyed by distinct (quantized) value — the
  ROC-AUC / Mann-Whitney shape (`drift.py:333`) — then
  :func:`~.packing.global_cumsum` turns distinct-value counts into
  rank offsets with partition-parallel windows. Cost is O(distinct
  values), not O(rows), after a map-side-combinable aggregate.
- Moment statistics (ANOVA, effect sizes) are per-group
  (n, Σx, Σx²) folds — map-side combine, O(groups) result rows.
- Determinism is the house standard: inputs quantize to DECIMAL
  (exact in any summation order), per-group terms that need a
  division round-6 into DECIMAL before the cross-group sum (the
  `evalmetrics.srm_check` ROUND-term precedent), exact integer
  ratios round half-up IN INTEGER SPACE (`association.py:149`),
  and only the final scalar expressions run in (IEEE-identical)
  double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D380 = "decimal(38,0)"


def _micro6(num: str, den: str) -> F.Column:
    """Exact half-up 6-dp rounding of the nonnegative integer ratio
    ``num/den`` in integer space (the q233 rule, association.py:149).
    Assumes ``num * 2e6 < 2^63``; callers document their bound."""
    return (
        F.expr(f"CAST(({num} * 2000000 + {den}) DIV ({den} * 2) AS BIGINT)")
        .cast("double")
        / 1_000_000.0
    )


# ---------------------------------------------------------------------
# Kruskal-Wallis H (k-sample rank test)
# ---------------------------------------------------------------------


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    decimals: int = 6,
    chi2_crit: float | None = None,
) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H over ``group_col`` samples of
    ``value_col`` — "did ANY of the k distributions move", the
    k-sample generalization of Mann-Whitney.

    Shape: one hash aggregate to (value, group) counts (distinct
    quantized values × groups, not rows), value-marginal counts feed
    :func:`~.packing.global_cumsum` for rank offsets, then an
    O(groups) reduce. Rank arithmetic stays exact: 2·avg_rank is an
    integer, per-group rank sums fold as DECIMAL(38,0), and the one
    division each group needs (S2_g²/n_g) is rounded to 6 dp into
    DECIMAL(38,6) before the cross-group sum (srm_check precedent) so
    group iteration order cannot flake the total.

    ``chi2_crit``: optional chi-square critical value for df = k−1
    (caller-supplied, like ``srm_check`` — no CDF inversion in-plan);
    adds a ``reject`` boolean when given.

    Output ONE row: ``(n_total, n_groups, h_stat, tie_correction,
    h_corrected[, reject])``.
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    v = F.round(F.col(value_col).cast("double"), decimals)
    vg = (
        df.select(v.alias("__v"), F.col(group_col).alias("__g"))
        .groupBy("__v", "__g")
        .agg(F.count(F.lit(1)).alias("__cvg"))
        .localCheckpoint(eager=False)  # marginals + join both read it
    )
    marg = vg.groupBy("__v").agg(F.sum("__cvg").alias("__cnt"))
    c = global_cumsum(marg, "__v", "__cnt", out_col="__cum")
    two_rank = 2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1
    ranked = vg.join(c.select("__v", two_rank.alias("__2r")), "__v")
    per_g = ranked.groupBy("__g").agg(
        F.sum("__cvg").alias("__ng"),
        F.sum((F.col("__cvg") * F.col("__2r")).cast(_D380)).alias("__s2"),
    )
    # S2_g²/n_g: exact decimal square cast to double (identical
    # round-to-nearest in both engines), one IEEE division, then a
    # DIRECT decimal cast — never ROUND(double): at term magnitudes
    # where ulp > 1e-6 the two engines' ROUND algorithms (BigDecimal
    # HALF_UP vs scaled-double nearbyint) flip ulps, while a cast
    # rounds the identical exact binary value in both (q265 lesson)
    term = (
        (F.col("__s2") * F.col("__s2")).cast("double") / F.col("__ng")
    ).cast("decimal(38,6)")
    cnt_dec = F.col("__cnt").cast(_D380)
    ties = marg.agg(
        F.sum(cnt_dec * cnt_dec * cnt_dec - cnt_dec).alias("__t3t")
    )
    tot = per_g.agg(
        F.sum("__ng").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(term).alias("__terms"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n_total").cast("double")
    h = (
        F.lit(3.0) * F.col("__terms").cast("double") / (n * (n + 1.0))
        - 3.0 * (n + 1.0)
    )
    corr = F.lit(1.0) - F.col("__t3t").cast("double") / (n * n * n - n)
    h_c = F.when(corr > 0, h / corr)
    out = tot.select(
        "n_total",
        "n_groups",
        F.round(h, 6).alias("h_stat"),
        F.round(corr, 6).alias("tie_correction"),
        F.round(h_c, 6).alias("h_corrected"),
    )
    if chi2_crit is not None:
        out = out.withColumn("reject", F.col("h_corrected") >= chi2_crit)
    return out


def kruskal_wallis_sql(
    rows: str,
    value_col: str,
    group_col: str,
    decimals: int = 6,
    chi2_crit: float | None = None,
) -> str:
    """DuckDB twin of :func:`kruskal_wallis` (plain window cumsum)."""
    reject = (
        f", h_corrected >= {chi2_crit!r} AS reject" if chi2_crit is not None
        else ""
    )
    return f"""
    WITH vg AS (
      SELECT ROUND(CAST({value_col} AS DOUBLE), {decimals}) AS v,
             {group_col} AS g, count(*) AS cvg
      FROM {rows} GROUP BY 1, 2
    ),
    marg AS (SELECT v, SUM(cvg) AS cnt FROM vg GROUP BY v),
    c AS (
      SELECT *, SUM(cnt) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM marg
    ),
    ranked AS (
      SELECT vg.g, vg.cvg,
             2 * (c.cum - c.cnt) + c.cnt + 1 AS two_rank
      FROM vg JOIN c ON vg.v = c.v
    ),
    per_g AS (
      SELECT g, SUM(cvg) AS ng,
             SUM(CAST(cvg * two_rank AS HUGEINT)) AS s2
      FROM ranked GROUP BY g
    ),
    ties AS (
      SELECT SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS t3t FROM marg
    ),
    tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             SUM(CAST(CAST(s2 * s2 AS DOUBLE) / ng
                      AS DECIMAL(38,6))) AS terms
      FROM per_g
    ),
    fin AS (
      SELECT n_total, n_groups,
             3.0 * CAST(terms AS DOUBLE)
               / (CAST(n_total AS DOUBLE) * (n_total + 1.0))
               - 3.0 * (n_total + 1.0) AS h,
             1.0 - CAST(t3t AS DOUBLE)
               / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)
               AS corr
      FROM tot, ties
    )
    SELECT n_total, n_groups, ROUND(h, 6) AS h_stat,
           ROUND(corr, 6) AS tie_correction,
           ROUND(CASE WHEN corr > 0 THEN h / corr END, 6) AS h_corrected
           {reject}
    FROM fin
    """


# ---------------------------------------------------------------------
# One-way ANOVA F (and the Brown-Forsythe variant via caller prep)
# ---------------------------------------------------------------------


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 2,
) -> DataFrame:
    """One-way ANOVA F statistic over ``group_col`` samples.

    Shape: ONE per-group (n, Σx, Σx²) hash aggregate (map-side
    combine), then an O(groups) reduce — the corpus is touched once.
    Inputs quantize to DECIMAL(18,scale) so the sums are exact in any
    partition order; the per-group division T_g²/n_g rounds to 6 dp
    into DECIMAL(38,6) before the cross-group sum (srm_check
    precedent); everything after is one double expression.

    Brown-Forsythe / Levene: prepare ``value_col`` as the absolute
    deviation from the group median and call this — the workload's
    q266 does exactly that.

    Output ONE row: ``(n_total, n_groups, f_stat, eta_squared)`` —
    only O(1)-magnitude scalars. Raw SSB/SSW at corpus magnitude are
    deliberately NOT emitted: their double ulp exceeds any useful
    rounding grid, so no cross-engine representation of them is
    hash-stable (the q265 lesson); F and η² carry the same
    information scale-free.
    """
    xd = F.col(value_col).cast(f"decimal(18,{scale})")
    per_g = (
        df.select(F.col(group_col).alias("__g"), xd.alias("__x"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__ng"),
            F.sum("__x").alias("__t"),
            F.sum(F.col("__x") * F.col("__x")).alias("__q"),
        )
    )
    t_dbl = F.col("__t").cast("double")
    # direct decimal cast, never ROUND(double) — see kruskal_wallis
    term = (t_dbl * t_dbl / F.col("__ng")).cast("decimal(38,6)")
    tot = per_g.agg(
        F.sum("__ng").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("__t").alias("__tt"),
        F.sum("__q").alias("__qq"),
        F.sum(term).alias("__b"),
    )
    n = F.col("n_total").cast("double")
    k = F.col("n_groups").cast("double")
    tt = F.col("__tt").cast("double")
    b = F.col("__b").cast("double")
    ssb = b - tt * tt / n
    ssw = F.col("__qq").cast("double") - b
    f_stat = F.when(
        (F.col("n_groups") > 1) & (F.col("n_total") > F.col("n_groups"))
        & (ssw > 0),
        (ssb / (k - 1.0)) / (ssw / (n - k)),
    )
    eta_sq = F.when(ssb + ssw > 0, ssb / (ssb + ssw))
    return tot.select(
        "n_total",
        "n_groups",
        F.round(f_stat, 6).alias("f_stat"),
        F.round(eta_sq, 6).alias("eta_squared"),
    )


def anova_oneway_sql(
    rows: str, value_col: str, group_col: str, scale: int = 2
) -> str:
    """DuckDB twin of :func:`anova_oneway`."""
    return f"""
    WITH per_g AS (
      SELECT {group_col} AS g, count(*) AS ng,
             SUM(CAST({value_col} AS DECIMAL(18,{scale}))) AS t,
             SUM(CAST({value_col} AS DECIMAL(18,{scale}))
                 * CAST({value_col} AS DECIMAL(18,{scale}))) AS q
      FROM {rows} GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(t) AS DOUBLE) AS tt,
             CAST(SUM(q) AS DOUBLE) AS qq,
             CAST(SUM(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / ng
                           AS DECIMAL(38,6)))
                  AS DOUBLE) AS b
      FROM per_g
    ),
    ss AS (
      SELECT n_total, n_groups,
             b - tt * tt / n_total AS ssb, qq - b AS ssw
      FROM tot
    )
    SELECT n_total, n_groups,
           ROUND(CASE WHEN n_groups > 1 AND n_total > n_groups
                       AND ssw > 0
                      THEN (ssb / (n_groups - 1.0))
                           / (ssw / (n_total - n_groups))
                 END, 6) AS f_stat,
           ROUND(CASE WHEN ssb + ssw > 0 THEN ssb / (ssb + ssw) END, 6)
             AS eta_squared
    FROM ss
    """


# ---------------------------------------------------------------------
# Effect sizes: Cohen's d / Hedges' g / Cliff's delta
# ---------------------------------------------------------------------


def effect_sizes(
    df: DataFrame,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    decimals: int = 6,
) -> DataFrame:
    """Standardized effect sizes for the A-vs-B comparison the z/U
    tests only grade for significance: Cohen's d (pooled-SD mean
    difference), Hedges' g (small-sample-corrected d), and Cliff's
    delta (ordinal dominance, δ = 2U/(n_a·n_b) − 1 — the
    Mann-Whitney U re-expressed as an effect size, robust to any
    monotone transform).

    Shape: the moment half is one per-group (n, Σx, Σx²) fold; the
    rank half is the Mann-Whitney distinct-value machinery
    (`drift.py:333`) — one value-keyed aggregate + global_cumsum, so
    U is exact (2U is an integer in DECIMAL(38,0)). Cliff's delta
    rounds IN INTEGER SPACE: δ+1 = 2U/(n_a·n_b) is a nonnegative
    exact rational, half-up 6 dp via the q233 DIV rule — valid while
    2U·2e6 < 2^63, i.e. n_a·n_b < 4.6e12 (documented bound; a 100 TB
    run lifts the micro arithmetic to DECIMAL(38,0)).

    Output ONE row: ``(n_a, n_b, mean_a, mean_b, pooled_sd,
    cohens_d, hedges_g, cliffs_delta)``.
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    v = F.round(F.col(value_col).cast("double"), decimals)
    base = df.filter(F.col(group_col).isin(label_a, label_b)).select(
        v.alias("__v"),
        (F.col(group_col) == label_a).cast("int").alias("__a"),
    )
    # DECIMAL(18,6) inputs: the square is (37,12) — exact, inside both
    # engines' 38-digit width. The 0/1 indicator gates via CASE (a
    # decimal×int product would widen past 38 and silently rescale).
    vd = F.col("__v").cast("decimal(18,6)")
    sq = (vd * vd).cast("decimal(37,12)")
    zero6 = F.lit(0).cast("decimal(18,6)")
    zero12 = F.lit(0).cast("decimal(37,12)")
    is_a = F.col("__a") == 1
    g = (
        base.groupBy("__v")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__a").alias("__ca"),
            F.sum(F.when(is_a, vd).otherwise(zero6)).alias("__ta"),
            F.sum(F.when(~is_a, vd).otherwise(zero6)).alias("__tb"),
            F.sum(F.when(is_a, sq).otherwise(zero12)).alias("__qa"),
            F.sum(F.when(~is_a, sq).otherwise(zero12)).alias("__qb"),
        )
        .localCheckpoint(eager=False)
    )
    c = global_cumsum(g, "__v", "__cnt", out_col="__cum")
    two_rank = 2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1
    tot = c.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        (F.sum("__cnt") - F.sum("__ca")).cast("bigint").alias("n_b"),
        F.sum("__ta").alias("__sa"),
        F.sum("__tb").alias("__sb"),
        F.sum("__qa").alias("__qqa"),
        F.sum("__qb").alias("__qqb"),
        F.sum((F.col("__ca") * two_rank).cast(_D380)).alias("__2ra"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    ma, mb = sa / na, sb / nb
    va = (F.col("__qqa").cast("double") - sa * sa / na) / (na - 1.0)
    vb = (F.col("__qqb").cast("double") - sb * sb / nb) / (nb - 1.0)
    sp = F.sqrt(((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0))
    d = F.when(sp > 0, (ma - mb) / sp)
    g_corr = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
    # 2U_a = 2R_a − n_a(n_a+1), exact integer in DECIMAL(38,0)
    two_u = F.expr(
        "CAST(__2ra AS DECIMAL(38,0)) "
        "- CAST(n_a AS DECIMAL(38,0)) * (CAST(n_a AS DECIMAL(38,0)) + 1)"
    )
    staged = tot.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(sp, 6).alias("pooled_sd"),
        F.round(d, 6).alias("cohens_d"),
        F.round(g_corr, 6).alias("hedges_g"),
        two_u.cast("bigint").alias("__u2"),
        (F.col("n_a") * F.col("n_b")).cast("bigint").alias("__nn"),
    )
    delta = _micro6("__u2", "__nn") - 1.0
    return staged.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "pooled_sd",
        "cohens_d",
        "hedges_g",
        F.round(delta, 6).alias("cliffs_delta"),
    )


def effect_sizes_sql(
    rows: str,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    decimals: int = 6,
) -> str:
    """DuckDB twin of :func:`effect_sizes`."""
    return f"""
    WITH base AS (
      SELECT ROUND(CAST({value_col} AS DOUBLE), {decimals}) AS v,
             CASE WHEN {group_col} = '{label_a}' THEN 1 ELSE 0 END AS a
      FROM {rows}
      WHERE {group_col} IN ('{label_a}', '{label_b}')
    ),
    g AS (
      SELECT v, count(*) AS cnt, SUM(a) AS ca,
             SUM(CASE WHEN a = 1 THEN CAST(v AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS ta,
             SUM(CASE WHEN a = 0 THEN CAST(v AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS tb,
             SUM(CASE WHEN a = 1 THEN CAST(CAST(v AS DECIMAL(18,6))
                        * CAST(v AS DECIMAL(18,6)) AS DECIMAL(37,12))
                      ELSE CAST(0 AS DECIMAL(37,12)) END) AS qa,
             SUM(CASE WHEN a = 0 THEN CAST(CAST(v AS DECIMAL(18,6))
                        * CAST(v AS DECIMAL(18,6)) AS DECIMAL(37,12))
                      ELSE CAST(0 AS DECIMAL(37,12)) END) AS qb
      FROM base GROUP BY v
    ),
    c AS (
      SELECT *, SUM(cnt) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cnt) - SUM(ca) AS BIGINT) AS n_b,
             CAST(SUM(ta) AS DOUBLE) AS sa, CAST(SUM(tb) AS DOUBLE) AS sb,
             CAST(SUM(qa) AS DOUBLE) AS qqa,
             CAST(SUM(qb) AS DOUBLE) AS qqb,
             SUM(CAST(ca * (2 * (cum - cnt) + cnt + 1)
                      AS HUGEINT)) AS r2a
      FROM c
    ),
    eff AS (
      SELECT n_a, n_b,
             sa / n_a AS ma, sb / n_b AS mb,
             sqrt(((n_a - 1.0) * ((qqa - sa * sa / n_a) / (n_a - 1.0))
                   + (n_b - 1.0) * ((qqb - sb * sb / n_b) / (n_b - 1.0)))
                  / (n_a + n_b - 2.0)) AS sp,
             CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2,
             CAST(n_a AS BIGINT) * n_b AS nn
      FROM tot
    )
    SELECT n_a, n_b,
           ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND(sp, 6) AS pooled_sd,
           ROUND(CASE WHEN sp > 0 THEN (ma - mb) / sp END, 6) AS cohens_d,
           ROUND(CASE WHEN sp > 0 THEN (ma - mb) / sp END
                 * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)), 6) AS hedges_g,
           ROUND(CAST(CAST((u2 * 2000000 + nn) // (nn * 2) AS BIGINT)
                      AS DOUBLE) / 1000000.0 - 1.0, 6) AS cliffs_delta
    FROM eff
    """


# ---------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------


def spearman_rho(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation of two INTEGER-valued columns —
    Pearson correlation of tie-averaged midranks, the monotone-
    association answer when the relationship isn't linear (heavy-
    tailed spend vs activity counts, score-vs-score agreement).

    Shape: each variable independently reduces to distinct-value
    counts + :func:`~.packing.global_cumsum` (never a global row
    sort), midranks join back by value, and the correlation runs on
    the EXACT integer 2·midranks with the `degree_assortativity`
    DECIMAL(38,0) sum pattern — n·Σxy − Σx·Σy products stay exact and
    only the final quotient is double. Bit-identical on any
    partitioning; columns must be integral (quantize upstream).

    Output ONE row: ``(n, spearman_rho)`` (6 dp; NULL on degenerate
    variance).
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    def midranks(col: str, out: str) -> DataFrame:
        g = (
            df.select(F.col(col).cast("bigint").alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        c = global_cumsum(g, "__v", "__cnt", out_col="__cum")
        two_rank = (
            2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1
        )
        return c.select(
            F.col("__v").alias(col), two_rank.alias(out)
        )

    rx = midranks(x_col, "__2rx")
    ry = midranks(y_col, "__2ry")
    paired = (
        df.select(
            F.col(x_col).cast("bigint").alias(x_col),
            F.col(y_col).cast("bigint").alias(y_col),
        )
        .join(rx, x_col)
        .join(ry, y_col)
    )
    agg = paired.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__2rx").cast(_D380)).alias("__sx"),
        F.sum(F.col("__2ry").cast(_D380)).alias("__sy"),
        F.sum(
            (F.col("__2rx") * F.col("__2ry")).cast(_D380)
        ).alias("__sxy"),
        F.sum((F.col("__2rx") * F.col("__2rx")).cast(_D380)).alias("__sxx"),
        F.sum((F.col("__2ry") * F.col("__2ry")).cast(_D380)).alias("__syy"),
    )

    def dd(c: F.Column) -> F.Column:
        return c.cast(_D380)

    cov = (dd(F.col("__n")) * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (dd(F.col("__n")) * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (dd(F.col("__n")) * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    return agg.select(
        F.col("__n").cast("bigint").alias("n"),
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)).alias(
            "spearman_rho"
        ),
    )


def spearman_rho_sql(rows: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`spearman_rho` (window cumsum ranks,
    HUGEINT exact sums)."""

    def ranks(col: str) -> str:
        return f"""(
      SELECT v AS {col}, 2 * (cum - cnt) + cnt + 1 AS two_rank FROM (
        SELECT v, cnt, SUM(cnt) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT CAST({col} AS BIGINT) AS v, count(*) AS cnt
              FROM base GROUP BY 1)
      )
    )"""

    return f"""
    WITH base AS (
      SELECT CAST({x_col} AS BIGINT) AS {x_col},
             CAST({y_col} AS BIGINT) AS {y_col}
      FROM {rows}
    ),
    paired AS (
      SELECT rx.two_rank AS x2, ry.two_rank AS y2
      FROM base b
      JOIN {ranks(x_col)} rx ON b.{x_col} = rx.{x_col}
      JOIN {ranks(y_col)} ry ON b.{y_col} = ry.{y_col}
    ),
    agg AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(x2) AS HUGEINT) AS sx,
             CAST(SUM(y2) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x2 AS HUGEINT) * y2) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y2 AS HUGEINT) * y2) AS HUGEINT) AS syy
      FROM paired
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS spearman_rho
    FROM agg
    """
