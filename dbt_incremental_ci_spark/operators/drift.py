"""Distribution-drift audits: PSI and the two-sample KS statistic.

Training-data pipelines re-ingest sources continuously; before a new
corpus snapshot replaces the old one you want to know whether its
quality/length/score distributions MOVED. The two standard audit
metrics:

- **PSI** (population stability index, the banking/scorecard classic):
  bucket the reference distribution by its own quantiles, compare
  per-bucket mass, Σ (p_cur − p_ref) · ln(p_cur / p_ref). Rule of
  thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.
- **KS statistic** (Kolmogorov–Smirnov): max |CDF_a − CDF_b| —
  bucket-free, sensitive anywhere in the distribution.

Scale design (the 100 TB story):

- PSI: bucket boundaries come from
  :func:`scaling.balanced_range_buckets` (O(sample) aggregate,
  n−1 driver scalars), then everything is per-row CASE + one hash
  agg per side. No sort, no window.
- KS: per-value counts (hash agg with map-side combine), then the
  CDF prefix sums run through :func:`packing.global_cumsum` —
  partition-parallel windows + broadcast offsets, NEVER a
  data-sized single-task window. The final max is a scalar agg.
- Determinism: integer counts and exact rational fractions until the
  final rounded division / ln — replayable in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.packing import global_cumsum
from dbt_incremental_ci_spark.operators.scaling import balanced_range_buckets


def psi_report(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 10,
    sample_rate: float = 0.2,
    salt: str = "psi",
) -> DataFrame:
    """Per-bucket PSI contributions (one row per bucket 0..n−1).

    Buckets are the REFERENCE distribution's sampled quantiles, so a
    stable distribution puts ~1/n of both sides in every bucket.
    Rates are add-half smoothed — (count + 0.5) / (total + n/2) — so
    empty buckets contribute a finite, deterministic penalty instead
    of ±inf. Output: ``bucket, n_ref, n_cur, p_ref, p_cur, contrib``
    (fractions and contrib rounded to 6 dp; Σ contrib = the PSI).
    """
    bucketed_ref, bounds = balanced_range_buckets(
        reference, value_col, key_col, n_buckets, sample_rate, salt
    )
    v = F.col(value_col).cast("double")
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (v > F.lit(float(b))).cast("int")
    bucketed_cur = current.withColumn("bucket", bucket)

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

    spark = reference.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    counts = (
        grid.join(side(bucketed_ref, "n_ref"), "bucket", "left")
        .join(side(bucketed_cur, "n_cur"), "bucket", "left")
        .fillna(0, ["n_ref", "n_cur"])
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    # driver-bound: 1 scalar row — per-side totals
    ).first()
    smooth = F.lit(0.5)
    denom_r = F.lit(float(tot["tr"])) + smooth * n_buckets
    denom_c = F.lit(float(tot["tc"])) + smooth * n_buckets
    p_ref = (F.col("n_ref") + smooth) / denom_r
    p_cur = (F.col("n_cur") + smooth) / denom_c
    return counts.select(
        "bucket",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("contrib"),
    )


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample KS statistic: one row ``(n_a, n_b, ks)`` with
    ks = max over observed values of |CDF_a − CDF_b|, rounded 6 dp.

    Evaluated at every DISTINCT observed value (sufficient: the CDF
    difference is piecewise constant between observations). Prefix
    sums run through the partition-parallel :func:`global_cumsum` —
    the distinct-value relation can be data-sized for continuous
    measures, so a single-task global window would be the classic
    scale killer here.
    """
    ca = a.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = b.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    merged = (
        ca.join(cb, "v", "full_outer").fillna(0, ["n_a", "n_b"])
    )
    cum = global_cumsum(
        global_cumsum(merged, "v", "n_a", "cum_a"), "v", "n_b", "cum_b"
    )
    # driver-bound: 1 scalar row — per-side totals
    tot = merged.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")).first()
    if not tot["ta"] or not tot["tb"]:
        raise ValueError("ks_statistic: both samples must be non-empty")
    diff = F.abs(
        F.col("cum_a") / F.lit(float(tot["ta"]))
        - F.col("cum_b") / F.lit(float(tot["tb"]))
    )
    return cum.agg(
        F.lit(int(tot["ta"])).cast("long").alias("n_a"),
        F.lit(int(tot["tb"])).cast("long").alias("n_b"),
        F.round(F.max(diff), 6).alias("ks"),
    )


def categorical_drift(
    reference: DataFrame,
    current: DataFrame,
    cat_col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Categorical-distribution drift between two periods: per-category
    counts, share on each side, the PSI-style contribution on smoothed
    shares, and the chi-square homogeneity contribution — the
    label/segment-mix monitor next to :func:`psi_report`'s numeric one.

    One category-keyed aggregate per side + a full-outer key join
    (category-cardinality-sized, AQE-broadcastable); categories absent
    on one side get add-``smooth`` smoothing so contributions stay
    finite. Chi-square terms use the standard pooled-expectation
    homogeneity form over exact integer counts.
    """
    r = reference.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    c = current.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    j = r.join(c, "cat", "full_outer").fillna(0, ["n_ref", "n_cur"])
    tot = j.agg(
        F.sum("n_ref").alias("__tr"),
        F.sum("n_cur").alias("__tc"),
        F.count(F.lit(1)).alias("__k"),
    )
    out = j.crossJoin(F.broadcast(tot))
    nr, nc = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    tr, tc = F.col("__tr").cast("double"), F.col("__tc").cast("double")
    k = F.col("__k").cast("double")
    p_ref = (nr + F.lit(smooth)) / (tr + F.lit(smooth) * k)
    p_cur = (nc + F.lit(smooth)) / (tc + F.lit(smooth) * k)
    # chi-square homogeneity: expected share from the pooled margin
    pooled = (nr + nc) / (tr + tc)
    e_ref, e_cur = tr * pooled, tc * pooled
    chi = F.when(
        pooled > 0,
        F.pow(nr - e_ref, F.lit(2.0)) / e_ref
        + F.pow(nc - e_cur, F.lit(2.0)) / e_cur,
    ).otherwise(F.lit(0.0))
    return out.select(
        "cat",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
            "psi_contrib"
        ),
        F.round(chi, 6).alias("chi2_contrib"),
    )


def categorical_drift_sql(
    ref_expr: str, cur_expr: str, cat_col: str, smooth: float = 0.5
) -> str:
    """DuckDB twin of :func:`categorical_drift`. ``ref_expr`` /
    ``cur_expr`` are parenthesized row-set subqueries exposing
    ``cat_col``."""
    return f"""
    WITH r AS (SELECT {cat_col} AS cat, count(*) AS n_ref
               FROM {ref_expr} GROUP BY 1),
    c AS (SELECT {cat_col} AS cat, count(*) AS n_cur
          FROM {cur_expr} GROUP BY 1),
    j AS (
      SELECT COALESCE(r.cat, c.cat) AS cat,
             COALESCE(n_ref, 0) AS n_ref,
             COALESCE(n_cur, 0) AS n_cur
      FROM r FULL OUTER JOIN c ON r.cat = c.cat
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc, count(*) AS k FROM j)
    SELECT cat,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND((n_ref + {smooth!r}) / (tr + {smooth!r} * k), 6) AS p_ref,
           ROUND((n_cur + {smooth!r}) / (tc + {smooth!r} * k), 6) AS p_cur,
           ROUND(((n_cur + {smooth!r}) / (tc + {smooth!r} * k)
                  - (n_ref + {smooth!r}) / (tr + {smooth!r} * k))
                 * ln(((n_cur + {smooth!r}) / (tc + {smooth!r} * k))
                      / ((n_ref + {smooth!r}) / (tr + {smooth!r} * k))), 6)
             AS psi_contrib,
           ROUND(CASE WHEN (n_ref + n_cur) > 0 THEN
                   pow(n_ref - tr * ((n_ref + n_cur) / (tr + tc)), 2)
                     / (tr * ((n_ref + n_cur) / (tr + tc)))
                   + pow(n_cur - tc * ((n_ref + n_cur) / (tr + tc)), 2)
                     / (tc * ((n_ref + n_cur) / (tr + tc)))
                 ELSE 0.0 END, 6) AS chi2_contrib
    FROM j CROSS JOIN tot
    """


def js_divergence(
    reference: DataFrame,
    current: DataFrame,
    cat_col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Jensen-Shannon divergence between the categorical distributions
    of two periods — the bounded, symmetric drift scalar (Lin '91)
    that complements :func:`categorical_drift`'s per-category PSI /
    chi-square report: JSD is finite even for disjoint supports and
    its square root is a metric, so it's the right single number to
    alarm on.

    Same plan shape as ``categorical_drift``: one category-keyed
    aggregate per side, a full-outer key join (category-cardinality-
    sized), add-``smooth`` smoothing, then per-category divergence
    terms ``0.5*p*ln(p/m) + 0.5*q*ln(q/m)`` (m the midpoint) rounded
    to 12 dp and summed as DECIMAL(26,12) — an order-exact fold into
    ONE output row ``(k, jsd_nats, jsd_bits, js_distance)``. jsd_bits
    lies in [0, 1]; js_distance = sqrt(jsd_bits).
    """
    r = reference.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    c = current.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    j = r.join(c, "cat", "full_outer").fillna(0, ["n_ref", "n_cur"])
    tot = j.agg(
        F.sum("n_ref").alias("__tr"),
        F.sum("n_cur").alias("__tc"),
        F.count(F.lit(1)).alias("__k"),
    )
    out = j.crossJoin(F.broadcast(tot))
    nr, nc = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    tr, tc = F.col("__tr").cast("double"), F.col("__tc").cast("double")
    k = F.col("__k").cast("double")
    p = (nr + F.lit(smooth)) / (tr + F.lit(smooth) * k)
    q_ = (nc + F.lit(smooth)) / (tc + F.lit(smooth) * k)
    m = (p + q_) / 2
    term = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q_ * F.log(q_ / m)
    tdec = F.round(term, 12).cast("decimal(26,12)")
    agg = out.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(tdec).cast("double").alias("__jsd"),
    )
    bits = F.col("__jsd") / F.lit(0.6931471805599453)
    return agg.select(
        "k",
        F.round(F.col("__jsd"), 9).alias("jsd_nats"),
        F.round(bits, 9).alias("jsd_bits"),
        F.round(F.sqrt(F.greatest(bits, F.lit(0.0))), 9).alias(
            "js_distance"
        ),
    )


def js_divergence_sql(
    ref_expr: str, cur_expr: str, cat_col: str, smooth: float = 0.5
) -> str:
    """DuckDB twin of :func:`js_divergence`."""
    return f"""
    WITH r AS (SELECT {cat_col} AS cat, count(*) AS n_ref
               FROM {ref_expr} GROUP BY 1),
    c AS (SELECT {cat_col} AS cat, count(*) AS n_cur
          FROM {cur_expr} GROUP BY 1),
    j AS (
      SELECT COALESCE(r.cat, c.cat) AS cat,
             COALESCE(n_ref, 0) AS n_ref,
             COALESCE(n_cur, 0) AS n_cur
      FROM r FULL OUTER JOIN c ON r.cat = c.cat
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc,
                   count(*) AS k FROM j),
    pq AS (
      SELECT
        (CAST(n_ref AS DOUBLE) + CAST({smooth!r} AS DOUBLE))
          / (CAST(tr AS DOUBLE)
             + CAST({smooth!r} AS DOUBLE) * CAST(k AS DOUBLE)) AS p,
        (CAST(n_cur AS DOUBLE) + CAST({smooth!r} AS DOUBLE))
          / (CAST(tc AS DOUBLE)
             + CAST({smooth!r} AS DOUBLE) * CAST(k AS DOUBLE)) AS q
      FROM j CROSS JOIN tot
    ),
    terms AS (
      SELECT CAST(0.5 AS DOUBLE) * p * ln(p / ((p + q) / 2))
             + CAST(0.5 AS DOUBLE) * q * ln(q / ((p + q) / 2)) AS term
      FROM pq
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(ROUND(term, 12) AS DECIMAL(26,12)))
               AS DOUBLE) AS jsd
      FROM terms
    )
    SELECT k, ROUND(jsd, 9) AS jsd_nats,
           ROUND(jsd / 0.6931471805599453, 9) AS jsd_bits,
           ROUND(sqrt(greatest(jsd / 0.6931471805599453, 0.0)), 9)
             AS js_distance
    FROM agg
    """


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    decimals: int = 6,
) -> DataFrame:
    """Two-sample Mann-Whitney U / Wilcoxon rank-sum test — the
    nonparametric "did this distribution move" answer when means are
    the wrong lens (heavy tails, outliers, ordinal scores): tests
    whether sample A stochastically dominates sample B, with the
    standard tie-corrected normal approximation.

    Shape (the ROC-AUC machinery — AUC IS U/(n_a·n_b)): values
    quantize to ``decimals`` places, ONE hash aggregate to
    (value → cnt, cnt_a) — distinct values, not rows — then
    :func:`~.packing.global_cumsum` for partition-parallel rank
    offsets. Rank arithmetic stays in integers
    (2·avg_rank = 2·cum_before + cnt + 1) summed as DECIMAL(38,0);
    the tie-correction term Σ(t³−t) likewise. Exactly the final
    z / p are float.

    p-value: two-sided via the Bowling et al. (2009) logistic
    approximation (|err| < 1.5e-4; pure arithmetic both engines
    evaluate identically). Degenerate cases (an empty side, or all
    values tied so the variance is 0) report z = 0, p = 1.

    Output ONE row: ``(n_a, n_b, u_a, z, p_value)`` — u_a is A's U
    statistic (exact, from the 2U integer).
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    v = F.round(F.col(value_col), decimals)
    g = (
        df.filter(F.col(group_col).isin(label_a, label_b))
        .select(
            v.alias("__v"),
            (F.col(group_col) == label_a).cast("int").alias("__a"),
        )
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__a").alias("__ca"),
        )
        .localCheckpoint(eager=False)  # cumsum branches re-read this
    )
    c = global_cumsum(g, "__v", "__cnt", out_col="__cum")
    two_rank = 2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1
    # cube in DECIMAL so a mega-tie group (cnt³ > 2^63 at cnt ≥ 2.1e6)
    # cannot overflow under ANSI mode (the q257 gate lesson)
    cnt_dec = F.col("__cnt").cast("decimal(38,0)")
    t3t = cnt_dec * cnt_dec * cnt_dec - cnt_dec
    tot = c.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        (F.sum("__cnt") - F.sum("__ca")).cast("bigint").alias("n_b"),
        F.sum((F.col("__ca") * two_rank).cast("decimal(38,0)")).alias("__2ra"),
        F.sum(t3t).alias("__ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    two_u = (
        F.col("__2ra").cast("double")
        - na * (na + 1.0)
    )
    var_u = (
        na * nb / 12.0
        * ((n + 1.0) - F.col("__ties").cast("double") / (n * (n - 1.0)))
    )
    z_raw = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var_u > 0),
        (two_u - na * nb) / (2.0 * F.sqrt(var_u)),
    ).otherwise(F.lit(0.0))
    z = F.round(z_raw, 6)
    az = F.abs(z)
    p = F.round(
        F.lit(2.0)
        / (
            F.lit(1.0)
            + F.exp(F.lit(0.070566) * az * az * az + F.lit(1.5976) * az)
        ),
        10,
    )
    return tot.select(
        "n_a",
        "n_b",
        F.round(two_u / 2.0, 1).alias("u_a"),
        z.alias("z"),
        p.alias("p_value"),
    )


def mann_whitney_u_sql(
    rows: str,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    decimals: int = 6,
) -> str:
    """DuckDB twin of :func:`mann_whitney_u` (plain window cumsum —
    the oracle doesn't need the partition-parallel variant)."""
    return f"""
    WITH g AS (
      SELECT ROUND({value_col}, {decimals}) AS v,
             count(*) AS cnt,
             SUM(CASE WHEN {group_col} = '{label_a}' THEN 1 ELSE 0 END)
               AS ca
      FROM {rows}
      WHERE {group_col} IN ('{label_a}', '{label_b}')
      GROUP BY 1
    ),
    c AS (
      SELECT *,
             SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cnt) - SUM(ca) AS BIGINT) AS n_b,
             CAST(SUM(CAST(ca * (2 * (cum - cnt) + cnt + 1)
                           AS DECIMAL(38,0))) AS DOUBLE) AS r2a,
             CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
               AS DOUBLE) AS ties
      FROM c
    ),
    zed AS (
      SELECT n_a, n_b,
             r2a - CAST(n_a AS DOUBLE) * (n_a + 1.0) AS two_u,
             CAST(n_a AS DOUBLE) * n_b / 12.0
               * ((n_a + n_b + 1.0)
                  - ties / (CAST(n_a + n_b AS DOUBLE)
                            * (n_a + n_b - 1.0))) AS var_u
      FROM tot
    ),
    fin AS (
      SELECT n_a, n_b,
             ROUND(two_u / 2.0, 1) AS u_a,
             ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND var_u > 0
               THEN (two_u - CAST(n_a AS DOUBLE) * n_b)
                    / (2.0 * sqrt(var_u))
               ELSE 0.0 END, 6) AS z
      FROM zed
    )
    SELECT n_a, n_b, u_a, z,
           ROUND(2.0 / (1.0 + exp(0.070566 * abs(z) * abs(z) * abs(z)
                                  + 1.5976 * abs(z))), 10) AS p_value
    FROM fin
    """
