"""Model/filter evaluation metrics over distributed predictions —
the measurement side of the curation stack: once a quality classifier
(`classifier.py`), rule suite (`quality.py`), or LM filter (`text.py`)
scores the corpus, these operators grade the scores against labels
WITHOUT collecting predictions to the driver.

- :func:`binned_pr_curve` — precision/recall/F1 at ``bins`` score
  thresholds. The classic exact PR curve sorts ALL predictions by
  score (a global sort + data-sized cumulative scan); the binned form
  quantizes scores to ``bins`` buckets first, so the cumulative pass
  runs over a ``bins``-sized frame — the same
  aggregate-then-tiny-window shape as the equi-width histogram. Bin
  assignment runs in exact DECIMAL micro-units (no float boundary
  ambiguity between engines).
- :func:`cohens_kappa` — chance-corrected agreement between two
  boolean raters (two filter variants, a rule suite vs a classifier):
  one map-side-combined aggregate to a 2x2 contingency, kappa computed
  from the four cells. Output is a single row.

Scale: both are one hash aggregate over the corpus followed by
O(bins) / O(1) arithmetic — no data-sized window, sort, or collect
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 20,
) -> DataFrame:
    """PR curve at thresholds ``b/bins`` for b = 0..bins-1: row ``b``
    reports the confusion counts of the rule ``score >= b/bins``.

    ``score_col`` must lie in [0, 1] (a probability); scores are
    rounded to 6 dp and binned by exact integer arithmetic
    (``micro * bins div 10^6``, capped at the last bin) so a boundary
    score can never straddle engines. Output: ``(bin, threshold, tp,
    fp, fn, tn, precision, recall, f1)`` — exactly ``bins`` rows;
    precision is NULL where the rule predicts nothing.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    micro = (
        F.round(F.col(score_col), 6).cast("decimal(9,6)") * 1_000_000
    ).cast("bigint")
    # exact integer floor-div: micro*bins <= 2e7, well under 2^53, so
    # the subtract-mod-then-divide double is exact in both engines
    scaled = micro * F.lit(bins)
    b = F.least(
        ((scaled - scaled % 1_000_000) / 1_000_000).cast("int"),
        F.lit(bins - 1),
    ).cast("int")
    per = (
        df.select(
            b.alias("bin"), F.col(label_col).cast("int").alias("__y")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__pos"),
        )
    )
    spark = df.sparkSession
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    full = spine.join(per, "bin", "left").select(
        "bin",
        F.coalesce("__n", F.lit(0)).alias("__n"),
        F.coalesce("__pos", F.lit(0)).alias("__pos"),
    )
    # cumulative from the top bin down: O(bins) rows, deliberate tiny
    # single-task window (the equi-width-histogram spine class)
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = full.agg(
        F.sum("__n").alias("__tn_all"), F.sum("__pos").alias("__pos_all")
    )
    cum = (
        full.withColumn("tp", F.sum("__pos").over(w).cast("bigint"))
        .withColumn(
            "fp", (F.sum("__n").over(w) - F.sum("__pos").over(w)).cast("bigint")
        )
        .crossJoin(F.broadcast(tot))
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6),
    )
    rec = F.when(
        F.col("__pos_all") > 0, F.round(F.col("tp") / F.col("__pos_all"), 6)
    ).otherwise(F.lit(None).cast("double"))
    f1 = F.when(
        (F.col("tp") * 2 + F.col("fp") + F.col("fn")) > 0,
        F.round(
            (2 * F.col("tp")) / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ),
    )
    return (
        cum.withColumn("fn", (F.col("__pos_all") - F.col("tp")).cast("bigint"))
        .withColumn(
            "tn",
            (F.col("__tn_all") - F.col("tp") - F.col("fp") - F.col("fn")).cast(
                "bigint"
            ),
        )
        .select(
            "bin",
            F.round(F.col("bin") / F.lit(float(bins)), 6).alias("threshold"),
            "tp",
            "fp",
            "fn",
            "tn",
            prec.alias("precision"),
            rec.alias("recall"),
            f1.alias("f1"),
        )
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chance-corrected agreement between two boolean raters: one row
    ``(n, n11, n10, n01, n00, po, pe, kappa)``, all ratios rounded to
    6 dp. Degenerate pe == 1 (both raters constant, necessarily in
    agreement) reports kappa = 1.0 by convention."""
    a = F.col(a_col).cast("int")
    bb = F.col(b_col).cast("int")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * bb).alias("n11"),
        F.sum(a * (1 - bb)).alias("n10"),
        F.sum((1 - a) * bb).alias("n01"),
        F.sum((1 - a) * (1 - bb)).alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (n * n)
    kappa = F.when(pe >= 1.0, F.lit(1.0)).otherwise((po - pe) / (1 - pe))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC as the Mann-Whitney rank-sum, distributed.

    AUC = (R⁺ − n₊(n₊+1)/2) / (n₊·n₋) where R⁺ is the sum of the
    positives' *average* ranks (ties share the mean of their rank
    range — the standard tie-corrected estimator).

    Shape: ONE hash aggregate to (score → cnt, pos) — cardinality =
    distinct scores, not rows — then :func:`~.packing.global_cumsum`
    for the rank offsets (partition-parallel, no single-task global
    window), then a scalar aggregate. All rank arithmetic stays in
    INTEGERS (2·avg_rank = 2·cum_before + cnt + 1), summed as
    decimal(38,0), with exactly one float division at the end — so the
    value is bit-identical in any engine regardless of summation
    order. ``label_col`` must be boolean; scores should be pre-rounded
    by the caller if they come from float pipelines.
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    g = df.groupBy(score_col).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("__pos"),
    ).localCheckpoint(eager=False)
    # ^ the cumsum's sample-quantile/local-sum/total branches reference
    # this frame several times; without truncation the upstream scoring
    # expression re-executes per branch (measured 26.7 s -> ~2 s on the
    # classifier-scored corpus at sf0.1). The frame is score-cardinality
    # sized — cheap to materialize at any scale.
    c = global_cumsum(g, score_col, "__cnt", out_col="__cum")
    # 2*avg_rank of a tie group = 2*(cum-cnt) + cnt + 1  (integer)
    two_rank = 2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1
    tot = c.agg(
        F.sum("__cnt").alias("n"),
        F.sum("__pos").alias("n_pos"),
        F.sum((F.col("__pos") * two_rank).cast("decimal(38,0)")).alias("__s2"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = (
        F.col("__s2").cast("double")
        - (F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
    ) / (2.0 * F.col("n_pos").cast("double") * n_neg.cast("double"))
    return tot.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.round(auc, 9).alias("auc"),
    )


def two_proportion_ztest(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    z_crit: float = 1.959963984540054,
    label_a: str = "A",
    label_b: str = "B",
) -> DataFrame:
    """Two-proportion z-test over an A/B assignment — the experiment
    readout every event pipeline ships: per-variant units and
    conversions, lift, pooled-variance z statistic, and a
    significance flag at ``z_crit`` (default two-sided 95%).

    Input is UNIT-level (one row per experimental unit with its
    variant and a boolean outcome) — aggregate exposures to units
    first so the independence assumption isn't silently violated.
    One 2-row hash aggregate + a 1-row pivot; all arithmetic is a
    fixed double expression over exact integer counts, so the
    statistic reproduces bit-for-bit cross-engine.
    """
    per = df.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(converted_col), 1).otherwise(0)).alias("conv"),
    )
    # The two variant labels are parameters (round-4 ADVICE: hardcoded
    # 'A'/'B' silently produced NULL counts for any other labels), and
    # an execution-time assert fails loudly if either arm is absent
    # instead of emitting a NULL/garbage statistic.
    wide = per.agg(
        F.sum(F.when(F.col(variant_col) == label_a, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col(variant_col) == label_a, F.col("conv"))).alias("c_a"),
        F.sum(F.when(F.col(variant_col) == label_b, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col(variant_col) == label_b, F.col("conv"))).alias("c_b"),
    ).where(
        F.assert_true(
            F.col("n_a").isNotNull() & F.col("n_b").isNotNull(),
            F.lit(
                f"two_proportion_ztest: no rows for variant "
                f"'{label_a}' and/or '{label_b}' in column '{variant_col}'"
            ),
        ).isNull()
    )
    na, ca = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    z = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0))
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("c_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("c_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pa - pb, 6).alias("lift"),
        F.round(z, 6).alias("z"),
        (F.abs(z) >= z_crit).alias("significant"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + per-bin ECE contributions: equal-width
    probability bins, per-bin count, mean predicted probability,
    observed positive rate, |confidence - accuracy| gap, and the
    bin's weighted Expected Calibration Error term (Naeini et al.
    2015). Summing ``ece_term`` over the ``bins`` output rows gives
    ECE.

    Scale: one hash aggregate over the predictions (map-side partial)
    to ``bins`` rows + an O(bins) spine join — no data-sized window or
    sort. Mean probability is an EXACT integer micro-unit sum
    (round-6 scores, decimal cast) divided once, so the value
    reproduces bit-for-bit cross-engine regardless of partitioning;
    bin assignment reuses :func:`binned_pr_curve`'s exact integer
    floor-div.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    micro = (
        F.round(F.col(score_col), 6).cast("decimal(9,6)") * 1_000_000
    ).cast("bigint")
    # Two-stage aggregate: group by the micro VALUE first, so the
    # (potentially expensive) score expression is evaluated exactly
    # once per row — deriving both the bin key and the summed micro
    # from one projected column would inline the score expression
    # twice (measured 2x wall on the q172 classifier frame, sf1 gate
    # 15.7x vs q151's 3.2x for the same scored corpus). The
    # intermediate is bounded by score RESOLUTION (<= 1e6+1 distinct
    # round-6 micro values), independent of corpus size.
    per0 = (
        df.select(
            micro.alias("__mi"), F.col(label_col).cast("int").alias("__y")
        )
        .groupBy("__mi")
        .agg(F.count(F.lit(1)).alias("__n0"), F.sum("__y").alias("__pos0"))
    )
    scaled = F.col("__mi") * F.lit(bins)
    b = F.least(
        ((scaled - scaled % 1_000_000) / 1_000_000).cast("int"),
        F.lit(bins - 1),
    ).cast("int")
    per = (
        per0.select(
            b.alias("bin"),
            "__n0",
            (F.col("__mi") * F.col("__n0")).alias("__smi0"),
            "__pos0",
        )
        .groupBy("bin")
        .agg(
            F.sum("__n0").alias("__n"),
            F.sum("__smi0").alias("__smi"),
            F.sum("__pos0").alias("__pos"),
        )
    )
    spark = df.sparkSession
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    tot = per.agg(F.sum("__n").alias("__n_all"))
    full = (
        spine.join(per, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.coalesce("__n", F.lit(0)).alias("__n"),
            "__smi",
            F.coalesce("__pos", F.lit(0)).alias("__pos"),
            "__n_all",
        )
    )
    conf = F.round(F.col("__smi") / (F.col("__n") * 1_000_000.0), 6)
    acc = F.round(F.col("__pos") / F.col("__n").cast("double"), 6)
    gap = F.round(F.abs(conf - acc), 6)
    return full.select(
        "bin",
        F.round(F.col("bin") / F.lit(float(bins)), 6).alias("bin_lo"),
        F.col("__n").cast("bigint").alias("n"),
        F.when(F.col("__n") > 0, conf).alias("mean_prob"),
        F.when(F.col("__n") > 0, acc).alias("pos_rate"),
        F.when(F.col("__n") > 0, gap).alias("gap"),
        F.when(
            F.col("__n") > 0,
            F.round(gap * F.col("__n") / F.col("__n_all"), 9),
        ).otherwise(F.lit(0.0)).alias("ece_term"),
    )


def srm_check(
    df: DataFrame,
    variant_col: str,
    expected_shares: dict[str, float],
    chi2_crit: float = 3.841458820694124,
) -> DataFrame:
    """Sample Ratio Mismatch check — the experiment-health gate run
    before reading any A/B result: a chi-square goodness-of-fit of
    observed assignment counts against the design shares (default
    critical value = 95th percentile of chi2 with 1 df; pass the
    right critical value for len(expected)-1 df otherwise).

    One small aggregate (|variants| rows) joined to a literal
    expected-share frame; the statistic is a fixed double expression
    over exact integer counts. Output: one row per variant
    ``(variant, n, expected_share, expected_n, chi2_term)`` plus the
    total chi-square and flag on every row (the frame is
    |variants|-sized, so the grand-total window is O(1)).
    """
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(expected_shares.items())],
        f"{variant_col} string, expected_share double",
    )
    per = df.groupBy(variant_col).agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(F.sum("n").alias("__n_all"))
    j = (
        exp.join(per, variant_col, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            variant_col,
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            "expected_share",
            "__n_all",
        )
    )
    exp_n = F.col("expected_share") * F.col("__n_all")
    term = F.when(
        exp_n > 0,
        F.pow(F.col("n") - exp_n, F.lit(2.0)) / exp_n,
    ).otherwise(F.lit(0.0))
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # chi2 = sum of ROUND-9 terms, summed as DECIMAL so the
    # |variants|-row fold is exact in any order (a raw double sum of
    # the terms could differ by an ulp between engines and flip the
    # round)
    tdec = F.round(term, 9).cast("decimal(28,9)")
    out = j.select(
        variant_col,
        "n",
        "expected_share",
        F.round(exp_n, 6).alias("expected_n"),
        F.round(term, 9).alias("chi2_term"),
        F.sum(tdec).over(w).cast("double").alias("chi2"),
    )
    return out.withColumn("srm", F.col("chi2") >= chi2_crit)
