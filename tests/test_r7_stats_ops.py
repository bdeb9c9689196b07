"""Round-7 operators: Kruskal-Wallis, one-way ANOVA, effect sizes,
Spearman rho, link prediction, item co-occurrence cosine — all
hand-computed fixtures."""

import math

from pyspark.sql import functions as F  # noqa: F401


# --------------------------------------------------- Kruskal-Wallis
def test_kruskal_wallis_hand_computed(spark):
    """Three groups [1,2,3],[4,5,6],[7,8,9]: no ties, ranks 1..9,
    rank sums 6/15/24 -> H = 12/(9*10) * (12+75+192) - 30 = 7.2."""
    from dbt_incremental_ci_spark.operators.stattests import kruskal_wallis

    rows = [(float(v), g) for g, vs in
            [("a", [1, 2, 3]), ("b", [4, 5, 6]), ("c", [7, 8, 9])]
            for v in vs]
    df = spark.createDataFrame(rows, "v double, g string")
    r = kruskal_wallis(df, "v", "g", chi2_crit=5.991).collect()[0]
    assert r["n_total"] == 9 and r["n_groups"] == 3
    assert r["h_stat"] == 7.2
    assert r["tie_correction"] == 1.0
    assert r["h_corrected"] == 7.2
    assert bool(r["reject"]) is True


def test_kruskal_wallis_ties(spark):
    """All values identical -> tie correction 0, h_corrected NULL."""
    from dbt_incremental_ci_spark.operators.stattests import kruskal_wallis

    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b"), (1.0, "b")],
        "v double, g string",
    )
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["tie_correction"] == 0.0
    assert r["h_corrected"] is None


# --------------------------------------------------- one-way ANOVA
def test_anova_hand_computed(spark):
    """[1,2,3],[4,5,6],[7,8,9]: SSB=54, SSW=6 ->
    F = (54/2)/(6/6) = 27, eta^2 = 54/60 = 0.9."""
    from dbt_incremental_ci_spark.operators.stattests import anova_oneway

    rows = [(float(v), g) for g, vs in
            [("a", [1, 2, 3]), ("b", [4, 5, 6]), ("c", [7, 8, 9])]
            for v in vs]
    df = spark.createDataFrame(rows, "v double, g string")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["n_total"] == 9 and r["n_groups"] == 3
    assert r["f_stat"] == 27.0
    assert r["eta_squared"] == 0.9


def test_anova_degenerate_zero_within(spark):
    """Zero within-group variance -> f_stat NULL (guarded), not inf."""
    from dbt_incremental_ci_spark.operators.stattests import anova_oneway

    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b")],
        "v double, g string",
    )
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["f_stat"] is None
    assert r["eta_squared"] == 1.0


# ----------------------------------------------------- effect sizes
def test_effect_sizes_hand_computed(spark):
    """A=[1,2,3], B=[4,5,6]: d = (2-5)/1 = -3,
    g = -3*(1 - 3/15) = -2.4, U_A = 0 -> cliffs_delta = -1."""
    from dbt_incremental_ci_spark.operators.stattests import effect_sizes

    rows = [(v, "A") for v in [1.0, 2.0, 3.0]] + [
        (v, "B") for v in [4.0, 5.0, 6.0]
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = effect_sizes(df, "v", "g", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["mean_a"] == 2.0 and r["mean_b"] == 5.0
    assert r["pooled_sd"] == 1.0
    assert r["cohens_d"] == -3.0
    assert r["hedges_g"] == -2.4
    assert r["cliffs_delta"] == -1.0


def test_effect_sizes_full_overlap(spark):
    """Identical samples -> d = 0, delta = 0."""
    from dbt_incremental_ci_spark.operators.stattests import effect_sizes

    rows = [(v, g) for g in ("A", "B") for v in [1.0, 2.0, 3.0]]
    df = spark.createDataFrame(rows, "v double, g string")
    r = effect_sizes(df, "v", "g", "A", "B").collect()[0]
    assert r["cohens_d"] == 0.0
    assert r["cliffs_delta"] == 0.0


# ------------------------------------------------------ Spearman rho
def test_spearman_hand_computed(spark):
    """x=1..4 vs y ranks (1,4,2,3): rho = 1 - 6*6/60 = 0.4."""
    from dbt_incremental_ci_spark.operators.stattests import spearman_rho

    df = spark.createDataFrame(
        [(1, 10), (2, 40), (3, 20), (4, 30)], "x long, y long"
    )
    r = spearman_rho(df, "x", "y").collect()[0]
    assert r["n"] == 4
    assert r["spearman_rho"] == 0.4


def test_spearman_perfect_and_inverse(spark):
    from dbt_incremental_ci_spark.operators.stattests import spearman_rho

    up = spark.createDataFrame(
        [(i, i * 100) for i in range(1, 6)], "x long, y long"
    )
    dn = spark.createDataFrame(
        [(i, -i) for i in range(1, 6)], "x long, y long"
    )
    assert spearman_rho(up, "x", "y").collect()[0]["spearman_rho"] == 1.0
    assert spearman_rho(dn, "x", "y").collect()[0]["spearman_rho"] == -1.0


def test_spearman_constant_is_null(spark):
    from dbt_incremental_ci_spark.operators.stattests import spearman_rho

    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "x long, y long"
    )
    assert spearman_rho(df, "x", "y").collect()[0]["spearman_rho"] is None


# -------------------------------------------------- link prediction
def test_neighbor_overlap_hand_computed(spark):
    """Edges (1,2),(1,3),(2,3),(2,4),(3,4): the only candidate
    non-edge is (1,4) with common neighbors {2,3}, both degree 3:
    ra = 2 * round(1/3, 9), aa = 2 * round(1/ln 3, 9)."""
    from dbt_incremental_ci_spark.operators.linkpred import (
        neighbor_overlap_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "id_a long, id_b long"
    )
    out = neighbor_overlap_scores(edges, "id_a", "id_b").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_u"], r["node_v"], r["n_common"]) == (1, 4, 2)
    assert r["ra_score"] == round(2 * round(1 / 3, 9), 6)
    assert r["aa_score"] == round(2 * round(1 / math.log(3), 9), 6)


def test_neighbor_overlap_degree_cap_drops_hub(spark):
    """A star (hub 0 linked to 1..5) with max_degree below the hub's
    degree produces no wedges at all."""
    from dbt_incremental_ci_spark.operators.linkpred import (
        neighbor_overlap_scores,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long"
    )
    assert (
        neighbor_overlap_scores(edges, "id_a", "id_b", max_degree=4).count()
        == 0
    )


# -------------------------------------- item co-occurrence cosine
def test_item_cooccurrence_hand_computed(spark):
    """Baskets b1:{x,y}, b2:{x,y}, b3:{x,z} with min_support=1:
    (x,y): 2/sqrt(3*2); (x,z): 1/sqrt(3*1)."""
    from dbt_incremental_ci_spark.operators.linkpred import (
        item_cooccurrence_cosine,
    )

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")],
        "b long, i string",
    )
    out = {
        (r["item_a"], r["item_b"]): (r["c_ij"], r["cosine"])
        for r in item_cooccurrence_cosine(
            df, "b", "i", min_support=1
        ).collect()
    }
    assert out[("x", "y")] == (2, round(2 / math.sqrt(6), 6))
    assert out[("x", "z")] == (1, round(1 / math.sqrt(3), 6))
    # support floor removes the singleton pair
    from dbt_incremental_ci_spark.operators.linkpred import (
        item_cooccurrence_cosine as icc,
    )

    only = icc(df, "b", "i", min_support=2).collect()
    assert [(r["item_a"], r["item_b"]) for r in only] == [("x", "y")]


def test_item_cooccurrence_basket_cap(spark):
    """A basket above max_basket_items is dropped entirely."""
    from dbt_incremental_ci_spark.operators.linkpred import (
        item_cooccurrence_cosine,
    )

    rows = [(1, f"i{k}") for k in range(5)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = item_cooccurrence_cosine(
        df, "b", "i", max_basket_items=3, min_support=1
    ).collect()
    # only basket 2 survives: a single (i0,i1) pair with n_i = 1 each
    assert [(r["item_a"], r["item_b"], r["c_ij"], r["cosine"])
            for r in out] == [("i0", "i1", 1, 1.0)]


# ------------------------------------------------------------- ACF
def test_acf_alternating_series(spark):
    """x = 1,2,1,2,1,2: lag-1 pairs perfectly anti-correlate (-1),
    lag-2 pairs perfectly correlate (+1)."""
    from dbt_incremental_ci_spark.operators.timeseries import acf

    rows = [("k", tt, 1 if tt % 2 else 2) for tt in range(1, 7)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = {r["lag"]: (r["n_pairs"], r["acf"])
           for r in acf(df, "k", "t", "x", max_lag=2).collect()}
    assert out[1] == (5, -1.0)
    assert out[2] == (4, 1.0)


def test_acf_constant_is_null(spark):
    from dbt_incremental_ci_spark.operators.timeseries import acf

    df = spark.createDataFrame(
        [("k", tt, 5) for tt in range(1, 5)], "k string, t long, x long"
    )
    for r in acf(df, "k", "t", "x", max_lag=1).collect():
        assert r["acf"] is None


# ---------------------------------------------------- Page-Hinkley
def test_page_hinkley_step_detection(spark):
    """5 points at 0 then 5 at 100 (mean 50): PH exceeds lam=60 first
    at t=7 (cumulative +100 over the running min), max_ph = 250."""
    from dbt_incremental_ci_spark.operators.timeseries import page_hinkley

    rows = [("k", tt, 0) for tt in range(1, 6)] + [
        ("k", tt, 100) for tt in range(6, 11)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = page_hinkley(df, "k", "t", "x", delta=0, lam=60).collect()[0]
    assert bool(r["detected"]) is True
    assert r["first_detect_t"] == 7
    assert r["max_ph"] == 250.0


def test_page_hinkley_stationary_no_detect(spark):
    from dbt_incremental_ci_spark.operators.timeseries import page_hinkley

    rows = [("k", tt, 10 + (tt % 2)) for tt in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = page_hinkley(df, "k", "t", "x", delta=0, lam=50).collect()[0]
    assert bool(r["detected"]) is False
    assert r["first_detect_t"] is None


# -------------------------------------------------- exact quantiles
def test_exact_quantiles_matches_percentile(spark):
    """exact_quantiles (distinct-value cumsum path) must reproduce
    F.percentile's interpolated quantile_cont bit-for-bit, ties and
    fractional positions included."""
    from dbt_incremental_ci_spark.operators.ranks import exact_quantiles

    vals = [1.0, 1.0, 2.5, 3.0, 7.25, 7.25, 7.25, 10.0, 42.0, 100.5, -3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {
        r["q"]: (r["n"], r["quantile"])
        for r in exact_quantiles(df, "x", qs).collect()
    }
    ref = df.agg(
        *[F.percentile("x", F.lit(q)).alias(f"p{i}") for i, q in enumerate(qs)]
    ).collect()[0]
    for i, q in enumerate(qs):
        assert got[q] == (len(vals), ref[f"p{i}"]), q


def test_exact_quantiles_single_value(spark):
    from dbt_incremental_ci_spark.operators.ranks import exact_quantiles

    df = spark.createDataFrame([(5.0,)], "x double")
    for r in exact_quantiles(df, "x", [0.25, 0.5, 0.75]).collect():
        assert r["quantile"] == 5.0 and r["n"] == 1


def test_exact_quantiles_by_key_matches_percentile(spark):
    from dbt_incremental_ci_spark.operators.ranks import (
        exact_quantiles_by_key,
    )

    rows = [("a", v) for v in [1.0, 2.0, 2.0, 5.5, 9.0]] + [
        ("b", v) for v in [10.0, 20.0, 30.0, 40.0]
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    qs = [0.1, 0.5, 0.9]
    got = {
        (r["k"], r["q"]): r["quantile"]
        for r in exact_quantiles_by_key(df, ["k"], "x", qs).collect()
    }
    ref = df.groupBy("k").agg(
        *[F.percentile("x", F.lit(q)).alias(f"p{i}") for i, q in enumerate(qs)]
    )
    for r in ref.collect():
        for i, q in enumerate(qs):
            assert got[(r["k"], q)] == r[f"p{i}"], (r["k"], q)


# ------------------------------------------------- waterfilling (q300)
def test_waterfill_allocations_hit_budget_exactly(spark):
    """The q300 closed-form level selection must satisfy
    sum(allocated) == budget and min(available, lam) semantics on a
    hand-checkable fixture: sources 10/20/100/200, budget 165
    (= total 330 // 2): fill 10+20 fully, cap the rest at the level
    that spends the remaining 135 -> 67/68 with the remainder going
    to the earlier uncapped source."""
    from dbt_incremental_ci_spark.workload_q8 import q300

    # drive through a temp parquet dir shaped like the testdata
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rows = []
        for src, n in (("a", 10), ("b", 20), ("c", 100), ("d", 200)):
            rows.append((src, " ".join(["w"] * n)))
        spark.createDataFrame(
            [(i, txt, "en", src, len(txt)) for i, (src, txt)
             in enumerate(rows)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: (r["available"], r["allocated"],
                             bool(r["capped"]))
               for r in q300(spark, d).collect()}
    assert out["a"] == (10, 10, False)
    assert out["b"] == (20, 20, False)
    # remaining budget 135 over two capped sources: lam=67, rem=1 ->
    # the earlier capped source (c) takes the extra unit
    assert out["c"] == (100, 68, True)
    assert out["d"] == (200, 67, True)
    assert sum(v[1] for v in out.values()) == 165
