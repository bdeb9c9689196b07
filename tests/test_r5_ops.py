"""Round-5 operators: HLL set ops / sketch-column rollup, Benford
audit, WOE/IV binning, conformal thresholds."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ hll cube
def test_hll_rollup_is_register_exact(spark):
    """Rolling month registers up to the year must equal sketching the
    year directly — the reaggregatable-measure contract."""
    from dbt_incremental_ci_spark.operators.hll import (
        hll_registers,
        hll_registers_by,
        hll_rollup,
    )

    rows = [(i % 12 + 1, f"u{i % 37}") for i in range(500)]
    df = spark.createDataFrame(rows, "mo int, uid string")
    by_mo = hll_registers_by(df, "uid", ["mo"], m=32, salt="t")
    rolled = {
        (r["__b"], r["__m"]) for r in hll_rollup(by_mo, []).collect()
    }
    direct = {
        (r["__b"], r["__m"])
        for r in hll_registers(df, "uid", m=32, salt="t").collect()
    }
    assert rolled == direct


def test_hll_set_ops_inclusion_exclusion(spark):
    from dbt_incremental_ci_spark.operators.hll import hll_set_ops

    a = spark.createDataFrame([(f"k{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(200, 500)], "k string"
    )
    r = hll_set_ops(a, b, "k", m=128).collect()[0]
    # |A|=|B|=300, |A∪B|=500, |A∩B|=100 — sketch estimates within ~15%
    assert abs(r["est_a"] - 300) / 300 < 0.15
    assert abs(r["est_union"] - 500) / 500 < 0.15
    assert r["est_intersection"] >= 0
    assert abs(r["est_intersection"] - 100) < 100 * 0.8  # I-E noise adds up
    assert r["est_intersection"] == round(
        max(r["est_a"] + r["est_b"] - r["est_union"], 0.0), 3
    )


# ------------------------------------------------------------- benford
def test_benford_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.benford import (
        benford_first_digit,
        benford_summary,
    )

    # values engineered to known digits: 1,1,2,9,0.5(->5),-30(->3),0,None
    df = spark.createDataFrame(
        [(1.0,), (150.0,), (2e6,), (9.99,), (0.5,), (-30.0,), (0.0,), (None,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_first_digit(df, "v").collect()}
    assert set(rows) == set(range(1, 10))  # spine fills absent digits
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    assert rows[5]["n"] == 1 and rows[3]["n"] == 1  # 0.5 -> 5, |-30| -> 3
    assert rows[4]["n"] == 0
    assert rows[1]["expected_p"] == round(math.log10(2), 6)
    # 0 and NULL excluded -> total 6
    summ = benford_summary(benford_first_digit(df, "v")).collect()[0]
    assert summ["n_total"] == 6
    assert summ["chi_square"] > 0


def test_benford_conforming_sample_conforms(spark):
    """A sample actually drawn from Benford (2^k leading digits follow
    Benford closely) must pass the chi-square gate."""
    from dbt_incremental_ci_spark.operators.benford import (
        benford_first_digit,
        benford_summary,
    )

    vals = [(float(str(2**k)[0]),) for k in range(1, 1000)]
    df = spark.createDataFrame(vals, "v double")
    s = benford_summary(benford_first_digit(df, "v")).collect()[0]
    assert s["conforms"], s["chi_square"]


# -------------------------------------------------------------- woe/iv
def test_woe_iv_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.woe import woe_iv

    # bin A: 8 events / 2 non; bin B: 2 events / 8 non
    rows = [("A", True)] * 8 + [("A", False)] * 2
    rows += [("B", True)] * 2 + [("B", False)] * 8
    df = spark.createDataFrame(rows, "b string, y boolean")
    out = {r["bin"]: r for r in woe_iv(df, "b", "y").collect()}
    te, tn, k, s = 10, 10, 2, 0.5
    pg_a, pb_a = (8 + s) / (te + k * s), (2 + s) / (tn + k * s)
    assert out["A"]["woe"] == round(math.log(pg_a / pb_a), 6)
    assert out["A"]["iv_term"] == round((pg_a - pb_a) * math.log(pg_a / pb_a), 6)
    assert out["A"]["woe"] == -out["B"]["woe"]  # symmetric design
    assert out["A"]["n"] == 10 and out["A"]["events"] == 8


def test_woe_pure_bin_stays_finite(spark):
    from dbt_incremental_ci_spark.operators.woe import woe_iv

    rows = [("pure", True)] * 5 + [("mixed", True)] * 2 + [("mixed", False)] * 3
    df = spark.createDataFrame(rows, "b string, y boolean")
    out = {r["bin"]: r for r in woe_iv(df, "b", "y").collect()}
    assert out["pure"]["woe"] is not None
    assert math.isfinite(out["pure"]["woe"])  # smoothing handles 0 cells


# ----------------------------------------------------------- conformal
def test_conformal_threshold_exact_k(spark):
    from dbt_incremental_ci_spark.operators.conformal import (
        conformal_thresholds,
    )

    # group g: scores 1..9 -> n=9, k=ceil(0.9*10)=9 -> threshold 9
    # group h: scores 1..3 -> n=3, k=ceil(0.9*4)=4 > 3 -> not covered
    rows = [("g", float(i), i) for i in range(1, 10)]
    rows += [("h", float(i), 100 + i) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "grp string, s double, id int")
    out = {r["grp"]: r for r in conformal_thresholds(df, "grp", "s", "id", alpha=0.1).collect()}
    assert (out["g"]["n"], out["g"]["k"], out["g"]["threshold"], out["g"]["covered"]) == (9, 9, 9.0, True)
    assert out["h"]["covered"] is False and out["h"]["threshold"] is None

    with pytest.raises(ValueError):
        conformal_thresholds(df, "grp", "s", "id", alpha=1.5)


def test_conformal_tie_break_deterministic(spark):
    from dbt_incremental_ci_spark.operators.conformal import (
        conformal_thresholds,
    )

    rows = [("g", 1.0, i) for i in range(10)] + [("g", 2.0, 100)]
    df = spark.createDataFrame(rows, "grp string, s double, id int")
    # n=11, k=ceil(0.9*12)=11 -> the largest score
    r = conformal_thresholds(df, "grp", "s", "id", alpha=0.1).collect()[0]
    assert (r["k"], r["threshold"]) == (11, 2.0)


# ------------------------------------------------------------------ fd
def test_fd_check_holds_and_violations(spark):
    from dbt_incremental_ci_spark.operators.profiling import fd_check

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (3, "b", "z")],
        "k int, a string, b string",
    )
    out = {
        (r["determinant"], r["dependent"]): r
        for r in fd_check(df, [("k", "a"), ("k", "b"), ("a", "b")]).collect()
    }
    assert out[("k", "a")]["fd_holds"] is True
    r = out[("k", "b")]
    assert (r["fd_holds"], r["violating_keys"], r["n_keys"]) == (False, 1, 3)
    assert out[("a", "b")]["fd_holds"] is False  # a='b' -> {y,z}


# --------------------------------------------------------- attribution
def test_position_attribution_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.attribution import (
        position_attribution,
    )

    conv = spark.createDataFrame(
        [(1, 100, 1, 10.0)], "u int, ts long, eid int, v double"
    )
    tch = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (1, 40, "d")],
        "u int, ts long, ch string",
    )
    out = {
        r["ch"]: r["attributed_micro"]
        for r in position_attribution(
            conv, tch, "u", "ts", "v", "ch", lookback=1000, id_col="eid"
        ).collect()
    }
    # 4 touches: first (a) 40%, last (d) 40%, b/c split 20% -> 10% each
    assert out["a"] == 4_000_000 and out["d"] == 4_000_000
    assert out["b"] == 1_000_000 and out["c"] == 1_000_000


def test_position_attribution_degenerate_counts(spark):
    from dbt_incremental_ci_spark.operators.attribution import (
        position_attribution,
    )

    conv = spark.createDataFrame(
        [(1, 100, 1, 2.0), (2, 100, 2, 3.0)],
        "u int, ts long, eid int, v double",
    )
    tch = spark.createDataFrame(
        [(1, 10, "solo"), (2, 10, "x"), (2, 20, "y")],
        "u int, ts long, ch string",
    )
    out = {
        r["ch"]: r["attributed_micro"]
        for r in position_attribution(
            conv, tch, "u", "ts", "v", "ch", lookback=1000, id_col="eid"
        ).collect()
    }
    assert out["solo"] == 2_000_000          # single touch -> 100%
    assert out["x"] == 1_500_000 and out["y"] == 1_500_000  # 50/50


def test_time_decay_attribution_weights(spark):
    from dbt_incremental_ci_spark.operators.attribution import (
        time_decay_attribution,
    )

    # ages 0+... touch at age 10 (one half-life) has half the weight of
    # age 0 -> shares 2/3 and 1/3
    conv = spark.createDataFrame(
        [(1, 100, 1, 9.0)], "u int, ts long, eid int, v double"
    )
    tch = spark.createDataFrame(
        [(1, 99, "near"), (1, 89, "far")], "u int, ts long, ch string"
    )
    out = {
        r["ch"]: r["attributed_micro"]
        for r in time_decay_attribution(
            conv, tch, "u", "ts", "v", "ch",
            lookback=1000, half_life=10, id_col="eid",
        ).collect()
    }
    # w(near)=2^(-1/10)~0.933033, w(far)=2^(-11/10)~0.466516 (exactly half)
    # micro-quantized weights: ratio 2 within quantization slack
    assert abs(out["near"] / out["far"] - 2.0) < 1e-4
    assert out["near"] + out["far"] <= 9_000_000  # never over-attributes


# ----------------------------------------------------------- histsketch
def test_histogram_sketch_merge_and_quantiles(spark):
    from dbt_incremental_ci_spark.operators.histsketch import (
        histogram_merge,
        histogram_quantiles,
        histogram_sketch,
    )

    a = spark.createDataFrame([(float(i),) for i in range(0, 50)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(50, 100)], "v double")
    both = a.unionAll(b)
    merged = histogram_merge(
        histogram_sketch(a, "v", 0.0, 100.0, 100),
        histogram_sketch(b, "v", 0.0, 100.0, 100),
    )
    direct = histogram_sketch(both, "v", 0.0, 100.0, 100)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }
    qs = {
        r["q"]: r
        for r in histogram_quantiles(
            merged, 0.0, 100.0, 100, [0.5, 0.99]
        ).collect()
    }
    # uniform 0..99, bin width 1: median rank 50 -> bin 49 full -> ~50.0
    assert abs(qs[0.5]["quantile_est"] - 50.0) <= 1.0
    assert qs[0.99]["n"] == 100
    assert abs(qs[0.99]["quantile_est"] - 99.0) <= 1.0


def test_histogram_sketch_clamps_out_of_range(spark):
    from dbt_incremental_ci_spark.operators.histsketch import (
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (150.0,), (None,)], "v double"
    )
    got = {r["bin"]: r["cnt"] for r in histogram_sketch(df, "v", 0.0, 10.0, 10).collect()}
    assert got[0] == 2    # -5 clamped into bin 0, 0.5 lands there
    assert got[9] == 1    # 150 clamped into top bin
    assert sum(got.values()) == 3  # NULL excluded


# ---------------------------------------------------------- readability
def test_flesch_reading_ease_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.text import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "!!!")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", flesch_reading_ease("text").alias("f")
    ).collect()}
    # 6 words, 2 sentences, 6 vowel groups
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert out[1] == round(want, 3)
    assert out[2] is None  # wordless


# -------------------------------------------------------------- moments
def test_moments_profile_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.profiling import moments_profile

    # symmetric data -> skew 0; uniform-ish kurtosis known by hand
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = {r["column"]: r for r in moments_profile(df, ["x"]).collect()}["x"]
    n = len(vals)
    m1 = sum(vals) / n
    m2 = sum((v - m1) ** 2 for v in vals) / n
    m4 = sum((v - m1) ** 4 for v in vals) / n
    assert r["n"] == n and r["mean"] == m1
    assert r["variance"] == round(m2, 6)
    assert r["skewness"] == 0.0
    assert r["kurtosis_excess"] == round(m4 / m2**2 - 3.0, 6)


def test_moments_profile_skewed_sign(spark):
    from dbt_incremental_ci_spark.operators.profiling import moments_profile

    right = spark.createDataFrame(
        [(v,) for v in [1.0] * 10 + [100.0]], "x double"
    )
    r = moments_profile(right, ["x"]).collect()[0]
    assert r["skewness"] > 1.0  # heavy right tail


# -------------------------------------------------------------- phrase
def test_phrase_search_positions(spark):
    from dbt_incremental_ci_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [
            (1, "a b c a b"),      # "a b" twice
            (2, "b a"),             # reversed -> no match
            (3, "a  b"),            # double space still adjacent tokens
            (4, "a c b"),           # not adjacent
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(df, ["a", "b"]).collect()}
    assert got == {1: 2, 3: 1}
    import pytest as _p

    with _p.raises(ValueError):
        phrase_search(df, ["a"])


def test_phrase_search_three_terms(spark):
    from dbt_incremental_ci_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y q z")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(df, ["x", "y", "z"]).collect()}
    assert got == {1: 1}


# --------------------------------------------------------------- cusum
def test_cusum_flags_planted_level_shift(spark):
    from dbt_incremental_ci_spark.operators.timeseries import (
        cusum_changepoints,
    )

    # stable series then a sustained +5sigma-ish shift
    rows = [("a", d, 100) for d in range(20)]
    rows += [("a", 20 + d, 130) for d in range(10)]
    rows += [("b", d, 50) for d in range(30)]  # flat key never flags
    df = spark.createDataFrame(rows, "k string, day int, v int")
    out = cusum_changepoints(df, "k", "day", "v", slack_k=0.5, threshold_h=4.0)
    rowsd = {(r["k"], r["day"]): r for r in out.collect()}
    assert any(rowsd[("a", d)]["flagged"] for d in range(20, 30))
    assert not any(rowsd[("a", d)]["flagged"] for d in range(10))
    assert not any(rowsd[("b", d)]["flagged"] for d in range(30))
    # cusum stats are never negative
    assert all(
        r["cusum_pos"] >= 0 and r["cusum_neg"] >= 0 for r in rowsd.values()
    )


# -------------------------------------------------------------- as-of
def test_scd2_as_of_point_in_time(spark):
    from dbt_incremental_ci_spark.operators.scd import scd2_as_of

    scd = spark.createDataFrame(
        [
            (1, "a", 10, 20, False),
            (1, "b", 20, None, True),
            (2, "x", 5, 15, False),   # deleted at 15 (no current row)
            (3, "y", 30, None, True),  # born after t
        ],
        "k int, v string, valid_from int, valid_to int, is_current boolean",
    )
    got = {(r["k"], r["v"]) for r in scd2_as_of(scd, 18).collect()}
    assert got == {(1, "a")}  # 2 deleted before 18, 3 born after
    got2 = {(r["k"], r["v"]) for r in scd2_as_of(scd, 25).collect()}
    assert got2 == {(1, "b")}


# ---------------------------------------------------------- cat drift
def test_categorical_drift_shift_and_new_category(spark):
    from dbt_incremental_ci_spark.operators.drift import categorical_drift

    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "cat string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 80 + [("b",)] * 10 + [("c",)] * 10, "cat string"
    )
    out = {r["cat"]: r for r in categorical_drift(ref, cur, "cat").collect()}
    assert out["c"]["n_ref"] == 0 and out["c"]["n_cur"] == 10
    import math
    assert all(math.isfinite(r["psi_contrib"]) for r in out.values())
    # the shrinking category contributes positive PSI; chi2 terms >= 0
    assert out["b"]["psi_contrib"] > 0
    assert all(r["chi2_contrib"] >= 0 for r in out.values())
    # identical distributions -> ~zero drift
    same = {
        r["cat"]: r for r in categorical_drift(ref, ref, "cat").collect()
    }
    assert all(r["psi_contrib"] == 0.0 for r in same.values())
    assert all(r["chi2_contrib"] == 0.0 for r in same.values())


# -------------------------------------------------------------- skyline
def test_skyline_2d_vs_brute_force(spark):
    import random

    from dbt_incremental_ci_spark.operators.skyline import skyline_2d

    rnd = random.Random(9)
    rows = [(i, rnd.uniform(0, 100), rnd.uniform(0, 100)) for i in range(400)]
    rows += [(1000, 5.0, 99.0), (1001, 5.0, 99.0)]  # exact duplicates
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y", "id").collect()}

    # brute force: survivor iff strictly better than every prior point
    # in the (x asc, y desc, id) order — mirror the operator contract
    srt = sorted(rows, key=lambda r: (round(r[1], 6), -round(r[2], 6), r[0]))
    want, best = set(), float("-inf")
    for i, x, y in srt:
        if round(y, 6) > best:
            want.add(i)
            best = round(y, 6)
    assert got == want
    assert 1001 not in got  # at most one survivor per duplicate pair
    assert (1000 in got) == (1000 in want)


# ---------------------------------------------------------- concurrency
def test_max_concurrency_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.intervals import max_concurrency

    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 9, 12),   # 3 live in [9,10)
        ("a", 20, 30),
        ("b", 0, 5), ("b", 5, 10),  # half-open: end==start -> never 2
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = {r["k"]: (r["peak"], r["peak_ts"]) for r in max_concurrency(df, "k", "s", "e").collect()}
    assert got["a"] == (3, 9)
    assert got["b"] == (1, 0)  # earliest instant the peak is reached
