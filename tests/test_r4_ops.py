"""Round-4 operators: winnowing fingerprints, sequence patterns,
bigram LM, distributed percent_rank."""

import math

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.patterns import first_match_pattern
from dbt_incremental_ci_spark.operators.ranks import (
    global_percent_rank,
    two_phase_row_number,
)
from dbt_incremental_ci_spark.operators.winnow import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)


# --------------------------------------------------------------- winnow
def test_winnow_guarantee_shared_substring_yields_shared_fp(spark):
    """The SIGMOD'03 guarantee: a shared run of >= k+w-1 tokens
    produces at least one shared fingerprint."""
    k, w = 4, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k+w-1 tokens
    df = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five"),
            (2, shared + " completely different tail here now"),
            (3, "unrelated words that overlap with nothing at all really"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=k, w=w)
    sets = {
        r["doc_id"]: set(x["fp"] for x in rows)
        for r in [{"doc_id": d} for d in (1, 2, 3)]
        for rows in [fps.filter(F.col("doc_id") == r["doc_id"]).collect()]
    }
    assert sets[1] & sets[2], "shared 7-token run must share a fingerprint"
    assert not (sets[1] & sets[3])
    assert not (sets[2] & sets[3])


def test_winnow_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "")], ["doc_id", "text"]
    )
    fps = winnow_fingerprints(df, k=4, w=4)
    got = {r["doc_id"] for r in fps.collect()}
    # doc 1 has 3 < k tokens -> nothing; doc 2 has exactly one gram ->
    # its single min; doc 3 empty -> nothing
    assert got == {2}
    assert fps.filter(F.col("doc_id") == 2).count() == 1


def test_winnow_overlap_pairs_and_df_cap(spark):
    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(1, 9)]  # 8 identical docs
    rows.append((100, "totally unrelated words with no overlap at all"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # identical docs share all fingerprints -> all C(8,2) pairs
    pairs = fingerprint_overlap_pairs(df, k=4, w=4, min_shared=1, max_df=10)
    assert pairs.count() == 28
    # df cap below 8 drops the ubiquitous fingerprints -> no pairs
    assert (
        fingerprint_overlap_pairs(df, k=4, w=4, min_shared=1, max_df=7).count()
        == 0
    )


# ------------------------------------------------------------- patterns
def test_pattern_first_match_and_veto(spark):
    ev = spark.createDataFrame(
        [
            # user 1: view -> purchase(15) is first, purchase(30) ignored
            (1, 1, 10, "view"),
            (2, 1, 15, "purchase"),
            (3, 1, 30, "purchase"),
            # user 2: error strictly between view and first purchase -> veto
            (4, 2, 10, "view"),
            (5, 2, 12, "error"),
            (6, 2, 20, "purchase"),
            # user 3: purchase outside the window
            (7, 3, 10, "view"),
            (8, 3, 200, "purchase"),
            # user 4: error AT the purchase ts (not strictly between) -> kept
            (9, 4, 10, "view"),
            (10, 4, 25, "purchase"),
            (11, 4, 25, "error"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {
        r["a_id"]: (r["b_id"], r["gap"])
        for r in first_match_pattern(
            ev, "view", "purchase", within=50, veto="error"
        ).collect()
    }
    assert out == {1: (2, 5), 9: (10, 15)}


def test_pattern_without_veto_and_bad_window(spark):
    ev = spark.createDataFrame(
        [(1, 1, 10, "view"), (2, 1, 12, "error"), (3, 1, 20, "purchase")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    got = first_match_pattern(ev, "view", "purchase", within=50).collect()
    assert len(got) == 1 and got[0]["b_id"] == 3
    with pytest.raises(ValueError, match="within"):
        first_match_pattern(ev, "view", "purchase", within=0)


# ------------------------------------------------------------ bigram LM
def test_bigram_logprob_matches_hand_computation(spark):
    from dbt_incremental_ci_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df, lam=0.8).collect()}
    # corpus: tokens a,b,a,b,a,b,x -> c1(a)=3, c1(b)=3, c1(x)=1, N=7
    # bigrams: (a,b)x3, (b,a)x1
    def p(c2, c1p, c1w):
        return 0.8 * c2 / c1p + 0.2 * c1w / 7.0

    lp_ab = round(math.log(p(3, 3, 3)), 8)
    lp_ba = round(math.log(p(1, 3, 3)), 8)
    exp1 = round((2 * lp_ab + lp_ba) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logprob"] - exp1) < 1e-9
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["avg_logprob"] - round(lp_ab, 6)) < 1e-9
    # single-token doc: zero bigrams, NULL score
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None


# ---------------------------------------------------------------- ranks
def test_two_phase_row_number_is_global_and_dense(spark):
    df = spark.range(0, 10_000).select(
        (F.xxhash64("id") % 1000).alias("v"), F.col("id").alias("k")
    )
    out = two_phase_row_number(df, [F.asc("v"), F.asc("k")], out_col="rn")
    rows = out.orderBy("rn").collect()
    assert [r["rn"] for r in rows[:3]] == [1, 2, 3]
    assert len(rows) == 10_000 and rows[-1]["rn"] == 10_000
    # matches the naive global window
    naive = df.withColumn(
        "rn2",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                "v", "k"
            )
        ),
    )
    joined = out.join(naive, ["v", "k"]).filter(F.col("rn") != F.col("rn2"))
    assert joined.count() == 0


def test_global_percent_rank_matches_sql_semantics(spark):
    # ties: values 10,10,20,30 -> ranks 1,1,3,4 -> pct 0, 0, 2/3, 1
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30)], ["k", "v"]
    )
    out = {
        r["k"]: r["pct_rank"]
        for r in global_percent_rank(df, "v", "k").collect()
    }
    assert out[1] == 0.0 and out[2] == 0.0
    assert abs(out[3] - 2 / 3) < 1e-12
    assert out[4] == 1.0
    # single row -> 0.0
    one = spark.createDataFrame([(1, 5)], ["k", "v"])
    assert global_percent_rank(one, "v", "k").collect()[0]["pct_rank"] == 0.0


def test_global_percent_rank_no_data_sized_single_partition(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.xxhash64("id") % 100).alias("v")
    )
    out = global_percent_rank(df, "v", "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchanges feed O(partitions) offset rows
    # or the 1-row count — never a Sort over the input relation
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.start() : m.start() + 400]
        assert "HashAggregate" in tail or "count" in tail, tail


# ---------------------------------------------------------------- kcore
def test_kcore_clique_plus_tail(spark):
    from dbt_incremental_ci_spark.operators.kcore import kcore

    # 5-clique with a dangling 3-chain; 3-core = the clique, chain peels
    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    chain = [(5, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, ["src", "dst"])
    out = {r["node"]: r["degree"] for r in kcore(edges, 3).collect()}
    assert out == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}
    # k above the clique degree -> empty core
    assert kcore(edges, 6).count() == 0


def test_kcore_validates_k_and_nonconvergence(spark):
    import pytest as _pytest

    from dbt_incremental_ci_spark.operators.kcore import kcore

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    with _pytest.raises(ValueError, match="k must be"):
        kcore(edges, 0)
    with _pytest.raises(RuntimeError, match="converge"):
        kcore(edges, 2, max_iter=1)


# ----------------------------------------------------------- evalmetrics
def test_binned_pr_curve_hand_computed(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import binned_pr_curve

    # scores/labels chosen so bins 0,1 (of 2) split cleanly
    df = spark.createDataFrame(
        [(0.1, True), (0.2, False), (0.7, True), (0.9, True), (0.8, False)],
        ["prob", "y"],
    )
    rows = {r["bin"]: r for r in binned_pr_curve(df, "prob", "y", bins=2).collect()}
    # threshold 0.0: everything predicted positive
    assert rows[0]["tp"] == 3 and rows[0]["fp"] == 2 and rows[0]["fn"] == 0
    assert rows[0]["recall"] == 1.0 and rows[0]["precision"] == 0.6
    # threshold 0.5: the three high scores predicted positive (2 tp)
    assert rows[1]["tp"] == 2 and rows[1]["fp"] == 1
    assert rows[1]["fn"] == 1 and rows[1]["tn"] == 1
    assert abs(rows[1]["f1"] - round(4 / (4 + 1 + 1), 6)) < 1e-9


def test_binned_pr_curve_empty_bins_and_validation(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import binned_pr_curve

    df = spark.createDataFrame([(0.95, True)], ["prob", "y"])
    out = binned_pr_curve(df, "prob", "y", bins=10)
    assert out.count() == 10  # full spine even with one input row
    top = out.filter(F.col("bin") == 9).collect()[0]
    assert top["tp"] == 1 and top["precision"] == 1.0
    with pytest.raises(ValueError, match="bins"):
        binned_pr_curve(df, "prob", "y", bins=1)


def test_cohens_kappa_extremes(spark):
    from dbt_incremental_ci_spark.operators.evalmetrics import cohens_kappa

    # perfect agreement, mixed marginals -> kappa 1
    perfect = spark.createDataFrame(
        [(True, True), (False, False), (True, True), (False, False)],
        ["a", "b"],
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0
    # independence-shaped 2x2 (25/25/25/25) -> kappa 0
    indep = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)],
        ["a", "b"],
    )
    assert cohens_kappa(indep, "a", "b").collect()[0]["kappa"] == 0.0
    # constant raters in agreement -> degenerate pe=1 -> kappa 1
    const = spark.createDataFrame([(True, True), (True, True)], ["a", "b"])
    row = cohens_kappa(const, "a", "b").collect()[0]
    assert row["pe"] == 1.0 and row["kappa"] == 1.0


# ----------------------------------------------------- token budget mix
def test_token_budget_mix_matches_per_key_window(spark):
    from dbt_incremental_ci_spark.operators.sampling import (
        hash_uniform,
        token_budget_mix,
    )
    from pyspark.sql import Window as W

    df = spark.range(0, 2_000).select(
        F.col("id").alias("doc"),
        (F.col("id") % 7).cast("string").alias("src"),
        (F.col("id") % 40 + 5).alias("toks"),
    )
    out = token_budget_mix(df, "src", "toks", 200, "doc")
    # reference: the naive per-key window
    naive = df.withColumn(
        "cum2",
        F.sum("toks").over(
            W.partitionBy("src").orderBy(hash_uniform("doc", "tb"), "doc")
        ),
    )
    j = out.join(naive, ["doc", "src", "toks"])
    assert j.filter(F.col("cum_tokens") != F.col("cum2")).count() == 0
    assert j.filter(F.col("keep") != (F.col("cum2") <= 200)).count() == 0
    # every source keeps at least one doc (budget > max single doc)
    kept = out.filter("keep").groupBy("src").count()
    assert kept.count() == 7
    with pytest.raises(ValueError, match="budget"):
        token_budget_mix(df, "src", "toks", -1, "doc")


# ------------------------------------------------------------------ sq8
def test_scalar_quantize_8bit_roundtrip(spark):
    from dbt_incremental_ci_spark.operators.similarity import (
        scalar_quantize_8bit,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 5.0]),
            (2, [1.0, 10.0, 5.0]),
            (3, [0.5, 10.0, 5.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in scalar_quantize_8bit(df).collect()}
    # dim 1 spans [0,1]: codes 0, 255, round(0.5*255)=128
    assert [out[i]["codes"][0] for i in (1, 2, 3)] == [0, 255, 128]
    # dims 2 and 3 are constant -> code 0, exact reconstruction
    for i in (1, 2, 3):
        assert out[i]["codes"][1] == 0 and out[i]["codes"][2] == 0
    # endpoints reconstruct exactly; only the midpoint carries error
    assert out[1]["mse"] == 0.0 and out[2]["mse"] == 0.0
    err = 0.5 - 128 * (1.0 / 255.0)
    assert abs(out[3]["mse"] - round(err * err / 3, 9)) < 1e-12


def test_kcore_step_invariance(spark):
    """Round-12: j peel rounds settle per driver probe (the bfs.py
    k-step pattern). The fixpoint — and the returned core degrees —
    must be identical for every step, including steps that overshoot
    convergence (idempotent no-op rounds) and steps that land exactly
    on it."""
    from dbt_incremental_ci_spark.operators.kcore import kcore

    # clique (converges fast) + long chain (peels one level per round:
    # many real rounds, exercising every step/convergence parity)
    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    chain = [(5, 10)] + [(10 + i, 11 + i) for i in range(7)]
    edges = spark.createDataFrame(clique + chain, ["src", "dst"])
    expected = None
    for step in (1, 2, 3, 5, 8):
        out = sorted(
            (r["node"], r["degree"])
            for r in kcore(edges, 2, step=step).collect()
        )
        if expected is None:
            expected = out
        assert out == expected, f"step={step} diverged"
    # the chain peels away entirely at k=2 (endpoints fall one per
    # round); only the clique survives
    assert {n for n, _ in expected} == {1, 2, 3, 4, 5}
