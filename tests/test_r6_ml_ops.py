"""Round-6 ML/survival operators: decision stump, log-rank test,
Heaps'-law checkpoints."""

import math

import pytest
from pyspark.sql import functions as F


def test_decision_stump_finds_separating_threshold(spark):
    """Feature perfectly separates at 5.0: all candidates between the
    classes get gain = H(0.5) = ln 2; others get less. Best rank must
    be a fully-separating split with gain ln(2)."""
    from dbt_incremental_ci_spark.operators.stump import decision_stump

    rows = [(float(i), False) for i in range(5)] + [
        (float(i) + 10.0, True) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "x double, y boolean")
    out = decision_stump(df, "x", "y", candidates=9).collect()
    assert len(out) == 9
    best = [r for r in out if r["gain_rank"] == 1][0]
    assert best["info_gain"] == pytest.approx(math.log(2), abs=1e-6)
    assert best["pos_left"] == 0 and best["pos_right"] == 5
    # gains are ranked consistently
    gains = sorted((r["gain_rank"], r["info_gain"]) for r in out)
    assert all(
        gains[i][1] >= gains[i + 1][1] for i in range(len(gains) - 1)
    )


def test_logrank_identical_groups_null(spark):
    """Two groups with identical duration/event profiles: chi2 ~ 0,
    p = 1."""
    from dbt_incremental_ci_spark.operators.survival import logrank_test

    rows = []
    for g in ("even", "odd"):
        rows += [(g, 1, 1), (g, 2, 0), (g, 3, 1), (g, 5, 1), (g, 7, 0)]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = logrank_test(df, "duration", "event", "grp", "even", "odd").collect()[0]
    assert out["n_a"] == 5 and out["n_b"] == 5
    assert out["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert out["p_value"] == pytest.approx(1.0, abs=1e-6)
    assert out["expected_a"] == pytest.approx(out["events_a"], abs=1e-6)


def test_logrank_divergent_groups_significant(spark):
    """Group A all dies at t=1, group B survives (censored at t=10):
    maximally divergent hazards → large chi2, small p."""
    from dbt_incremental_ci_spark.operators.survival import logrank_test

    rows = [("a", 1, 1)] * 20 + [("b", 10, 0)] * 20
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = logrank_test(df, "duration", "event", "grp", "a", "b").collect()[0]
    assert out["chi2"] > 10
    assert out["p_value"] < 0.01


def test_heaps_checkpoints_monotone_and_exact_total(spark):
    from dbt_incremental_ci_spark.operators.text import heaps_checkpoints

    docs = [
        (1, "a b c d"),
        (2, "a b e f"),
        (3, "a g h i j"),
        (4, "a b c k"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = sorted(
        heaps_checkpoints(df, "doc_id", "text", checkpoints=4).collect(),
        key=lambda r: r["k"],
    )
    n_total = 17
    assert [r["n_prefix"] for r in out] == [
        n_total * k // 4 for k in (1, 2, 3, 4)
    ]
    vocabs = [r["vocab"] for r in out]
    assert vocabs == sorted(vocabs)
    assert vocabs[-1] == 11  # a..k distinct types
    # prefix of 4 tokens = doc 1 exactly -> 4 types
    assert out[0]["n_prefix"] == 4 and vocabs[0] == 4


def test_best_threshold_picks_separating_bin(spark):
    """Scores perfectly separate at 0.5: max-F1 threshold must sit in
    (0, 0.5] band with F1 = 1; min-cost picks the same with cost 0."""
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        best_threshold,
        binned_pr_curve,
    )

    rows = [(0.1 + 0.01 * i, False) for i in range(10)] + [
        (0.8 + 0.01 * i, True) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "prob double, y boolean")
    pr = binned_pr_curve(df, "prob", "y", bins=10)
    out = {r["criterion"]: r for r in best_threshold(pr).collect()}
    assert out["max_f1"]["f1"] == 1.0
    assert 0.2 <= out["max_f1"]["threshold"] <= 0.8
    assert out["min_cost"]["expected_cost"] == 0.0
