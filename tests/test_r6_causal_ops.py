"""Round-6 causal/collocation operators: G-test, SMD balance, CUPED."""

import math

import pytest
from pyspark.sql import functions as F


def test_gtest_independent_bigram_near_zero(spark):
    """A corpus where every first word pairs equally with every
    second word: G2 ~ 0 for all pairs."""
    from dbt_incremental_ci_spark.operators.collocations import (
        gtest_collocations,
    )

    docs = []
    i = 0
    for a in ("x", "y"):
        for b in ("u", "v"):
            for _ in range(10):
                docs.append((i, f"{a} {b}"))
                i += 1
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = gtest_collocations(df, "text", min_pair_count=1, top_k=None)
    for r in out.collect():
        assert r["g2"] == pytest.approx(0.0, abs=1e-6)


def test_gtest_perfect_association_positive(spark):
    """'a b' always, 'c d' always: G2 for (a,b) = 2*N*ln(2) with
    N=40 positions split evenly (each cell 20, margins 20, E=10)."""
    from dbt_incremental_ci_spark.operators.collocations import (
        gtest_collocations,
    )

    docs = [(i, "a b") for i in range(20)] + [
        (100 + i, "c d") for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {(r["w1"], r["w2"]): r["g2"]
           for r in gtest_collocations(df, "text", 1, None).collect()}
    # O11=20, E11=20*20/40=10 -> term 20 ln 2; all four cells 20 ln 2ish
    # G2 = 2*(20 ln2 + 20 ln2) = 80 ln 2? cells: O12=O21=0, O22=20.
    expected = 2 * (20 * math.log(2) + 20 * math.log(2))
    assert out[("a", "b")] == pytest.approx(expected, abs=1e-4)


def test_covariate_balance_detects_imbalance(spark):
    from dbt_incremental_ci_spark.operators.causal import covariate_balance

    rows = []
    for i in range(200):
        rows.append(("A", 10.0 + (i % 5), float(i % 2)))
        rows.append(("B", 20.0 + (i % 5), float(i % 2)))
    df = spark.createDataFrame(rows, "variant string, x double, z double")
    out = {r["covariate"]: r for r in
           covariate_balance(df, "variant", ["x", "z"]).collect()}
    assert not out["x"]["balanced"] and abs(out["x"]["smd"]) > 1
    assert out["z"]["balanced"] and out["z"]["smd"] == pytest.approx(0.0, abs=1e-6)


def test_cuped_perfect_correlation_kills_variance(spark):
    """post = 2*pre + 7 exactly → theta = 2, adjusted variance 0,
    variance reduction 100%."""
    from dbt_incremental_ci_spark.operators.causal import cuped

    rows = []
    for i in range(100):
        pre = float(i % 13)
        v = "A" if i % 2 == 0 else "B"
        rows.append((i, v, pre, 2.0 * pre + 7.0))
    df = spark.createDataFrame(rows, "u int, variant string, pre double, post double")
    out = cuped(df, "u", "pre", "post", "variant").collect()[0]
    assert out["theta"] == pytest.approx(2.0, abs=1e-6)
    assert out["var_adjusted"] == pytest.approx(0.0, abs=1e-6)
    assert out["var_reduction_pct"] == pytest.approx(100.0, abs=1e-3)
    # lift_cuped removes the pre-imbalance component entirely
    assert out["lift_cuped"] == pytest.approx(0.0, abs=1e-6)


def test_cuped_uncorrelated_pre_changes_nothing(spark):
    from dbt_incremental_ci_spark.operators.causal import cuped

    rows = []
    for i in range(400):
        pre = float(i % 2)          # alternates
        post = float((i // 2) % 2)  # alternates at half rate: cov = 0
        rows.append((i, "A" if i < 200 else "B", pre, post))
    df = spark.createDataFrame(rows, "u int, variant string, pre double, post double")
    out = cuped(df, "u", "pre", "post", "variant").collect()[0]
    assert out["theta"] == pytest.approx(0.0, abs=1e-6)
    assert out["var_reduction_pct"] == pytest.approx(0.0, abs=1e-3)
    assert out["lift_cuped"] == out["lift_raw"]
