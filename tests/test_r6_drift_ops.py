"""Round-6 drift/profile operators: Mann-Whitney U, mergeable
moments, Zipf fit."""

import math

import pytest
from pyspark.sql import functions as F


def test_mann_whitney_hand_computed_no_ties(spark):
    """A = {1,2,3}, B = {4,5,6}: ranks of A are 1,2,3 → R_A = 6,
    U_A = 6 - 3*4/2 = 0; mean U = 4.5, var = 3*3*7/12 = 5.25,
    z = (0 - 4.5)/sqrt(5.25) = -1.963961."""
    from dbt_incremental_ci_spark.operators.drift import mann_whitney_u

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["u_a"] == 0.0
    assert out["z"] == pytest.approx(-4.5 / math.sqrt(5.25), abs=1e-5)
    assert out["p_value"] < 0.06


def test_mann_whitney_ties_average_ranks(spark):
    """A = {1,2}, B = {2,3}: the tied 2s share rank 2.5.
    R_A = 1 + 2.5 = 3.5 → U_A = 3.5 - 3 = 0.5."""
    from dbt_incremental_ci_spark.operators.drift import mann_whitney_u

    rows = [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert out["u_a"] == 0.5


def test_mann_whitney_degenerate_all_tied(spark):
    from dbt_incremental_ci_spark.operators.drift import mann_whitney_u

    rows = [(7.0, "a")] * 5 + [(7.0, "b")] * 5
    df = spark.createDataFrame(rows, "v double, g string")
    out = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert out["z"] == 0.0 and out["p_value"] == 1.0


def test_moments_merge_equals_direct(spark):
    """Any sharding of the input yields the identical profile row —
    power sums are exact integers, so merge is associative."""
    from dbt_incremental_ci_spark.operators.profiling import (
        moments_merge_profile,
        moments_profile,
    )

    rows = [(float(i % 17) + 0.25 * (i % 3), i) for i in range(300)]
    df = spark.createDataFrame(rows, "x double, k int")
    direct = moments_profile(df, ["x"]).collect()[0]
    for nshards in (2, 5, 7):
        merged = moments_merge_profile(
            df, "x", (F.col("k") % nshards)
        ).collect()[0]
        assert merged == direct


def test_zipf_fit_exact_power_law(spark):
    """A corpus engineered so freq(rank r) = 64 / 2^ceil(log2 r) is
    noisy-Zipfian; just assert slope < 0, r2 > 0.8, and exact token
    accounting."""
    from dbt_incremental_ci_spark.operators.text import zipf_fit

    words = []
    for r in range(1, 33):
        words += [f"w{r:02d}"] * max(64 // r, 2)
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = zipf_fit(df, "text", min_freq=1).collect()[0]
    assert out["n_types"] == 32
    assert out["n_tokens"] == len(words)
    assert out["slope"] < -0.5
    assert out["r2"] > 0.8
