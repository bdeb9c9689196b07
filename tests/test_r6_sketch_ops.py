"""Round-6 sketch/blocking operators: HLL overlap matrix, DAU/WAU
stickiness, sorted-neighborhood blocking."""

import pytest
from pyspark.sql import functions as F


def test_hll_overlap_matrix_matches_pairwise_setops(spark):
    """The matrix row for (a, b) must equal hll_set_ops on the same
    two groups — same registers, same estimator, one pass."""
    from dbt_incremental_ci_spark.operators.hll import (
        hll_overlap_matrix,
        hll_set_ops,
    )

    rows = (
        [("a", f"u{i}") for i in range(100)]
        + [("b", f"u{i}") for i in range(50, 150)]
        + [("c", f"v{i}") for i in range(30)]
    )
    df = spark.createDataFrame(rows, "g string, uid string")
    mat = {(r["group_a"], r["group_b"]): r for r in
           hll_overlap_matrix(df, "uid", "g", m=64, salt="t").collect()}
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    direct = hll_set_ops(
        df.filter(F.col("g") == "a"),
        df.filter(F.col("g") == "b"),
        "uid", m=64, salt="t",
    ).collect()[0]
    ab = mat[("a", "b")]
    assert ab["est_a"] == direct["est_a"]
    assert ab["est_union"] == direct["est_union"]
    assert ab["jaccard_est"] == direct["jaccard_est"]
    # disjoint groups: intersection estimate near zero vs overlapping
    assert mat[("a", "c")]["est_intersection"] < ab["est_intersection"]


def test_dau_wau_stickiness_hand_computed(spark):
    """User 1 active days 1..7, user 2 active day 7 only.
    Day 7: DAU=2; trailing WAU (days 1-7) = 2 -> stickiness 1.0.
    Day 1: DAU=1, WAU=1."""
    from dbt_incremental_ci_spark.operators.timeseries import (
        dau_wau_stickiness,
    )

    rows = [(1, d) for d in range(1, 8)] + [(2, 7)]
    df = spark.createDataFrame(rows, "u int, day int")
    out = {r["day"]: r for r in
           dau_wau_stickiness(df, "u", "day", 7).collect()}
    assert out[1]["dau"] == 1 and out[1]["wau"] == 1
    assert out[7]["dau"] == 2 and out[7]["wau"] == 2
    assert out[7]["stickiness"] == 1.0
    assert out[4]["wau"] == 1  # user 2 not yet visible


def test_sorted_neighborhood_exact_volume_and_gaps(spark):
    from dbt_incremental_ci_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"name{i:03d}") for i in range(10)]
    df = spark.createDataFrame(rows, "id int, nm string")
    out = sorted_neighborhood_pairs(df, "nm", "id", window=3).collect()
    # n*w minus the tail truncation: ranks 8,9,10 lose 1,2,3 partners
    assert len(out) == 10 * 3 - (1 + 2 + 3)
    pairs = {(r["id_a"], r["id_b"]): r["rank_gap"] for r in out}
    assert pairs[(0, 1)] == 1 and pairs[(0, 3)] == 3
    assert (0, 4) not in pairs  # beyond the window
