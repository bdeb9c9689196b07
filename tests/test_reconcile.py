"""Snapshot reconciliation: statuses, null-safe column compare,
duplicate-key rejection, summary counts."""

import pytest

from dbt_incremental_ci_spark.operators import reconcile


def test_diff_statuses_and_changed_cols(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "name", "val"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "B", 21.0),        # changed: name + val
         (3, "c", None),        # unchanged (null == null, null-safe)
         (5, "e", 50.0)],       # added; 4 removed
        ["k", "name", "val"],
    )
    got = {r["k"]: r for r in reconcile.snapshot_diff(old, new, "k").collect()}
    assert got[1]["diff_status"] == "unchanged" and got[1]["changed_cols"] == []
    assert got[2]["diff_status"] == "changed"
    assert got[2]["changed_cols"] == ["name", "val"]
    assert got[3]["diff_status"] == "unchanged"
    assert got[4]["diff_status"] == "removed"
    assert got[5]["diff_status"] == "added"

    summary = {
        r["diff_status"]: r["n_rows"]
        for r in reconcile.diff_summary(
            reconcile.snapshot_diff(old, new, "k")
        ).collect()
    }
    assert summary == {
        "unchanged": 2, "changed": 1, "removed": 1, "added": 1,
        "col:name": 1, "col:val": 1,
    }


def test_null_to_value_is_a_change(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    r = reconcile.snapshot_diff(old, new, "k").collect()[0]
    assert r["diff_status"] == "changed" and r["changed_cols"] == ["v"]


def test_duplicate_keys_rejected_at_runtime(spark):
    old = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    new = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(Exception, match="duplicate key"):
        reconcile.snapshot_diff(old, new, "k").collect()


def test_schema_mismatch_rejected(spark):
    old = spark.createDataFrame([(1, "a")], ["k", "v"])
    new = spark.createDataFrame([(1, 2)], ["k", "w"])
    with pytest.raises(ValueError, match="schema mismatch"):
        reconcile.snapshot_diff(old, new, "k")


def test_composite_keys(spark):
    old = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], ["a", "b", "v"])
    new = spark.createDataFrame([(1, 1, "x"), (1, 2, "z")], ["a", "b", "v"])
    got = {(r["a"], r["b"]): r["diff_status"]
           for r in reconcile.snapshot_diff(old, new, ["a", "b"]).collect()}
    assert got == {(1, 1): "unchanged", (1, 2): "changed"}
