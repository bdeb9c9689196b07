"""Interval union: brute-force equivalence, touching/nested/duplicate
edges, covered totals, bad-input rejection."""

import random

import pytest

from dbt_incremental_ci_spark.operators import intervals


def _brute_islands(spans):
    by_key = {}
    for k, s, e in spans:
        by_key.setdefault(k, []).append((s, e))
    out = set()
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                out.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.add((k, cur_s, cur_e, n))
    return out


def test_islands_vs_brute_force(spark):
    rnd = random.Random(21)
    spans = [
        (rnd.randint(0, 4), s, s + rnd.randint(0, 40))
        for _ in range(300)
        for s in [rnd.randint(0, 500)]
    ]
    df = spark.createDataFrame(spans, ["k", "s", "e"])
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_spans"])
        for r in intervals.merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == _brute_islands(spans)


def test_touching_nested_duplicate(spark):
    spans = [
        (1, 0, 10), (1, 10, 20),   # touching -> merge (closed intervals)
        (1, 30, 50), (1, 35, 40),  # nested -> one island, extent 30..50
        (1, 60, 70), (1, 60, 70),  # exact duplicates -> one island, n=2
        (2, 0, 5),                 # other key untouched
    ]
    df = spark.createDataFrame(spans, ["k", "s", "e"])
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_spans"])
        for r in intervals.merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == {
        (1, 0, 20, 2),
        (1, 30, 50, 2),
        (1, 60, 70, 2),
        (2, 0, 5, 1),
    }


def test_covered_total(spark):
    spans = [(1, 0, 10), (1, 5, 15), (1, 100, 110), (2, 0, 1)]
    df = spark.createDataFrame(spans, ["k", "s", "e"])
    got = {
        r["k"]: (r["covered"], r["n_islands"])
        for r in intervals.covered_total(df, "k", "s", "e").collect()
    }
    assert got == {1: (25, 2), 2: (1, 1)}


def test_end_before_start_rejected(spark):
    df = spark.createDataFrame([(1, 10, 5)], ["k", "s", "e"])
    with pytest.raises(Exception, match="end < start"):
        intervals.merge_intervals(df, "k", "s", "e").collect()
