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


def test_overlap_pairs_degenerate_intervals_dropped(spark):
    """Empty intervals (end <= start) must neither crash the bucketing
    (descending F.sequence when start sits on a bucket boundary) nor
    emit overlap == 0 pairs (round-8 ADVICE item 2)."""
    from dbt_incremental_ci_spark.operators.intervals import overlap_pairs

    rows = [
        (1, 0, 10),    # real
        (2, 5, 15),    # overlaps 1
        (3, 12, 12),   # empty, start on bucket boundary (width 4: 12/4=3)
        (4, 20, 18),   # inverted
        (5, 8, 8),     # empty at a shared point inside interval 1
    ]
    df = spark.createDataFrame(rows, "iv_id long, start long, end long")
    got = overlap_pairs(df, bucket_width=4).collect()
    assert [(r["id_a"], r["id_b"], r["overlap"]) for r in got] == [(1, 2, 5)]
    assert all(r["overlap"] > 0 for r in got)
