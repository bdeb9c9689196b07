"""Drift audits: PSI stable-vs-shifted behavior, KS hand-computed
values, nested-cumsum determinism (the repartitionByRange RNG bug)."""

import random

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators import drift


def test_psi_stable_vs_shifted(spark):
    rnd = random.Random(31)
    ref = spark.createDataFrame(
        [(i, rnd.gauss(100, 10)) for i in range(3000)], ["k", "v"]
    )
    same = spark.createDataFrame(
        [(i + 10_000, rnd.gauss(100, 10)) for i in range(3000)], ["k", "v"]
    )
    shifted = spark.createDataFrame(
        [(i + 20_000, rnd.gauss(130, 10)) for i in range(3000)], ["k", "v"]
    )
    psi_same = sum(
        r["contrib"] for r in drift.psi_report(ref, same, "v", "k").collect()
    )
    psi_shift = sum(
        r["contrib"] for r in drift.psi_report(ref, shifted, "v", "k").collect()
    )
    assert psi_same < 0.1          # "stable" band
    assert psi_shift > 0.25        # "broken" band
    rows = drift.psi_report(ref, shifted, "v", "k").collect()
    assert len(rows) == 10 and all(r["contrib"] is not None for r in rows)


def test_psi_empty_bucket_is_finite(spark):
    ref = spark.createDataFrame([(i, float(i)) for i in range(200)], ["k", "v"])
    cur = spark.createDataFrame(
        [(i, 500.0 + i) for i in range(50)], ["k", "v"]  # all past ref's max
    )
    rows = drift.psi_report(ref, cur, "v", "k", n_buckets=5).collect()
    assert all(abs(r["contrib"]) < 1e6 for r in rows)  # no inf/nan
    assert sum(r["n_cur"] for r in rows) == 50


def test_ks_hand_computed(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: max gap is 0.5 at v in {2, 4}
    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], ["v"])
    b = spark.createDataFrame([(v,) for v in [3, 4, 5, 6]], ["v"])
    r = drift.ks_statistic(a, b, "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks"]) == (4, 4, 0.5)
    # identical samples -> ks 0
    r2 = drift.ks_statistic(a, a, "v").collect()[0]
    assert r2["ks"] == 0.0


def test_ks_nested_cumsum_matches_single_window(spark):
    # regression for the repartitionByRange RNG bug: the two-column
    # nested cumsum must agree with a single-partition window exactly.
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    rnd = random.Random(7)
    rows = [(float(v), rnd.randint(0, 3), rnd.randint(0, 3))
            for v in rnd.sample(range(100_000), 5000)]
    df = spark.createDataFrame(rows, ["v", "n_a", "n_b"])
    got = global_cumsum(
        global_cumsum(df, "v", "n_a", "cum_a"), "v", "n_b", "cum_b"
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.select(
        "v", F.sum("n_a").over(w).alias("ra"), F.sum("n_b").over(w).alias("rb")
    )
    bad = got.join(ref, "v").filter(
        (F.col("cum_a") != F.col("ra")) | (F.col("cum_b") != F.col("rb"))
    )
    assert bad.count() == 0


def test_ks_empty_side_rejected(spark):
    a = spark.createDataFrame([(1.0,)], ["v"])
    b = a.filter("v > 99")
    with pytest.raises(ValueError):
        drift.ks_statistic(a, b, "v")
