"""Balanced range bucketing: balance under skew, determinism,
boundary/duplicate edge cases."""

import random

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators import scaling


def test_balances_skewed_values(spark):
    # log-normal-ish skew: fixed-width buckets would put ~everything
    # in bucket 0; quantile buckets stay near-uniform.
    rnd = random.Random(13)
    rows = [(i, rnd.lognormvariate(0, 2)) for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    bucketed, bounds = scaling.balanced_range_buckets(
        df, "v", "k", n_buckets=8, sample_rate=0.25
    )
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(bounds) == 7 and sorted(bounds) == bounds
    assert set(counts) == set(range(8))
    # each bucket within [6%, 20%] of rows (perfect = 12.5%; the
    # sample estimate wobbles, gross imbalance would blow these)
    for b, c in counts.items():
        assert 0.06 * 4000 <= c <= 0.20 * 4000, (b, c)


def test_deterministic_and_partitioning_invariant(spark):
    rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df1 = spark.createDataFrame(rows, ["k", "v"])
    df2 = spark.createDataFrame(rows, ["k", "v"]).repartition(13)
    b1, bounds1 = scaling.balanced_range_buckets(df1, "v", "k", n_buckets=4)
    b2, bounds2 = scaling.balanced_range_buckets(df2, "v", "k", n_buckets=4)
    assert bounds1 == bounds2
    m1 = {r["k"]: r["bucket"] for r in b1.collect()}
    m2 = {r["k"]: r["bucket"] for r in b2.collect()}
    assert m1 == m2


def test_duplicate_heavy_value_degrades_gracefully(spark):
    # 90% of rows share one value: several boundaries collapse onto
    # it; assignment must stay total (every row gets exactly one
    # bucket id in range) with empty buckets, not wrong ones.
    rows = [(i, 5.0 if i % 10 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    bucketed, bounds = scaling.balanced_range_buckets(
        df, "v", "k", n_buckets=4, sample_rate=0.5
    )
    got = bucketed.collect()
    assert all(0 <= r["bucket"] <= 3 for r in got)
    assert len(got) == 1000


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        scaling.balanced_range_buckets(df, "v", "k", n_buckets=1)
    with pytest.raises(ValueError):
        scaling.balanced_range_buckets(df, "v", "k", sample_rate=0.0)
    with pytest.raises(ValueError):
        # md5 variate for a single row is >= rate -> empty sample
        scaling.balanced_range_buckets(df, "v", "k", sample_rate=1e-12)
