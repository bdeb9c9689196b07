"""Round-6 infra operators: consistent-hash reshard audit, CMS
accuracy eval, two-hop neighborhoods."""

import pytest
from pyspark.sql import functions as F


def test_reshard_consistent_moves_less_than_range(spark):
    from dbt_incremental_ci_spark.operators.sharding import (
        reshard_movement_audit,
    )

    df = spark.range(2000).select(F.col("id").alias("k"))
    out = {r["method"]: r for r in
           reshard_movement_audit(df, "k", 10, 12).collect()}
    assert out["consistent"]["n_keys"] == 2000
    # ring movement should be in the vicinity of added/after (2/12);
    # static range sharding remaps the majority
    assert out["consistent"]["moved_rate"] < 0.35
    assert out["range"]["moved_rate"] > 0.5
    assert out["consistent"]["moved_rate"] < out["range"]["moved_rate"]


def test_reshard_same_shards_moves_nothing(spark):
    from dbt_incremental_ci_spark.operators.sharding import (
        reshard_movement_audit,
    )

    df = spark.range(500).select(F.col("id").alias("k"))
    out = {r["method"]: r for r in
           reshard_movement_audit(df, "k", 8, 8).collect()}
    assert out["consistent"]["n_moved"] == 0
    assert out["range"]["n_moved"] == 0


def test_countmin_estimate_one_sided_on_topk(spark):
    """CMS never underestimates: est >= exact for every probe."""
    from dbt_incremental_ci_spark.operators.countmin import (
        countmin_build,
        countmin_estimate,
    )

    rows = [(f"k{i % 37}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "tok string")
    sketch = countmin_build(df, "tok", depth=4, width=64, salt="t")
    exact = df.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_estimate(
        sketch, exact.select("tok"), "tok", depth=4, width=64, salt="t"
    )
    for r in exact.join(est, "tok").collect():
        assert r["cm_est"] >= r["exact_n"]


def test_two_hop_respects_degree_cap(spark):
    """A hub part connecting everyone is dropped by the cap; only the
    small part's pair survives."""
    rows = ([(999, s) for s in range(50)]  # hub part, degree 50
            + [(1, 0), (1, 1)])            # small part
    df = spark.createDataFrame(rows, "l_partkey int, l_suppkey int")
    edges = df.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    deg = edges.groupBy("part").agg(F.count(F.lit(1)).alias("__d"))
    kept = edges.join(deg, "part").filter(F.col("__d") <= 40).select(
        "part", "supp"
    )
    a = kept.select("part", F.col("supp").alias("s"))
    b = kept.select("part", F.col("supp").alias("co"))
    pairs = (
        a.join(b, "part")
        .filter(F.col("s") != F.col("co"))
        .select("s", "co")
        .distinct()
    )
    got = {(r["s"], r["co"]) for r in pairs.collect()}
    assert got == {(0, 1), (1, 0)}
