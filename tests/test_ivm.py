"""Join-delta IVM: maintained view ≡ full recompute under random
insert-only splits (bag semantics, duplicates included)."""

import random

import pytest

from dbt_incremental_ci_spark.incremental import ivm


def _bag(df):
    out = {}
    for r in df.collect():
        k = tuple(r)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_maintained_join_equals_full_recompute(spark, seed):
    rnd = random.Random(seed)
    # duplicate keys on BOTH sides so the bag semantics are exercised
    a = [(rnd.randint(0, 9), f"a{i}") for i in range(80)]
    b = [(rnd.randint(0, 9), f"b{i}") for i in range(40)]
    a_df = spark.createDataFrame(a, ["k", "av"])
    b_df = spark.createDataFrame(b, ["k", "bv"])
    # random row-level split into old/delta
    a_flag = [rnd.random() < 0.6 for _ in a]
    b_flag = [rnd.random() < 0.7 for _ in b]
    a_old = spark.createDataFrame(
        [r for r, f in zip(a, a_flag) if f] or [(99, "x")], ["k", "av"]
    )
    delta_a = spark.createDataFrame(
        [r for r, f in zip(a, a_flag) if not f] or [(98, "x")], ["k", "av"]
    )
    b_old = spark.createDataFrame(
        [r for r, f in zip(b, b_flag) if f] or [(99, "y")], ["k", "bv"]
    )
    delta_b = spark.createDataFrame(
        [r for r, f in zip(b, b_flag) if not f] or [(98, "y")], ["k", "bv"]
    )
    full_a = a_old.unionAll(delta_a)
    full_b = b_old.unionAll(delta_b)

    view = a_old.join(b_old, "k")
    maintained = ivm.maintain_join(view, a_old, delta_a, b_old, delta_b, "k")
    want = full_a.join(full_b, "k")
    assert _bag(maintained) == _bag(want)


def test_join_delta_is_only_the_new_rows(spark):
    a_old = spark.createDataFrame([(1, "a1")], ["k", "av"])
    delta_a = spark.createDataFrame([(2, "a2")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "b1"), (2, "b2")], ["k", "bv"])
    delta_b = spark.createDataFrame([(1, "b3")], ["k", "bv"])
    got = _bag(ivm.join_delta(a_old, delta_a, b_old, delta_b, "k"))
    # ΔA⋈B_old: (2,a2,b2); A_old⋈ΔB: (1,a1,b3); ΔA⋈ΔB: none
    assert got == {(2, "a2", "b2"): 1, (1, "a1", "b3"): 1}


def test_outer_join_rejected(spark):
    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    with pytest.raises(ValueError):
        ivm.join_delta(df, df, df, df, "k", how="left")
