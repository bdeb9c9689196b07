"""Property-based tests (hypothesis) for the round-7 machinery:

- ``exact_quantiles`` ≡ ``F.percentile`` on arbitrary float multisets
  (the whole point of the rewiring is bit-equality);
- ``spearman_rho`` stays in [−1, 1] and is exactly ±1 on monotone
  data regardless of tie structure;
- the q300 waterfilling allocation hits the budget EXACTLY and never
  over-allocates a source, for arbitrary capacity profiles.

Few examples per property — every example is a Spark job."""

from hypothesis import given, settings, strategies as st

FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(FLOATS, min_size=1, max_size=40),
    qs=st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
def test_exact_quantiles_bit_equal_percentile(spark, vals, qs):
    from pyspark.sql import functions as F

    from dbt_incremental_ci_spark.operators.ranks import exact_quantiles

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {
        r["q"]: r["quantile"]
        for r in exact_quantiles(df, "x", qs).collect()
    }
    ref = df.agg(
        *[
            F.percentile("x", F.lit(q)).alias(f"p{i}")
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    for i, q in enumerate(qs):
        assert got[q] == ref[f"p{i}"], (q, got[q], ref[f"p{i}"])


@settings(max_examples=5, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=3, max_size=25
    )
)
def test_spearman_bounds_and_monotone_extremes(spark, xs):
    from dbt_incremental_ci_spark.operators.stattests import spearman_rho

    # y strictly increasing in x -> rho == 1 exactly (add the index to
    # break x-ties so the map is genuinely monotone in the PAIRS)
    rows = [(x * 100 + i, x * 100 + i + 7) for i, x in enumerate(sorted(xs))]
    df = spark.createDataFrame(rows, "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    assert r["spearman_rho"] == 1.0
    # arbitrary pairing stays inside [-1, 1]
    rows2 = [
        (x, xs[(i * 7 + 3) % len(xs)]) for i, x in enumerate(xs)
    ]
    df2 = spark.createDataFrame(rows2, "x long, y long")
    rho = spearman_rho(df2, "x", "y").collect()[0]["spearman_rho"]
    assert rho is None or -1.0 <= rho <= 1.0


@settings(max_examples=5, deadline=None)
@given(
    caps=st.lists(
        st.integers(min_value=0, max_value=500), min_size=2, max_size=8
    )
)
def test_waterfill_exact_budget_and_caps(spark, caps):
    """Drive q300's level selection directly through a documents
    fixture: allocations must (a) sum EXACTLY to total // 2, (b) never
    exceed availability, (c) fill uncapped sources fully."""
    import os
    import tempfile

    from dbt_incremental_ci_spark.workload_q8 import q300

    total = sum(caps)
    if total < 2:
        return
    with tempfile.TemporaryDirectory() as d:
        rows = []
        for i, n in enumerate(caps):
            rows.append(
                (i, " ".join(["w"] * n) if n else "", "en", f"s{i:02d}", n)
            )
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = q300(spark, d).collect()
    alloc = {r["source"]: r for r in out}
    assert sum(r["allocated"] for r in out) == total // 2
    for r in out:
        assert 0 <= r["allocated"] <= r["available"]
        if not r["capped"]:
            assert r["allocated"] == r["available"]
