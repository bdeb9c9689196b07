"""Unit tests for the as-of and range join operators."""

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.asof import asof_join_backward, range_join

# (trade_id, sym, ts, qty)
TRADES = [
    (1, "A", 100, 10),
    (2, "A", 205, 20),
    (3, "A", 300, 30),  # exactly at quote ts 300 -> matches that quote
    (4, "B", 150, 40),
    (5, "B", 90, 50),  # before any B quote -> no match
    (6, "C", 500, 60),  # key with no quotes at all
]

# (quote_id, sym, ts, px)
QUOTES = [
    (11, "A", 90, 1.0),
    (12, "A", 200, 2.0),
    (13, "A", 300, 3.0),
    (14, "A", 300, 4.0),  # tie on ts -> larger quote_id wins
    (15, "B", 100, 5.0),
]


def _frames(spark):
    t = spark.createDataFrame(TRADES, ["trade_id", "sym", "ts", "qty"])
    q = spark.createDataFrame(QUOTES, ["quote_id", "sym", "qts", "px"])
    return t, q


def test_asof_backward_basic(spark):
    t, q = _frames(spark)
    out = asof_join_backward(
        t, q, on=["sym"], left_ts="ts", right_ts="qts",
        right_payload=["quote_id", "px"], tiebreak="quote_id",
    )
    rows = {r["trade_id"]: (r["quote_id"], r["px"]) for r in out.collect()}
    assert rows[1] == (11, 1.0)  # 90 <= 100, not 200
    assert rows[2] == (12, 2.0)
    assert rows[3] == (14, 4.0)  # equal-ts match; tie -> max quote_id
    assert rows[4] == (15, 5.0)
    assert rows[5] == (None, None)  # quote at 100 > trade at 90
    assert rows[6] == (None, None)  # no quotes for C
    # left join keeps every trade and all its columns
    assert out.count() == len(TRADES)
    assert set(out.columns) == {"trade_id", "sym", "ts", "qty", "quote_id", "px"}


def test_asof_inner_drops_unmatched(spark):
    t, q = _frames(spark)
    out = asof_join_backward(
        t, q, on=["sym"], left_ts="ts", right_ts="qts",
        right_payload=["quote_id"], tiebreak="quote_id", how="inner",
    )
    assert sorted(r["trade_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_asof_matches_quadratic_rewrite(spark):
    """Differential: union-merge plan == argmax-over-range-join."""
    t, q = _frames(spark)
    j = t.join(q, on="sym", how="left").filter(F.col("qts") <= F.col("ts"))
    from pyspark.sql import Window

    w = Window.partitionBy("trade_id").orderBy(
        F.col("qts").desc(), F.col("quote_id").desc()
    )
    brute = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("trade_id", "quote_id", "px")
    )
    fast = asof_join_backward(
        t, q, on=["sym"], left_ts="ts", right_ts="qts",
        right_payload=["quote_id", "px"], tiebreak="quote_id", how="inner",
    ).select("trade_id", "quote_id", "px")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, brute.collect()))


def test_range_join_keyed(spark):
    t, q = _frames(spark)
    out = range_join(
        t.select("trade_id", "sym", "ts"),
        q.select("quote_id", "sym", "qts"),
        left_ts="ts", right_ts="qts", lower=-60, upper=0,
        on=["sym"],
    )
    got = {(r["trade_id"], r["quote_id"]) for r in out.collect()}
    expect = {
        (t_id, q_id)
        for t_id, sym, ts, _ in TRADES
        for q_id, qsym, qts, _ in QUOTES
        if sym == qsym and ts - 60 <= qts <= ts
    }
    assert got == expect


def test_range_join_keyless_float_span(spark):
    """Float bounds: fractional spans must not truncate the bin width
    (int(2.5)=2 dropped middle-bin pairs) and sub-1 spans must not hit
    width 0. Differential vs brute cartesian + filter on a float axis."""
    t = spark.createDataFrame(
        [(i, i * 0.7) for i in range(40)], ["lid", "ts"]
    )
    q = spark.createDataFrame(
        [(100 + i, i * 0.45) for i in range(60)], ["rid", "qts"]
    )
    for lo, hi in [(-1.25, 1.25), (0.1, 0.6), (-2.5, 0.0), (-0.3, 0.2)]:
        out = range_join(t, q, left_ts="ts", right_ts="qts", lower=lo, upper=hi)
        got = sorted((r["lid"], r["rid"]) for r in out.collect())
        brute = sorted(
            (lid, 100 + i)
            for lid in range(40)
            for i in range(60)
            if lid * 0.7 + lo <= i * 0.45 <= lid * 0.7 + hi
        )
        assert got == brute, (lo, hi)


def test_range_join_keyless_equals_cartesian_filter(spark):
    """Bucketed keyless plan == brute cartesian + filter, window fully
    inside one bucket and straddling two."""
    t, q = _frames(spark)
    for lo, hi in [(-100, 0), (-37, 41), (0, 250)]:
        out = range_join(
            t.select("trade_id", "ts"),
            q.select("quote_id", "qts"),
            left_ts="ts", right_ts="qts", lower=lo, upper=hi,
        )
        got = sorted((r["trade_id"], r["quote_id"]) for r in out.collect())
        expect = sorted(
            (t_id, q_id)
            for t_id, _, ts, _ in TRADES
            for q_id, _, qts, _ in QUOTES
            if ts + lo <= qts <= ts + hi
        )
        assert got == expect, (lo, hi)
