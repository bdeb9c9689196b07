"""Round-7 epi-stats operators: Cochran-Armitage trend and
Mantel-Haenszel pooled odds ratio — hand-computed small cases."""

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.epitests import (
    cochran_armitage_trend,
    mantel_haenszel_or,
)


def test_cochran_armitage_hand_case(spark):
    # scores 0/1/2, event rates 0.1/0.5/0.9 over n=10 each:
    # N=30 R=15 A=23 B=30 C=50 -> num=240, var*=135000,
    # z = 240/sqrt(135000/30) = 240/sqrt(4500) = 3.577709 (6dp)
    rows = (
        [(0, 1)] * 1 + [(0, 0)] * 9
        + [(1, 1)] * 5 + [(1, 0)] * 5
        + [(2, 1)] * 9 + [(2, 0)] * 1
    )
    df = spark.createDataFrame(rows, "s int, y int")
    out = cochran_armitage_trend(df, "s", F.col("y") == 1).collect()[0]
    assert (out["n_total"], out["n_events"]) == (30, 15)
    assert out["z_trend"] == pytest.approx(3.577709, abs=1e-6)


def test_cochran_armitage_no_trend_is_zero(spark):
    # identical rates at every score -> numerator exactly 0
    rows = [(s, y) for s in (1, 2, 3) for y in (0, 1)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = cochran_armitage_trend(df, "s", F.col("y") == 1).collect()[0]
    assert out["z_trend"] == 0.0


def test_mantel_haenszel_hand_case(spark):
    # stratum 1: a=10 b=20 c=5 d=40 (R=400/75, S=100/75)
    # stratum 2: a=4 b=4 c=4 d=4   (R=1, S=1)
    # OR_MH = (5.333333333+1)/(1.333333333+1) = 2.714286
    # crude: (14*44)/(24*9) = 2.851852
    rows = (
        [(1, 1, 1)] * 10 + [(1, 1, 0)] * 20
        + [(1, 0, 1)] * 5 + [(1, 0, 0)] * 40
        + [(2, 1, 1)] * 4 + [(2, 1, 0)] * 4
        + [(2, 0, 1)] * 4 + [(2, 0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "st int, e int, y int")
    out = mantel_haenszel_or(
        df, F.col("st"), F.col("e") == 1, F.col("y") == 1
    ).collect()[0]
    assert (out["n_strata"], out["n_rows"]) == (2, 91)
    assert out["or_crude"] == pytest.approx(2.851852, abs=1e-6)
    assert out["or_mh"] == pytest.approx(2.714286, abs=1e-6)


def test_mantel_haenszel_single_stratum_equals_crude(spark):
    rows = (
        [(7, 1, 1)] * 6 + [(7, 1, 0)] * 14
        + [(7, 0, 1)] * 3 + [(7, 0, 0)] * 27
    )
    df = spark.createDataFrame(rows, "st int, e int, y int")
    out = mantel_haenszel_or(
        df, F.col("st"), F.col("e") == 1, F.col("y") == 1
    ).collect()[0]
    assert out["or_mh"] == pytest.approx(out["or_crude"], abs=1e-6)


def test_compression_filter_signal_direction(spark):
    """q327's zlib signal: repetitive text compresses far more (low
    ratio) than high-entropy text (ratio near/above the keep band).
    No SQL twin exists (DuckDB has no zlib) — this test IS the value
    gate for the rows-only q327 entry."""
    from dbt_incremental_ci_spark.workload_q9 import _q327_ratio_rows

    import random

    rng = random.Random(7)
    noisy = "".join(chr(rng.randint(33, 126)) for _ in range(4000))
    rows = [
        ("rep", "spam spam spam " * 300),
        ("noise", noisy),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r["ratio"] for r in _q327_ratio_rows(df).collect()}
    assert got["rep"] < 0.05          # boilerplate: hugely compressible
    assert got["noise"] > 0.8         # random bytes: barely compressible
    assert got["empty"] == 1.0        # guard value, counted as no-signal
    assert got["rep"] < got["noise"]  # the filter's ordering premise


def test_isotonic_minimax_known_pooling(spark):
    # rates [0.3, 0.1, 0.2, 0.4] with n=10 each: PAVA pools the first
    # three violators to (3+1+2)/30 = 0.2 -> iso = [.2, .2, .2, .4]
    from dbt_incremental_ci_spark.operators.isotonic import (
        isotonic_calibrate_binned,
    )
    from pyspark.sql import functions as F2

    rows = []
    for b, k in [(1, 3), (2, 1), (3, 2), (4, 4)]:
        rows += [(b, 1)] * k + [(b, 0)] * (10 - k)
    df = spark.createDataFrame(rows, "b int, y int")
    out = {
        r["bin"]: r
        for r in isotonic_calibrate_binned(
            df, "b", F2.col("y") == 1
        ).collect()
    }
    assert [out[b]["rate_iso"] for b in (1, 2, 3, 4)] == [
        0.2, 0.2, 0.2, 0.4,
    ]
    assert out[1]["rate_raw"] == 0.3 and out[4]["n"] == 10


def test_isotonic_monotone_and_identity(spark):
    from dbt_incremental_ci_spark.operators.isotonic import (
        isotonic_calibrate_binned,
    )
    from pyspark.sql import functions as F2

    # already-monotone input is a fixed point of the fit
    rows = []
    for b, k in [(0, 1), (1, 4), (2, 6), (3, 9)]:
        rows += [(b, 1)] * k + [(b, 0)] * (10 - k)
    df = spark.createDataFrame(rows, "b int, y int")
    got = sorted(
        isotonic_calibrate_binned(df, "b", F2.col("y") == 1).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["rate_iso"] for r in got] == [r["rate_raw"] for r in got]
    assert all(
        got[i]["rate_iso"] <= got[i + 1]["rate_iso"]
        for i in range(len(got) - 1)
    )
