"""Unit tests for the expression library (PG shims + reference macros)."""

from datetime import date

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions import (
    academic_year_from_date,
    age_years,
    calculate_gpa,
    grade_point_calculator,
    ilike,
    int_div,
    pg_dow,
    safe_div,
    string_agg_distinct,
    string_agg_ordered,
)


def test_ilike(spark):
    df = spark.createDataFrame([("Mentoring ABC",), ("none",)], ["s"])
    got = df.select(ilike("s", "%mentoring%").alias("m")).collect()
    assert [r["m"] for r in got] == [True, False]


def test_pg_dow(spark):
    # 2024-01-07 is a Sunday → PG dow 0
    df = spark.createDataFrame([(date(2024, 1, 7),), (date(2024, 1, 8),)], ["d"])
    got = [r[0] for r in df.select(pg_dow("d")).collect()]
    assert got == [0, 1]


def test_age_years(spark):
    df = spark.createDataFrame(
        [(date(2024, 6, 1), date(2000, 6, 2)), (date(2024, 6, 1), date(2000, 6, 1))],
        ["as_of", "born"],
    )
    got = [r[0] for r in df.select(age_years("as_of", "born")).collect()]
    assert got == [23, 24]  # PG age(): birthday not yet reached vs reached


def test_int_div_and_safe_div(spark):
    df = spark.createDataFrame([(7, 2), (7, 0), (-7, 2)], ["a", "b"])
    got = df.select(
        int_div("a", F.when(F.col("b") != 0, F.col("b")).otherwise(1)).alias("i"),
        safe_div("a", "b").alias("s"),
    ).collect()
    assert [r["i"] for r in got] == [3, 7, -3]  # truncation toward zero
    assert got[1]["s"] is None  # div by zero → null


def test_grade_points(spark):
    # WF counts 0.0 like F (macro: `in ('F','WF')`); only W/I/unknown/null → NULL
    df = spark.createDataFrame(
        [("A",), ("B-",), ("F",), ("WF",), ("W",), ("I",), (None,)], ["g"]
    )
    got = [r[0] for r in df.select(grade_point_calculator("g")).collect()]
    assert got == [4.0, 2.7, 0.0, 0.0, None, None, None]


def test_calculate_gpa_plain(spark):
    df = spark.createDataFrame([(4.0, 3), (3.0, 1)], ["gp", "cr"])
    got = df.agg(calculate_gpa("gp", "cr").alias("gpa")).collect()[0]["gpa"]
    assert float(got) == 3.75  # (12+3)/4


def test_calculate_gpa_windowed(spark):
    df = spark.createDataFrame(
        [(1, 4.0, 2), (1, 2.0, 2), (2, 3.0, 3)], ["sid", "gp", "cr"]
    )
    got = {
        r["sid"]: float(r["gpa"])
        for r in df.select(
            "sid", calculate_gpa("gp", "cr", partition_by=["sid"]).alias("gpa")
        ).collect()
    }
    assert got == {1: 3.0, 2: 3.0}


def test_academic_year(spark):
    df = spark.createDataFrame([(date(2024, 8, 1),), (date(2024, 7, 31),)], ["d"])
    got = [r[0] for r in df.select(academic_year_from_date("d")).collect()]
    assert got == ["2024-2025", "2023-2024"]


def test_string_agg_ordered(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 3), (1, "c", 1)], ["k", "v", "o"]
    )
    got = df.groupBy("k").agg(
        string_agg_ordered("v", ",", order_by="o").alias("s")
    ).collect()[0]["s"]
    assert got == "c,b,a"


def test_string_agg_distinct(spark):
    df = spark.createDataFrame([(1, "b"), (1, "a"), (1, "b")], ["k", "v"])
    got = df.groupBy("k").agg(string_agg_distinct("v", "|").alias("s")).collect()[0]["s"]
    assert got == "a|b"


def test_xxh64_matches_spark(spark):
    """functions/xxh64.py must stay bit-compatible with Spark's
    xxhash64 (seed 42) — the q33 VALUES oracle depends on it."""
    from pyspark.sql import functions as F

    from dbt_incremental_ci_spark.functions.xxh64 import xxh64_signed

    cases = ["", "a", "hello world", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
             "q" * 100, "üñïçødé tęxt", "the quick brown fox"]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64_signed(c.encode("utf-8")) for c in cases]
