"""Salted join == plain join, on a deliberately skewed key."""

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.skew import salted_join


def _frames(spark):
    # 90% of the big side lands on key 1 (the straggler scenario)
    big = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "cool"), (99, "orphan")], ["k", "name"]
    )
    return big, small


def _key(rows):
    return sorted((r["k"], r["payload"], r["name"]) for r in rows)


def test_salted_inner_equals_plain(spark):
    big, small = _frames(spark)
    plain = big.join(small, on=["k"], how="inner")
    salted = salted_join(big, small, on=["k"], how="inner", salts=8)
    assert _key(salted.collect()) == _key(plain.collect())
    assert set(salted.columns) == set(plain.columns)


def test_salted_left_equals_plain(spark):
    big, small = _frames(spark)
    plain = big.join(small, on=["k"], how="left")
    salted = salted_join(big, small, on=["k"], how="left", salts=8)
    assert _key(salted.collect()) == _key(plain.collect())


def test_salt_actually_spreads_hot_key(spark):
    big, small = _frames(spark)
    b = salted_join(big, small, on=["k"], how="inner", salts=8)
    # peek at the pre-drop salt distribution by rebuilding it the same way
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    per_salt = (
        salted.filter(F.col("k") == 1).groupBy("__salt").count().collect()
    )
    assert len(per_salt) == 8  # hot key spread over all 8 reducer groups
    assert b.count() > 0
