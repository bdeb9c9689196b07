"""Bucketed-table co-located joins: the 100 TB shuffle eliminator.

Writes both join sides bucketed by the key and asserts the physical
plan contains NO shuffle Exchange for the join (SortMergeJoin reads
bucket-aligned data directly) — the strategy SURVEY §4 prescribes for
repeated large-fact joins."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS t_bkt")
    spark.sql("DROP TABLE IF EXISTS t_bkt.facts")
    spark.sql("DROP TABLE IF EXISTS t_bkt.dims")
    spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "t_bkt.facts"
    )
    spark.range(0, 1_000).select(
        F.col("id").alias("k"), F.lit("d").alias("name")
    ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "t_bkt.dims"
    )
    # disable auto-broadcast so the join would otherwise shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bkt.facts").join(
            spark.table("t_bkt.dims"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
