"""Incremental materialization: the core invariant of the reference —
an incremental run over appended batches must equal a from-scratch full
rebuild (SURVEY §5 'Incremental-specific test')."""

from datetime import date

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.incremental.merge import (
    incremental_upsert,
    read_watermark,
    watermark_filter,
)


def rows(spark, table):
    return sorted(
        tuple(r) for r in spark.table(table).select("id", "d", "val").collect()
    )


def test_upsert_equals_full_rebuild(spark):
    b1 = spark.createDataFrame(
        [(1, date(2024, 1, 1), "a"), (2, date(2024, 1, 2), "b")], ["id", "d", "val"]
    )
    # batch 2 overlaps id=2 (late update) and adds id=3
    b2 = spark.createDataFrame(
        [(2, date(2024, 1, 2), "b2"), (3, date(2024, 1, 3), "c")], ["id", "d", "val"]
    )
    tgt = "t_inc.ev"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    assert incremental_upsert(spark, tgt, b1, unique_key="id") == "created"
    assert incremental_upsert(spark, tgt, b2, unique_key="id") == "merged"
    assert rows(spark, tgt) == [
        (1, date(2024, 1, 1), "a"),
        (2, date(2024, 1, 2), "b2"),
        (3, date(2024, 1, 3), "c"),
    ]


def test_watermark_roundtrip(spark):
    tgt = "t_inc.wm"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame(
        [(1, date(2024, 1, 1), "a"), (2, date(2024, 1, 5), "b")], ["id", "d", "val"]
    )
    incremental_upsert(spark, tgt, b1, unique_key="id")
    wm = read_watermark(spark, tgt, "d")
    assert wm == date(2024, 1, 5)
    src = spark.createDataFrame(
        [(2, date(2024, 1, 5), "dup"), (3, date(2024, 1, 6), "new")],
        ["id", "d", "val"],
    )
    new = watermark_filter(src, "d", wm, strict=True)
    assert [r["id"] for r in new.collect()] == [3]
    # default watermark when table missing
    assert read_watermark(spark, "t_inc.nope", "d", default=date(1900, 1, 1)) == date(
        1900, 1, 1
    )


def test_append_only(spark):
    tgt = "t_inc.app"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b = spark.createDataFrame([(1, date(2024, 1, 1), "a")], ["id", "d", "val"])
    incremental_upsert(spark, tgt, b, unique_key=None)
    incremental_upsert(spark, tgt, b, unique_key=None)
    assert spark.table(tgt).count() == 2


def test_schema_evolution_append_new_columns(spark):
    tgt = "t_inc.evolve"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame([(1, "a")], ["id", "val"])
    incremental_upsert(spark, tgt, b1, unique_key="id")
    b2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "val", "score"])
    incremental_upsert(
        spark, tgt, b2, unique_key="id", on_schema_change="append_new_columns"
    )
    got = {r["id"]: (r["val"], r["score"]) for r in spark.table(tgt).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_partitioned_merge_rewrites_only_affected_partitions(spark):
    tgt = "t_inc.part"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-01", "b"), (3, "2024-02", "c")],
        ["id", "month", "val"],
    )
    incremental_upsert(spark, tgt, b1, unique_key="id", partition_by=["month"])
    b2 = spark.createDataFrame(
        [(3, "2024-02", "c2"), (4, "2024-02", "d")], ["id", "month", "val"]
    )
    incremental_upsert(spark, tgt, b2, unique_key="id", partition_by=["month"])
    got = {r["id"]: (r["month"], r["val"]) for r in spark.table(tgt).collect()}
    assert got == {
        1: ("2024-01", "a"),
        2: ("2024-01", "b"),
        3: ("2024-02", "c2"),
        4: ("2024-02", "d"),
    }


def test_batch_internal_duplicates_deduped(spark):
    tgt = "t_inc.dupes"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame([(1, date(2024, 1, 1), "a")], ["id", "d", "val"])
    incremental_upsert(spark, tgt, b1, unique_key="id")
    b2 = spark.createDataFrame(
        [(2, date(2024, 1, 2), "x"), (2, date(2024, 1, 2), "x")], ["id", "d", "val"]
    )
    incremental_upsert(spark, tgt, b2, unique_key="id")
    assert spark.table(tgt).count() == 2


def test_partitioned_merge_key_moves_partition(spark):
    """A key arriving under a new partition value must evict its stale
    row from the old partition (dbt delete+insert deletes table-wide),
    and a partition left empty by the move must disappear."""
    tgt = "t_inc.moved"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-02", "b"), (3, "2024-03", "c")],
        ["id", "month", "val"],
    )
    incremental_upsert(spark, tgt, b1, unique_key="id", partition_by=["month"])
    # id=2 corrects its month 2024-02 -> 2024-01 (old partition keeps
    # nothing else -> must be dropped); id=3 stays put with a new value
    b2 = spark.createDataFrame(
        [(2, "2024-01", "b2"), (3, "2024-03", "c2")], ["id", "month", "val"]
    )
    incremental_upsert(spark, tgt, b2, unique_key="id", partition_by=["month"])
    got = {r["id"]: (r["month"], r["val"]) for r in spark.table(tgt).collect()}
    assert got == {
        1: ("2024-01", "a"),
        2: ("2024-01", "b2"),
        3: ("2024-03", "c2"),
    }
    months = {r["month"] for r in spark.table(tgt).select("month").distinct().collect()}
    assert months == {"2024-01", "2024-03"}


def test_large_key_batch_no_forced_broadcast(spark):
    """A backfill batch with >=10^5 distinct keys goes through the
    partition-scoped path with NO BroadcastExchange in the executed
    stale-partition plan when AQE declines to broadcast (threshold -1
    emulates a key set larger than executor memory allows) — the
    round-2 scale fix for the forced-broadcast OOM at merge.py's
    moved-key semi-join."""
    from dbt_incremental_ci_spark.incremental.merge import merge_scope

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        target = spark.range(0, 200_000).select(
            F.col("id"), (F.col("id") % 16).cast("int").alias("p"),
            F.lit("old").alias("val"),
        )
        # 120k distinct keys: 100k updates + 20k inserts; key 5 moves
        # partitions would need a different p — keep p = id % 16 so the
        # scope is partition-complete either way.
        batch = spark.range(100_000, 220_000).select(
            F.col("id"), (F.col("id") % 16).cast("int").alias("p"),
            F.lit("new").alias("val"),
        )
        all_parts, affected = merge_scope(target, batch, "id", ["p"])
        # collect() (not count()) so the DataFrame's OWN QueryExecution
        # runs — count() derives a separate plan and the adaptive plan
        # here would never finalize
        assert len(all_parts.collect()) == 16
        plan = all_parts._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "BroadcastExchange" not in plan, plan

        # end-to-end: the full merge at this key count stays correct
        tgt = "t_inc.bigkeys"
        spark.sql("CREATE DATABASE IF NOT EXISTS t_inc")
        spark.sql("DROP TABLE IF EXISTS " + tgt)
        incremental_upsert(spark, tgt, target, unique_key="id", partition_by=["p"])
        assert (
            incremental_upsert(spark, tgt, batch, unique_key="id", partition_by=["p"])
            == "merged"
        )
        out = spark.table(tgt)
        assert out.count() == 220_000
        assert out.filter(F.col("val") == "new").count() == 120_000
        assert out.filter((F.col("id") == 150_000) & (F.col("val") == "new")).count() == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
