"""SCD-2 snapshot materialization: open/close version semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.incremental.snapshot import snapshot
from dbt_incremental_ci_spark.plans.registry import ModelRegistry
from dbt_incremental_ci_spark.plans.runner import Engine

T1 = datetime(2024, 1, 1)
T2 = datetime(2024, 2, 1)
T3 = datetime(2024, 3, 1)


def test_snapshot_scd2_lifecycle(spark):
    tgt = "t_snap.customers"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_snap")
    spark.sql("DROP TABLE IF EXISTS " + tgt)

    b1 = spark.createDataFrame([(1, "alice", "NY"), (2, "bob", "LA")],
                               ["id", "name", "city"])
    assert snapshot(spark, tgt, b1, "id", run_ts=T1) == "created"
    rows = spark.table(tgt).collect()
    assert len(rows) == 2 and all(r["dbt_valid_to"] is None for r in rows)

    # bob moves, carol appears, alice unchanged
    b2 = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "SF"), (3, "carol", "TX")],
        ["id", "name", "city"],
    )
    assert snapshot(spark, tgt, b2, "id", run_ts=T2) == "updated"
    t = spark.table(tgt)
    assert t.count() == 4  # alice open, bob closed + bob open, carol open
    bob = {(r["city"], r["dbt_valid_to"]) for r in t.filter("id = 2").collect()}
    assert bob == {("LA", T2), ("SF", None)}
    alice = t.filter("id = 1").collect()
    assert len(alice) == 1 and alice[0]["dbt_valid_to"] is None
    assert alice[0]["dbt_valid_from"] == T1  # untouched

    # alice vanishes → closed; everything else unchanged
    b3 = spark.createDataFrame([(2, "bob", "SF"), (3, "carol", "TX")],
                               ["id", "name", "city"])
    snapshot(spark, tgt, b3, "id", run_ts=T3)
    t = spark.table(tgt)
    alice = t.filter("id = 1").collect()
    assert len(alice) == 1 and alice[0]["dbt_valid_to"] == T3
    assert t.filter(F.col("dbt_valid_to").isNull()).count() == 2


def test_snapshot_check_cols_subset(spark):
    tgt = "t_snap.subset"
    spark.sql("CREATE DATABASE IF NOT EXISTS t_snap")
    spark.sql("DROP TABLE IF EXISTS " + tgt)
    b1 = spark.createDataFrame([(1, "a", 10)], ["id", "tracked", "ignored"])
    snapshot(spark, tgt, b1, "id", check_cols=["tracked"], run_ts=T1)
    # only the untracked column changes → no new version
    b2 = spark.createDataFrame([(1, "a", 99)], ["id", "tracked", "ignored"])
    snapshot(spark, tgt, b2, "id", check_cols=["tracked"], run_ts=T2)
    assert spark.table(tgt).count() == 1


def test_snapshot_via_engine(spark):
    reg = ModelRegistry()

    @reg.model("snap_model", materialized="snapshot", unique_key="id",
               resource_type="snapshot")
    def snap_model(ctx):
        return ctx.spark.createDataFrame([(1, "x")], ["id", "v"])

    eng = Engine(spark, reg, schema="t_snap_e")
    res = {r.name: r for r in eng.run()}
    assert res["snap_model"].status == "success"
    row = spark.table("t_snap_e.snap_model").collect()[0]
    assert row["dbt_valid_to"] is None and row["dbt_scd_id"] is not None
