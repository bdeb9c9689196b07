"""dbt-style SQL-text model authoring: config parsing, ref/source
inlining, is_incremental() rendering, frozen clock."""

from datetime import date

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry
from dbt_incremental_ci_spark.plans.runner import Engine
from dbt_incremental_ci_spark.plans.sqlmodel import extract_deps, register_sql_model


def test_extract_deps():
    sql = "select * from {{ ref('stg_a') }} join {{ source('raw', 'b') }} using (id)"
    assert extract_deps(sql) == ["b", "stg_a"]


def test_sql_model_pipeline(spark):
    reg = ModelRegistry()
    register_sql_model(
        reg,
        "stg_orders",
        """
        {{ config(materialized='view') }}
        select id, amount, case when amount >= 10 then 'big' else 'small' end
            as size_bucket
        from {{ source('raw', 'orders') }}
        """,
    )
    register_sql_model(
        reg,
        "mart_sizes",
        """
        {{ config(materialized='table') }}
        select size_bucket, count(*) as n, current_date as asof
        from {{ ref('stg_orders') }}
        group by size_bucket
        """,
    )
    raw = spark.createDataFrame([(1, 5.0), (2, 20.0), (3, 11.0)], ["id", "amount"])
    eng = Engine(spark, reg, schema="t_sqlm", sources={"orders": raw},
                 run_date=date(2024, 10, 15))
    res = {r.name: r for r in eng.run()}
    assert all(r.status == "success" for r in res.values()), res
    got = {r["size_bucket"]: r["n"] for r in spark.table("t_sqlm.mart_sizes").collect()}
    assert got == {"big": 2, "small": 1}
    asof = spark.table("t_sqlm.mart_sizes").select("asof").first()[0]
    assert str(asof) == "2024-10-15"  # frozen clock substituted


def test_sql_model_incremental(spark):
    reg = ModelRegistry()
    register_sql_model(
        reg,
        "inc_events",
        """
        {{ config(materialized='incremental', unique_key='id') }}
        select id, d, val from {{ source('raw', 'events') }}
        {% if is_incremental() %}
        where d > (select coalesce(max(d), DATE '1900-01-01') from {{ this }})
        {% endif %}
        """,
    )
    assert reg.get("inc_events").materialized == "incremental"
    assert reg.get("inc_events").unique_key == "id"
    b1 = spark.createDataFrame(
        [(1, date(2024, 1, 1), "a"), (2, date(2024, 1, 2), "b")], ["id", "d", "val"]
    )
    spark.sql("DROP TABLE IF EXISTS t_sqlm2.inc_events")
    eng = Engine(spark, reg, schema="t_sqlm2", sources={"events": b1})
    assert eng.run()[0].status == "success"
    assert spark.table("t_sqlm2.inc_events").count() == 2

    # second run: one stale row (filtered by the is_incremental block),
    # one new row past the watermark
    b2 = spark.createDataFrame(
        [(1, date(2024, 1, 1), "STALE"), (3, date(2024, 1, 5), "c")],
        ["id", "d", "val"],
    )
    eng2 = Engine(spark, reg, schema="t_sqlm2", sources={"events": b2})
    assert eng2.run()[0].status == "success"
    got = {r["id"]: r["val"] for r in spark.table("t_sqlm2.inc_events").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # stale row excluded by its own filter
