"""Engine tests: registry, DAG ordering, materializations, tests-as-nodes."""

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.dag import descendants, topo_sort
from dbt_incremental_ci_spark.plans.registry import Model, ModelRegistry
from dbt_incremental_ci_spark.plans.runner import Engine


def build_registry():
    reg = ModelRegistry()

    @reg.model("stg_orders", deps=["raw_orders"])
    def stg_orders(ctx):
        return ctx.source("raw_orders").filter(F.col("amount") > 0)

    @reg.model("mart_totals", deps=["stg_orders"], materialized="table")
    def mart_totals(ctx):
        return (
            ctx.ref("stg_orders")
            .groupBy("cust")
            .agg(F.sum("amount").alias("total"))
        )

    @reg.model(
        "test_totals_positive", deps=["mart_totals"], resource_type="test"
    )
    def test_totals_positive(ctx):
        return ctx.ref("mart_totals").filter(F.col("total") < 0)

    return reg


def test_topo_and_descendants():
    reg = build_registry()
    order = topo_sort(reg.parent_map())
    assert order.index("stg_orders") < order.index("mart_totals")
    kids = descendants(reg.child_map(), {"stg_orders"})
    assert kids == {"mart_totals", "test_totals_positive"}


def test_engine_run(spark):
    reg = build_registry()
    raw = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", -1.0), ("b", 7.0)], ["cust", "amount"]
    )
    eng = Engine(spark, reg, schema="t_eng", sources={"raw_orders": raw})
    results = eng.run()
    by_name = {r.name: r for r in results}
    assert by_name["stg_orders"].status == "success"
    assert by_name["mart_totals"].status == "success"
    assert by_name["test_totals_positive"].status == "success"
    got = {
        r["cust"]: r["total"]
        for r in spark.table("t_eng.mart_totals").collect()
    }
    assert got == {"a": 15.0, "b": 7.0}


def test_engine_test_failure_skips_downstream(spark):
    reg = ModelRegistry()

    @reg.model("m1", materialized="table")
    def m1(ctx):
        return ctx.spark.range(3).select(F.col("id").alias("v"))

    @reg.model("t1", deps=["m1"], resource_type="test")
    def t1(ctx):
        return ctx.ref("m1").filter(F.col("v") >= 0)  # 3 violations

    @reg.model("m2", deps=["t1"], materialized="table")
    def m2(ctx):
        return ctx.ref("m1")

    eng = Engine(spark, reg, schema="t_eng2")
    results = {r.name: r for r in eng.run()}
    assert results["t1"].status == "test_failed"
    assert results["t1"].violations == 3
    assert results["m2"].status == "skipped"


def test_sql_string_model(spark):
    reg = ModelRegistry()

    @reg.model("v1")
    def v1(ctx):
        return ctx.spark.range(5).select(F.col("id").alias("n"))

    @reg.model("sql_model", deps=["v1"], materialized="table")
    def sql_model(ctx):
        return "SELECT CAST(SUM(n) AS BIGINT) AS s FROM v1"

    eng = Engine(spark, reg, schema="t_eng3")
    res = {r.name: r for r in eng.run()}
    assert res["sql_model"].status == "success"
    assert spark.table("t_eng3.sql_model").collect()[0]["s"] == 10


def test_duplicate_model_rejected():
    reg = ModelRegistry()
    reg.register(Model(name="x", builder=lambda ctx: None))
    with pytest.raises(ValueError):
        reg.register(Model(name="x", builder=lambda ctx: None))


def test_fingerprint_changes_with_config():
    m1 = Model(name="x", builder=lambda ctx: 1, materialized="view")
    m2 = Model(name="x", builder=lambda ctx: 1, materialized="table")
    assert m1.fingerprint() != m2.fingerprint()


def test_load_jsonl_with_quarantine(spark, tmp_path):
    """JSONL source: explicit schema, malformed lines quarantined
    instead of failing the job (PERMISSIVE corrupt-record routing)."""
    from dbt_incremental_ci_spark.sources.catalog import load_jsonl, split_corrupt

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "world"}\n'
        '{"doc_id": "oops"}\n'
    )
    df = load_jsonl(spark, str(p), "doc_id long, text string")
    clean, bad = split_corrupt(df)
    good = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert good == {1: "hello", 2: "world"}
    bad_rows = bad.collect()
    assert "this is not json" in [r["_corrupt_record"] for r in bad_rows]
    assert len(bad_rows) == 2  # type-mismatch line quarantined too


def test_driver_bound_contract():
    """docs/SCALE.md §7: every .collect()/.first()/.toPandas() in the
    package must carry a '# driver-bound:' tag within the 3 preceding
    lines (or on the same line) stating its bound. A new driver-side
    materialization without a stated bound fails here."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "dbt_incremental_ci_spark"
    pat = re.compile(r"\.(collect|toPandas)\(\)|\.first\(\)")
    missing = []
    for py in pkg.rglob("*.py"):
        lines = py.read_text().split("\n")
        for i, ln in enumerate(lines):
            code = ln.split("#")[0]
            if not pat.search(code):
                continue
            window = "\n".join(lines[max(0, i - 3) : i + 1])
            if "# driver-bound:" not in window:
                missing.append(f"{py.name}:{i + 1}: {ln.strip()}")
    assert not missing, (
        "driver-side materialization without a '# driver-bound:' tag "
        "(see docs/SCALE.md §7):\n" + "\n".join(missing)
    )
