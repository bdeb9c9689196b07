"""End-to-end build of the education project: all models + the 17
reference tests must pass on the generated fixtures; incremental model
must equal a full rebuild after a second batch."""

import pytest
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.edu import build_edu_engine
from dbt_incremental_ci_spark.edu.fixtures import RUN_DATE, generate_raw_edu, to_spark


@pytest.fixture(scope="module")
def edu_engine(spark):
    eng = build_edu_engine(spark, schema="edu_t")
    results = eng.run()
    return eng, results


def test_all_nodes_succeed(edu_engine):
    eng, results = edu_engine
    bad = [r for r in results if r.status not in ("success",)]
    assert not bad, [(r.name, r.status, r.error, r.violations) for r in bad]


def test_reference_test_nodes_present(edu_engine):
    eng, results = edu_engine
    test_nodes = [
        r for r in results
        if eng.registry.get(r.name).resource_type == "test"
    ]
    assert len(test_nodes) == 17  # 14 schema + 3 singular (SURVEY §5)
    assert all(r.violations == 0 for r in test_nodes)


def test_staging_row_counts(edu_engine, spark):
    eng, _ = edu_engine
    stg = eng.resolve("stg_students")
    assert stg.count() == 200
    # academic_standing buckets all populated
    buckets = {r[0] for r in stg.select("academic_standing").distinct().collect()}
    assert buckets == {"Deans List", "Good Standing", "Academic Warning",
                       "Academic Probation"}


def test_prerequisite_chains(edu_engine):
    eng, _ = edu_engine
    chains = eng.resolve("int_course_prerequisite_chains")
    rows = chains.collect()
    assert len(rows) == 40  # every course reached exactly once (acyclic forest)
    by_depth = {}
    for r in rows:
        by_depth.setdefault(r["prerequisite_depth"], 0)
        by_depth[r["prerequisite_depth"]] += 1
    assert by_depth[0] > 0 and max(by_depth) >= 1  # roots + at least one chain
    deep = [r for r in rows if r["prerequisite_depth"] >= 1]
    assert all(" -> " in r["prerequisite_chain"] for r in deep)
    assert all(r["root_course_id"] is not None for r in deep)


def test_enrollment_history_windows(edu_engine):
    eng, _ = edu_engine
    eh = eng.resolve("int_student_enrollment_history")
    one = (
        eh.filter(F.col("student_id") == 1)
        .select("enrollment_sequence", "total_enrollments")
        .collect()
    )
    n = len(one)
    assert sorted(r["enrollment_sequence"] for r in one) == list(range(1, n + 1))
    assert all(r["total_enrollments"] == n for r in one)


def test_mart_table_materialized(edu_engine, spark):
    eng, _ = edu_engine
    assert spark.catalog.tableExists("edu_t.student_academic_summary")
    summary = spark.table("edu_t.student_academic_summary")
    assert summary.count() == 200
    assert "completion_rate" in summary.columns


def test_incremental_custom_schema(edu_engine, spark):
    # custom schema suffix: edu_t_incremental_models (dbt_project.yml:229)
    assert spark.catalog.tableExists(
        "edu_t_incremental_models.student_enrollment_history_incremental"
    )


def test_incremental_equals_full_rebuild(spark):
    """The core invariant (SURVEY §5): run on batch1, then batch2 with
    overlaps — equals a from-scratch build on batch1 ∪ batch2."""
    pdfs = generate_raw_edu(n_students=40)
    enr = pdfs["enrollments"].sort_values("enrollment_date").reset_index(drop=True)
    half_date = enr["enrollment_date"].iloc[len(enr) // 2]
    batch1 = enr[enr["enrollment_date"] <= half_date]
    batch2 = enr[enr["enrollment_date"] > half_date]

    # incremental path: batch1 build, then full-source rerun (watermark
    # keeps only batch2 rows)
    pdfs_b1 = dict(pdfs)
    pdfs_b1["enrollments"] = batch1
    eng1 = None
    import dbt_incremental_ci_spark.edu.project as project
    from dbt_incremental_ci_spark.edu.fixtures import to_spark
    from dbt_incremental_ci_spark.edu.project import edu_registry
    from dbt_incremental_ci_spark.plans.runner import Engine

    spark.sql("DROP TABLE IF EXISTS "
              "edu_inc_incremental_models.student_enrollment_history_incremental")
    sel = ["students", "courses", "departments", "faculty", "semesters",
           "class_sessions", "assignments", "assignment_submissions",
           "financial_aid", "tuition_payments"]
    target = "student_enrollment_history_incremental"
    for batch_pdfs in (pdfs_b1, pdfs):
        eng1 = Engine(
            spark, edu_registry(), schema="edu_inc",
            sources=to_spark(spark, batch_pdfs), run_date=RUN_DATE,
        )
        res = {r.name: r for r in eng1.run(
            select=["stg_enrollments", target]
        )}
        assert res[target].status == "success", res[target].error

    incremental = spark.table(
        "edu_inc_incremental_models.student_enrollment_history_incremental"
    )

    # full rebuild path
    spark.sql("DROP TABLE IF EXISTS "
              "edu_full_incremental_models.student_enrollment_history_incremental")
    eng2 = Engine(
        spark, edu_registry(), schema="edu_full",
        sources=to_spark(spark, pdfs), run_date=RUN_DATE,
    )
    res = {r.name: r for r in eng2.run(select=["stg_enrollments", target])}
    assert res[target].status == "success"
    full = spark.table(
        "edu_full_incremental_models.student_enrollment_history_incremental"
    )

    cols = sorted(incremental.columns)
    a = sorted(map(tuple, incremental.select(*cols).collect()))
    b = sorted(map(tuple, full.select(*cols).collect()))
    assert a == b


def test_all_views_execute(edu_engine):
    """View models are lazy plans — force each one to run end-to-end."""
    eng, _ = edu_engine
    counts = {}
    for m in eng.registry.models():
        if m.materialized in ("view", "ephemeral") and m.resource_type == "model":
            counts[m.name] = eng.resolve(m.name).count()
    assert all(n > 0 for n in counts.values()), counts


def test_collaboration_networks_shape(edu_engine):
    eng, _ = edu_engine
    nets = eng.resolve("int_academic_collaboration_networks")
    rows = nets.limit(2000).collect()
    assert rows, "expected collaborating pairs (fixtures guarantee cohorts)"
    assert all(r["student_a"] < r["student_b"] for r in rows)
    assert all(r["shared_courses"] >= 2 for r in rows)
    assert "collaboration_value_score" in nets.columns


def test_grade_inflation_windows(edu_engine):
    eng, _ = edu_engine
    gia = eng.resolve("int_grade_inflation_analysis")
    rows = gia.collect()
    assert rows
    # first year per course: no previous-year values, zero cumulative change
    firsts = [r for r in rows if r["prev_year_gpa"] is None]
    assert firsts and all(abs(r["cumulative_gpa_change"]) < 1e-9 for r in firsts)


def test_full_model_inventory(edu_engine):
    """Parity with the reference manifest: 47 models (24 view / 21 table /
    2 incremental), 3 seeds, 17 tests (SURVEY intro + §5)."""
    eng, _ = edu_engine
    models = [m for m in eng.registry.models() if m.resource_type == "model"]
    seeds = [m for m in eng.registry.models() if m.resource_type == "seed"]
    tests = [m for m in eng.registry.models() if m.resource_type == "test"]
    by_mat = {}
    for m in models:
        by_mat.setdefault(m.materialized, []).append(m.name)
    assert len(models) == 47, sorted(m.name for m in models)
    assert len(by_mat.get("view", [])) == 24
    assert len(by_mat.get("table", [])) == 21
    assert len(by_mat.get("incremental", [])) == 2
    assert len(seeds) == 3
    assert len(tests) == 17
