"""The reference's 17 test nodes as engine test models (each returns a
violations DataFrame; the engine asserts zero rows — SURVEY §5).

- 14 schema tests from sources.yml:10-67 (unique + not_null on 6 id
  columns, unique on students.email and courses.course_code);
- 3 singular tests from DEDP/tests/*.sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry

# (source table, column, [unique?, not_null?]) per sources.yml
SCHEMA_TESTS: list[tuple[str, str, bool, bool]] = [
    ("students", "student_id", True, True),
    ("students", "email", True, False),
    ("courses", "course_id", True, True),
    ("courses", "course_code", True, False),
    ("departments", "department_id", True, True),
    ("faculty", "faculty_id", True, True),
    ("enrollments", "enrollment_id", True, True),
    ("semesters", "semester_id", True, True),
]


def register_tests(reg: ModelRegistry) -> None:
    for table, col, uniq, nn in SCHEMA_TESTS:
        if uniq:
            _register_unique(reg, table, col)
        if nn:
            _register_not_null(reg, table, col)

    @reg.model("test_data_quality_checks", deps=["stg_students"], resource_type="test")
    def test_data_quality_checks(ctx) -> DataFrame:
        # ref: DEDP/tests/test_data_quality_checks.sql:1-4
        return ctx.ref("stg_students").filter(
            (F.col("gpa") < 0.0) | (F.col("gpa") > 4.0)
        )

    @reg.model(
        "test_enrollment_integrity",
        deps=["stg_enrollments", "stg_semesters"],
        resource_type="test",
    )
    def test_enrollment_integrity(ctx) -> DataFrame:
        # ref: DEDP/tests/test_enrollment_integrity.sql:1-6
        e = ctx.ref("stg_enrollments")
        s = ctx.ref("stg_semesters").select("semester_id", "end_date")
        return e.join(s, "semester_id").filter(
            (F.col("enrollment_date") > F.col("end_date"))
            | (
                F.col("completion_date").isNotNull()
                & (F.col("completion_date") < F.col("enrollment_date"))
            )
        )

    @reg.model(
        "test_financial_consistency", deps=["stg_financial_aid"], resource_type="test"
    )
    def test_financial_consistency(ctx) -> DataFrame:
        # ref: DEDP/tests/test_financial_consistency.sql:1-5
        return ctx.ref("stg_financial_aid").filter(
            (F.col("amount") > 50_000) | (F.col("amount") < 0)
        )


def _register_unique(reg: ModelRegistry, table: str, col: str) -> None:
    @reg.model(f"source_unique_raw_edu_{table}_{col}", deps=[table],
               resource_type="test")
    def unique_test(ctx, table=table, col=col) -> DataFrame:
        return (
            ctx.source(table)
            .filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )


def _register_not_null(reg: ModelRegistry, table: str, col: str) -> None:
    @reg.model(f"source_not_null_raw_edu_{table}_{col}", deps=[table],
               resource_type="test")
    def not_null_test(ctx, table=table, col=col) -> DataFrame:
        return ctx.source(table).filter(F.col(col).isNull())
