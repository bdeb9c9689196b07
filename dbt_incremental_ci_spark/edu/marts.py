"""Marts tier: table materializations + the incremental model.

Ports of DEDP/models/marts/**/*.sql (cited per model)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts(reg: ModelRegistry) -> None:
    @reg.model(
        "student_academic_summary",
        deps=["stg_students", "stg_departments", "int_student_enrollment_history"],
        materialized="table",
    )
    def student_academic_summary(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/student_academic_summary.sql:1-56
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "email", "age", "years_enrolled",
            "student_status", "gpa", "academic_standing", "current_status",
            "major_id",
        )
        d = ctx.ref("stg_departments").select(
            F.col("department_id"),
            F.col("department_name").alias("major_department"),
            F.col("department_code").alias("major_code"),
        )
        eh = (
            ctx.ref("int_student_enrollment_history")
            .groupBy("student_id")
            .agg(
                F.max("total_enrollments").alias("total_enrollments"),
                F.max("total_credits_attempted").alias("total_credits_attempted"),
                F.max("total_credits_earned").alias("total_credits_earned"),
                F.max("failed_courses_count").alias("failed_courses_count"),
                F.max("withdrawn_courses_count").alias("withdrawn_courses_count"),
                F.max("avg_grade_points").alias("avg_grade_points"),
                F.max("avg_attendance").alias("avg_attendance"),
            )
        )
        earned, attempted = F.col("total_credits_earned"), F.col("total_credits_attempted")
        failed, withdrawn = F.col("failed_courses_count"), F.col("withdrawn_courses_count")
        return (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(eh, "student_id", "left")
            .select(
                "*",
                F.round(
                    earned.cast("decimal(18,2)")
                    / F.when(attempted != 0, attempted) * 100,
                    2,
                ).alias("completion_rate"),
                F.when(earned >= 120, "Graduation Ready")
                .when(earned >= 90, "Senior Standing")
                .when(earned >= 60, "Junior Standing")
                .when(earned >= 30, "Sophomore Standing")
                .otherwise("Freshman Standing")
                .alias("class_standing"),
                F.when((failed == 0) & (withdrawn == 0), "Excellent Progress")
                .when((failed <= 1) & (withdrawn <= 1), "Good Progress")
                .when((failed <= 3) | (withdrawn <= 3), "At Risk")
                .otherwise("Critical Status")
                .alias("progress_indicator"),
            )
        )

    @reg.model(
        "student_enrollment_history_incremental",
        deps=["stg_enrollments"],
        materialized="incremental",
        unique_key="enrollment_id",
        watermark_col="enrollment_date",
        watermark_strict=True,
        schema="incremental_models",  # custom schema (dbt_project.yml:229-230)
        on_schema_change="append_new_columns",
        # partition by semester → incremental MERGE rewrites only the
        # semesters receiving late rows (the 100 TB plan, docs/SCALE.md §5)
        partition_by=["semester_id"],
    )
    def student_enrollment_history_incremental(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/
        #   student_enrollment_history_incremental.sql:1-26 — strict `>`
        # watermark with coalesce-to-epoch fallback (sql:25), unique-key
        # delete+insert (engine MERGE), frozen current_timestamp.
        g, att = F.col("grade"), F.col("attendance_percentage")
        return ctx.ref("stg_enrollments").select(
            "enrollment_id",
            "student_id",
            "course_id",
            "semester_id",
            "enrollment_date",
            "grade",
            "grade_points",
            "attendance_percentage",
            F.when(g.isin("A+", "A", "A-"), "High").otherwise("Standard").alias(
                "performance_level"
            ),
            F.when(att >= 90, "Excellent")
            .when(att >= 75, "Good")
            .otherwise("Poor")
            .alias("attendance_rating"),
            F.lit(ctx.run_date).cast("timestamp").alias("last_updated"),
        )

    @reg.model(
        "department_efficiency_report",
        deps=["int_department_analytics", "int_course_performance_metrics"],
        materialized="table",
    )
    def department_efficiency_report(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/department_efficiency_report.sql:1-58.
        # The reference joins `da.department_id = cpm.course_id` (sql:52,
        # self-described "assumes course_id maps to department") — a
        # miskeyed join (SURVEY §2 J13) preserved deliberately for parity.
        da = ctx.ref("int_department_analytics")
        cpm = ctx.ref("int_course_performance_metrics").select(
            "course_id", "pass_rate", "withdrawal_rate", "avg_attendance"
        )
        joined = da.join(
            F.broadcast(cpm), da.department_id == cpm.course_id, "left"
        ).drop("course_id")
        passthrough = [c for c in da.columns]
        scp = F.col("salary_cost_percentage")
        avg_pass = F.avg("pass_rate")
        return joined.groupBy(*passthrough).agg(
            avg_pass.alias("dept_avg_pass_rate"),
            F.avg("withdrawal_rate").alias("dept_avg_withdrawal_rate"),
            F.avg("avg_attendance").alias("dept_avg_attendance"),
            F.count(F.when(F.col("pass_rate") >= 80, 1)).alias(
                "high_performing_courses"
            ),
            F.count(F.when(F.col("withdrawal_rate") >= 15, 1)).alias(
                "problematic_courses"
            ),
            F.max(
                F.when(scp <= 60, "Efficient Budget Management")
                .when(scp <= 75, "Moderate Budget Management")
                .when(scp <= 90, "Tight Budget Management")
                .otherwise("Over Budget")
            ).alias("budget_efficiency"),
            F.when(avg_pass >= 85, "Excellent Academic Performance")
            .when(avg_pass >= 75, "Good Academic Performance")
            .when(avg_pass >= 65, "Fair Academic Performance")
            .otherwise("Poor Academic Performance")
            .alias("academic_performance_category"),
            F.max(
                F.round(
                    F.col("total_enrollments").cast("decimal(18,2)")
                    / F.when(F.col("budget") != 0, F.col("budget")) * 100_000,
                    2,
                )
            ).alias("enrollments_per_100k_budget"),
            F.max(
                F.round(
                    F.col("student_count").cast("decimal(18,2)")
                    / F.when(F.col("budget") != 0, F.col("budget")) * 100_000,
                    2,
                )
            ).alias("students_per_100k_budget"),
        )


def register_marts_finance(reg: ModelRegistry) -> None:
    @reg.model(
        "student_financial_profile",
        deps=["stg_students", "stg_departments", "stg_financial_aid",
              "stg_tuition_payments", "stg_semesters"],
        materialized="table",
    )
    def student_financial_profile(ctx) -> DataFrame:
        # ref: DEDP/models/marts/finance/student_financial_profile.sql:1-110 —
        # two left-join fan-outs (aid × payments per student), distinct-count
        # collapse, pivot-style max(case) per aid category (A7).
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "email", "student_status", "gpa",
            "academic_standing", "years_enrolled", "major_id",
        )
        d = ctx.ref("stg_departments").select(
            F.col("department_id"), F.col("department_name").alias("major_department")
        )
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"), "aid_id", "aid_category",
            F.col("amount").alias("aid_amount"),
            F.col("academic_year").alias("aid_academic_year"),
        )
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("student_id").alias("tp_student"), "payment_id", "semester_id",
            F.col("amount").alias("payment_amount"), "late_fee", "total_payment",
            "payment_timeliness",
        )
        sem = ctx.ref("stg_semesters").select(
            "semester_id", F.col("academic_year").alias("payment_academic_year")
        )
        joined = (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(fa, s.student_id == fa.fa_student, "left")
            .join(tp, s.student_id == tp.tp_student, "left")
            .join(F.broadcast(sem), "semester_id", "left")
        )
        n_late = F.count(F.when(F.col("payment_timeliness") == "Late Payment", 1))
        n_pay = F.count("payment_id")

        def max_cat(cat):
            return F.max(
                F.when(F.col("aid_category") == cat, F.col("aid_amount")).otherwise(
                    F.lit(0).cast("decimal(10,2)")
                )
            )

        summary = (
            joined.filter(F.col("student_id").isNotNull())
            .groupBy(
                "student_id", "full_name", "email", "student_status", "gpa",
                "academic_standing", "years_enrolled", "major_department",
            )
            .agg(
                F.countDistinct("aid_id").alias("total_aid_awards"),
                F.sum("aid_amount").alias("total_aid_received"),
                F.avg("aid_amount").alias("avg_aid_amount"),
                F.countDistinct("payment_id").alias("total_payments_made"),
                F.sum("payment_amount").alias("total_tuition_paid"),
                F.sum("late_fee").alias("total_late_fees"),
                F.sum("total_payment").alias("total_amount_paid"),
                F.avg("payment_amount").alias("avg_payment_amount"),
                n_late.alias("late_payments_count"),
                F.round(n_late * 100.0 / F.when(n_pay != 0, n_pay), 2).alias(
                    "late_payment_rate"
                ),
                max_cat("Merit-Based").alias("max_merit_aid"),
                max_cat("Need-Based").alias("max_need_aid"),
                max_cat("Loan").alias("max_loan_amount"),
                F.countDistinct("aid_academic_year").alias("aid_years_count"),
                F.countDistinct("payment_academic_year").alias("payment_years_count"),
            )
        )
        tar = F.col("total_aid_received")
        lpr = F.col("late_payment_rate")
        tlf = F.col("total_late_fees")
        ye = F.when(F.col("years_enrolled") != 0, F.col("years_enrolled"))
        return summary.select(
            "*",
            F.when(tar >= 20_000, "High Aid Recipient")
            .when(tar >= 10_000, "Moderate Aid Recipient")
            .when(tar >= 5_000, "Low Aid Recipient")
            .when(tar > 0, "Minimal Aid Recipient")
            .otherwise("No Aid Received")
            .alias("aid_recipient_category"),
            F.when(lpr == 0, "Excellent Payment History")
            .when(lpr <= 10, "Good Payment History")
            .when(lpr <= 25, "Fair Payment History")
            .otherwise("Poor Payment History")
            .alias("payment_reliability"),
            F.when(tlf == 0, "No Late Fees")
            .when(tlf <= 100, "Minimal Late Fees")
            .when(tlf <= 500, "Moderate Late Fees")
            .otherwise("High Late Fees")
            .alias("late_fee_category"),
            F.round(tar / ye, 2).alias("avg_aid_per_year"),
            F.round(F.col("total_tuition_paid") / ye, 2).alias(
                "avg_tuition_per_year"
            ),
            F.when(
                (F.col("max_merit_aid") > F.col("max_need_aid"))
                & (F.col("max_merit_aid") > F.col("max_loan_amount")),
                "Merit-Based Primary",
            )
            .when(F.col("max_need_aid") > F.col("max_loan_amount"),
                  "Need-Based Primary")
            .when(F.col("max_loan_amount") > 0, "Loan-Based Primary")
            .otherwise("No Primary Aid Type")
            .alias("primary_aid_type"),
        )
