"""Marts tier, part 6: the academic early-warning system — the most
flag-dense model (11 warning flags, W3 lag-over-aggregate, P5
post-aggregation filter, ordered string_agg of struggling courses)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.agg import string_agg_ordered
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts_ews(reg: ModelRegistry) -> None:
    @reg.model(
        "academic_early_warning_system",
        deps=["stg_students", "stg_departments", "stg_enrollments", "stg_courses",
              "stg_semesters", "stg_assignments", "stg_assignment_submissions",
              "student_financial_profile"],
        materialized="table",
    )
    def academic_early_warning_system(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/academic_early_warning_system.sql:1-223 —
        # is_current filters (:25,64), A10 ordered string_agg (:19, ordered
        # by grade_points with course_code tiebreaker added; Spark sorts
        # null keys first vs PG last — "In Progress" courses lead the list,
        # documented deviation), W3 lag over grouped output (:42), 11-flag
        # risk scoring, P5 final filter (:223), frozen alert timestamp.
        s = ctx.ref("stg_students").filter(F.col("student_status") == "active")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        e = ctx.ref("stg_enrollments")
        c = ctx.ref("stg_courses").select("course_id", "course_code")
        sem_all = ctx.ref("stg_semesters").select("semester_id", "is_current")
        gp, att = F.col("grade_points"), F.col("attendance_percentage")
        csp = (
            s.join(F.broadcast(d), s.major_id == d.department_id)
            .join(
                e.filter(
                    F.col("enrollment_status").isin("In Progress", "Completed")
                ).select("student_id", "enrollment_id", "course_id",
                         "semester_id", "grade_points", "attendance_percentage"),
                "student_id",
                "left",
            )
            .join(F.broadcast(c), "course_id", "left")
            .join(F.broadcast(sem_all), "semester_id", "left")
            .filter(F.col("is_current") == True)  # noqa: E712
            .groupBy(
                "student_id", "full_name", "email",
                F.col("gpa").alias("cumulative_gpa"), "academic_standing",
                "years_enrolled", "department_name",
            )
            .agg(
                F.countDistinct("enrollment_id").alias("current_enrollments"),
                F.avg(gp).alias("current_semester_gpa"),
                F.avg(att).alias("current_attendance"),
                F.count(F.when(gp < 2.0, 1)).alias("failing_courses"),
                F.count(F.when(att < 70, 1)).alias("low_attendance_courses"),
                F.min(gp).alias("lowest_current_grade"),
                F.min(att).alias("lowest_attendance"),
                string_agg_ordered(
                    "course_code", ", ",
                    order_by=F.struct(gp.alias("g"), F.col("course_code").alias("c")),
                ).alias("struggling_courses"),
            )
        )
        hp_grouped = (
            e.join(F.broadcast(sem_all), "semester_id")
            .filter(F.col("is_current") == False)  # noqa: E712
            .groupBy("student_id", "semester_id")
            .agg(
                F.countDistinct("semester_id").alias("total_semesters"),
                F.avg(gp).alias("historical_avg_gpa"),
                F.count(F.when(gp < 2.0, 1)).alias("total_failed_courses"),
                F.count(F.when(F.col("enrollment_status") == "Withdrawn", 1)).alias(
                    "total_withdrawals"
                ),
                F.min(gp).alias("worst_historical_grade"),
                F.stddev(gp).alias("grade_consistency"),
            )
            .withColumn(
                "previous_semester_gpa",
                F.lag("historical_avg_gpa").over(
                    Window.partitionBy("student_id").orderBy(
                        F.desc("semester_id")
                    )
                ),
            )
        )
        hp = hp_grouped.groupBy(F.col("student_id").alias("hp_student")).agg(
            F.avg("historical_avg_gpa").alias("historical_avg_gpa"),
            F.sum("total_failed_courses").alias("total_failed_courses"),
            F.sum("total_withdrawals").alias("total_withdrawals"),
            F.avg("grade_consistency").alias("grade_consistency"),
            F.max("previous_semester_gpa").alias("previous_semester_gpa"),
        )
        a = ctx.ref("stg_assignments").select(
            F.col("assignment_id").alias("a_id"),
            F.col("course_id").alias("a_course"),
            F.col("semester_id").alias("a_sem"), "max_points",
        )
        asub = ctx.ref("stg_assignment_submissions").select(
            F.col("assignment_id").alias("sub_a"),
            F.col("student_id").alias("sub_student"), "score", "late_submission",
        )
        mp = F.when(F.col("max_points") != 0, F.col("max_points"))
        api = (
            e.select("student_id", "course_id", "semester_id")
            .join(
                a,
                (F.col("course_id") == F.col("a_course"))
                & (F.col("semester_id") == F.col("a_sem")),
            )
            .join(
                asub,
                (F.col("a_id") == F.col("sub_a"))
                & (F.col("student_id") == F.col("sub_student")),
            )
            .join(F.broadcast(sem_all), "semester_id")
            .filter(F.col("is_current") == True)  # noqa: E712
            .groupBy(F.col("student_id").alias("api_student"))
            .agg(
                F.countDistinct("a_id").alias("assignments_completed"),
                F.avg(F.col("score") / mp * 100).alias(
                    "avg_assignment_percentage"
                ),
                F.count(F.when(F.col("late_submission"), 1)).alias(
                    "late_submissions"
                ),
                F.count(F.when(F.col("score") / mp < 0.6, 1)).alias(
                    "poor_assignment_scores"
                ),
                F.round(
                    F.count(F.when(F.col("late_submission"), 1)) * 100.0
                    / F.when(F.countDistinct("a_id") != 0,
                             F.countDistinct("a_id")),
                    2,
                ).alias("late_submission_rate"),
            )
        )
        fsi = ctx.ref("student_financial_profile").groupBy(
            F.col("student_id").alias("fsi_student")
        ).agg(
            F.max(
                F.when(F.col("late_payment_rate") > 25, 1).otherwise(0)
            ).alias("has_payment_issues"),
            F.max(
                F.when(F.col("total_aid_received") == 0, 1).otherwise(0)
            ).alias("no_financial_aid"),
            F.max(
                F.when(
                    F.col("payment_reliability") == "Poor Payment History", 1
                ).otherwise(0)
            ).alias("poor_payment_history"),
        )
        flag = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
        ewi = (
            csp.join(hp, csp.student_id == F.col("hp_student"), "left")
            .drop("hp_student")
            .join(api, csp.student_id == F.col("api_student"), "left")
            .drop("api_student")
            .join(fsi, csp.student_id == F.col("fsi_student"), "left")
            .drop("fsi_student")
            .select(
                "student_id", "full_name", "email", "department_name",
                "cumulative_gpa", "current_semester_gpa", "current_attendance",
                "failing_courses", "low_attendance_courses", "struggling_courses",
                "historical_avg_gpa", "total_failed_courses", "total_withdrawals",
                "grade_consistency", "previous_semester_gpa",
                "avg_assignment_percentage", "late_submission_rate",
                "poor_assignment_scores", "has_payment_issues",
                "no_financial_aid", "poor_payment_history",
                flag(F.col("current_semester_gpa") < 2.0).alias(
                    "academic_failure_flag"
                ),
                flag(F.col("current_attendance") < 75).alias(
                    "attendance_warning_flag"
                ),
                flag(F.col("failing_courses") >= 2).alias(
                    "multiple_failures_flag"
                ),
                flag(
                    F.col("current_semester_gpa")
                    < F.col("cumulative_gpa") - 0.5
                ).alias("declining_performance_flag"),
                flag(F.col("late_submission_rate") > 30).alias(
                    "assignment_issues_flag"
                ),
                flag(F.col("low_attendance_courses") >= 3).alias(
                    "disengagement_flag"
                ),
                flag(F.col("avg_assignment_percentage") < 65).alias(
                    "poor_assignment_flag"
                ),
                flag(F.col("grade_consistency") > 1.5).alias(
                    "inconsistent_performance_flag"
                ),
                flag(F.col("has_payment_issues") == 1).alias(
                    "financial_stress_flag"
                ),
                flag(F.col("total_failed_courses") >= 3).alias(
                    "chronic_failure_flag"
                ),
                flag(F.col("total_withdrawals") >= 2).alias(
                    "withdrawal_pattern_flag"
                ),
            )
        )
        total = (
            F.col("academic_failure_flag") + F.col("attendance_warning_flag")
            + F.col("multiple_failures_flag")
            + F.col("declining_performance_flag")
            + F.col("assignment_issues_flag") + F.col("disengagement_flag")
            + F.col("poor_assignment_flag")
            + F.col("inconsistent_performance_flag")
            + F.col("financial_stress_flag") + F.col("chronic_failure_flag")
            + F.col("withdrawal_pattern_flag")
        )
        rs = ewi.select(
            "*",
            total.alias("total_warning_flags"),
            F.when(total >= 7, "Critical Risk")
            .when(total >= 5, "High Risk")
            .when(total >= 3, "Moderate Risk")
            .when(total >= 1, "Low Risk")
            .otherwise("No Risk")
            .alias("risk_level"),
            F.when(
                (F.col("academic_failure_flag") == 1)
                | (F.col("multiple_failures_flag") == 1),
                "Academic Crisis",
            )
            .when(
                (F.col("attendance_warning_flag") == 1)
                | (F.col("disengagement_flag") == 1),
                "Engagement Issues",
            )
            .when(F.col("financial_stress_flag") == 1, "Financial Difficulties")
            .when(
                (F.col("declining_performance_flag") == 1)
                | (F.col("inconsistent_performance_flag") == 1),
                "Performance Decline",
            )
            .when(
                (F.col("chronic_failure_flag") == 1)
                | (F.col("withdrawal_pattern_flag") == 1),
                "Chronic Issues",
            )
            .otherwise("General Risk")
            .alias("primary_risk_category"),
        )
        rl, prc = F.col("risk_level"), F.col("primary_risk_category")
        return (
            rs.select(
                "*",
                F.when(
                    rl == "Critical Risk",
                    "URGENT: Schedule immediate meeting with academic advisor, "
                    "dean, and counselor",
                )
                .when(
                    (rl == "High Risk") & (prc == "Academic Crisis"),
                    "Schedule tutoring, reduce course load, academic probation "
                    "review",
                )
                .when(
                    (rl == "High Risk") & (prc == "Engagement Issues"),
                    "Mandatory attendance tracking, peer mentorship program",
                )
                .when(
                    (rl == "High Risk") & (prc == "Financial Difficulties"),
                    "Financial aid counseling, emergency assistance application",
                )
                .when(rl == "Moderate Risk",
                      "Proactive check-in with advisor, study skills workshop")
                .when(rl == "Low Risk", "Monitor progress, optional support "
                      "services")
                .otherwise("Standard academic support")
                .alias("recommended_immediate_intervention"),
                F.when(rl == "Critical Risk",
                       "Daily check-ins for 2 weeks, then weekly")
                .when(rl == "High Risk", "Weekly check-ins for 1 month")
                .when(rl == "Moderate Risk", "Bi-weekly check-ins")
                .when(rl == "Low Risk", "Monthly check-ins")
                .otherwise("Semester check-ins")
                .alias("follow_up_schedule"),
                F.when(rl == "Critical Risk",
                       "Low - Requires intensive intervention")
                .when(
                    (rl == "High Risk") & (F.col("chronic_failure_flag") == 0),
                    "Moderate - Good chance with proper support",
                )
                .when(rl == "High Risk", "Low-Moderate - Pattern of difficulties")
                .when(rl == "Moderate Risk", "Good - Early intervention effective")
                .otherwise("Excellent - Minor adjustments needed")
                .alias("success_probability_with_intervention"),
                F.when(rl == "Critical Risk", 1)
                .when(rl == "High Risk", 2)
                .when(rl == "Moderate Risk", 3)
                .otherwise(4)
                .alias("alert_priority"),
                F.lit(ctx.run_date).cast("timestamp").alias(
                    "alert_generated_timestamp"
                ),
            )
            .filter(rl != "No Risk")
            .orderBy(
                F.asc("alert_priority"), F.desc("total_warning_flags"),
                F.asc("current_semester_gpa"), "student_id",
            )
        )
