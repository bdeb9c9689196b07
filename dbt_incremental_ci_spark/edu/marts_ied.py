"""Marts tier, part 7: institutional effectiveness dashboard (W5
percent_rank suite, W2 lag trends, weighted composite scoring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts_ied(reg: ModelRegistry) -> None:
    @reg.model(
        "institutional_effectiveness_dashboard",
        deps=["stg_semesters", "stg_enrollments", "stg_courses", "stg_students",
              "stg_class_sessions", "stg_faculty", "stg_tuition_payments",
              "stg_financial_aid"],
        materialized="table",
    )
    def institutional_effectiveness_dashboard(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/
        #   institutional_effectiveness_dashboard.sql:1-217 — per-semester
        # fan-out aggregation, W2 lag trends (:54-63), W5 percent_rank
        # rankings (:66-69), weighted composite scores.
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year", "semester_type")
        e = ctx.ref("stg_enrollments").select(
            "semester_id", "student_id", "enrollment_id", "course_id",
            "grade_points", "attendance_percentage", "grade_category",
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"), "department_id"
        )
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"), "academic_standing",
            "student_status",
        )
        cs = ctx.ref("stg_class_sessions").select(
            F.col("course_id").alias("cs_course"),
            F.col("semester_id").alias("cs_sem"), "faculty_id",
        )
        f = ctx.ref("stg_faculty").select(
            F.col("faculty_id").alias("f_id"), "salary"
        )
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("student_id").alias("tp_student"),
            F.col("semester_id").alias("tp_sem"),
            F.col("amount").alias("tp_amount"),
        )
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"),
            F.col("amount").alias("fa_amount"),
        )
        gc = F.col("grade_category")
        n_graded = F.count(F.when(gc != "Unknown", 1))
        im = (
            sem.join(e, "semester_id", "left")
            .join(F.broadcast(c), e.course_id == F.col("c_id"), "left")
            .join(s, e.student_id == F.col("s_id"), "left")
            .join(
                F.broadcast(cs),
                (F.col("c_id") == F.col("cs_course"))
                & (F.col("semester_id") == F.col("cs_sem")),
                "left",
            )
            .join(F.broadcast(f), F.col("faculty_id") == F.col("f_id"), "left")
            .join(
                tp,
                (F.col("s_id") == F.col("tp_student"))
                & (F.col("semester_id") == F.col("tp_sem")),
                "left",
            )
            .join(fa, F.col("s_id") == F.col("fa_student"), "left")
            .groupBy("semester_id", "semester_name", "academic_year",
                     "semester_type")
            .agg(
                F.countDistinct("student_id").alias("unique_students_enrolled"),
                F.countDistinct("enrollment_id").alias(
                    "total_course_enrollments"
                ),
                F.countDistinct("course_id").alias("unique_courses_offered"),
                F.countDistinct("department_id").alias("departments_active"),
                F.countDistinct("faculty_id").alias("faculty_teaching"),
                F.avg("grade_points").alias("institutional_avg_gpa"),
                F.avg("attendance_percentage").alias(
                    "institutional_avg_attendance"
                ),
                F.count(F.when(gc == "Excellent", 1)).alias("excellent_grades"),
                F.count(
                    F.when(gc.isin("Excellent", "Good", "Satisfactory"), 1)
                ).alias("passing_grades"),
                F.round(
                    F.count(
                        F.when(gc.isin("Excellent", "Good", "Satisfactory"), 1)
                    ) * 100.0 / F.when(n_graded != 0, n_graded),
                    2,
                ).alias("institutional_pass_rate"),
                F.count(
                    F.when(F.col("academic_standing") == "Deans List", 1)
                ).alias("deans_list_students"),
                F.count(
                    F.when(F.col("academic_standing") == "Academic Probation", 1)
                ).alias("students_on_probation"),
                F.count(F.when(F.col("student_status") == "graduated", 1)).alias(
                    "graduates_this_period"
                ),
                F.sum("tp_amount").alias("total_tuition_revenue"),
                F.sum("fa_amount").alias("total_financial_aid_disbursed"),
                F.sum("salary").alias("total_faculty_compensation"),
                F.round(
                    F.countDistinct("enrollment_id").cast("decimal(18,2)")
                    / F.when(F.countDistinct("faculty_id") != 0,
                             F.countDistinct("faculty_id")),
                    2,
                ).alias("enrollments_per_faculty"),
                F.round(
                    F.countDistinct("student_id").cast("decimal(18,2)")
                    / F.when(F.countDistinct("faculty_id") != 0,
                             F.countDistinct("faculty_id")),
                    2,
                ).alias("students_per_faculty"),
                F.round(
                    F.sum("tp_amount")
                    / F.when(F.countDistinct("student_id") != 0,
                             F.countDistinct("student_id")),
                    2,
                ).alias("revenue_per_student"),
            )
        )
        w = Window.orderBy("semester_id")
        iag = F.col("institutional_avg_gpa")
        ipr = F.col("institutional_pass_rate")
        use = F.col("unique_students_enrolled")
        ttr = F.col("total_tuition_revenue")
        pt = im.select(
            "*",
            F.lag(iag).over(w).alias("prev_semester_gpa"),
            F.lag(ipr).over(w).alias("prev_semester_pass_rate"),
            F.lag(use).over(w).alias("prev_semester_enrollment"),
            F.lag(ttr).over(w).alias("prev_semester_revenue"),
            (iag - F.lag(iag).over(w)).alias("gpa_trend"),
            (ipr - F.lag(ipr).over(w)).alias("pass_rate_trend"),
            (use - F.lag(use).over(w)).alias("enrollment_trend"),
            (ttr - F.lag(ttr).over(w)).alias("revenue_trend"),
            # PG orders ASC NULLS LAST; Spark defaults to NULLS FIRST —
            # future semesters with no enrollments have null metrics, so
            # the null placement shifts every percentile (SURVEY §7.3)
            F.percent_rank().over(Window.orderBy(iag.asc_nulls_last())).alias(
                "gpa_percentile"
            ),
            F.percent_rank().over(Window.orderBy(ipr.asc_nulls_last())).alias(
                "pass_rate_percentile"
            ),
            F.percent_rank().over(Window.orderBy(use.asc_nulls_last())).alias(
                "enrollment_percentile"
            ),
            F.percent_rank().over(
                Window.orderBy(F.col("revenue_per_student").asc_nulls_last())
            ).alias("revenue_efficiency_percentile"),
        )
        iaa = F.col("institutional_avg_attendance")
        dls_ratio = F.col("deans_list_students").cast("decimal(18,4)") / F.when(
            use != 0, use
        )
        prob_ratio = F.col("students_on_probation").cast("decimal(18,4)") / F.when(
            use != 0, use
        )
        spf = F.col("students_per_faculty")
        rps = F.col("revenue_per_student")
        tfa = F.col("total_financial_aid_disbursed")
        tfc = F.col("total_faculty_compensation")
        aid_share_total = tfa / F.when((ttr + tfa) != 0, ttr + tfa)
        aid_share_rev = tfa / F.when(ttr != 0, ttr)
        rt = F.col("revenue_trend")
        es = pt.select(
            "*",
            F.round(
                F.when(iag >= 3.0, 25).when(iag >= 2.5, 20).when(iag >= 2.0, 15)
                .otherwise(10)
                + F.when(ipr >= 85, 25).when(ipr >= 75, 20).when(ipr >= 65, 15)
                .otherwise(10)
                + F.when(iaa >= 90, 25).when(iaa >= 80, 20).when(iaa >= 70, 15)
                .otherwise(10)
                + F.when(dls_ratio >= 0.15, 25).when(dls_ratio >= 0.10, 20)
                .when(dls_ratio >= 0.05, 15).otherwise(10),
                0,
            ).alias("academic_effectiveness_score"),
            F.round(
                F.when(spf.between(15, 25), 30).when(spf.between(10, 30), 25)
                .when(spf.between(8, 35), 20).otherwise(15)
                + F.when(rps >= 8000, 25).when(rps >= 6000, 20)
                .when(rps >= 4000, 15).otherwise(10)
                + F.when(aid_share_total <= 0.3, 25)
                .when(aid_share_total <= 0.4, 20)
                .when(aid_share_total <= 0.5, 15).otherwise(10)
                + F.when(prob_ratio <= 0.05, 20).when(prob_ratio <= 0.10, 15)
                .when(prob_ratio <= 0.15, 10).otherwise(5),
                0,
            ).alias("operational_efficiency_score"),
            F.round(
                F.when(ttr > tfc * 1.5, 40).when(ttr > tfc * 1.2, 30)
                .when(ttr > tfc, 20).otherwise(10)
                + F.when(rt > 0, 30).when(rt == 0, 20).otherwise(10)
                + F.when(aid_share_rev <= 0.4, 30).when(aid_share_rev <= 0.6, 20)
                .otherwise(10),
                0,
            ).alias("financial_health_score"),
        )
        aes = F.col("academic_effectiveness_score")
        oes = F.col("operational_efficiency_score")
        fhs = F.col("financial_health_score")
        gt, et = F.col("gpa_trend"), F.col("enrollment_trend")
        ca = es.select(
            "*",
            F.round(aes * 0.4 + oes * 0.3 + fhs * 0.3, 1).alias(
                "overall_effectiveness_score"
            ),
            F.when(gt > 0.1, "Improving Academic Performance")
            .when(gt < -0.1, "Declining Academic Performance")
            .otherwise("Stable Academic Performance")
            .alias("academic_trend_category"),
            F.when(et > 50, "Growing Enrollment")
            .when(et < -50, "Declining Enrollment")
            .otherwise("Stable Enrollment")
            .alias("enrollment_trend_category"),
            F.when(rt > 10_000, "Growing Revenue")
            .when(rt < -10_000, "Declining Revenue")
            .otherwise("Stable Revenue")
            .alias("financial_trend_category"),
            F.when(aes >= 80, "High Academic Performance")
            .when(aes >= 65, "Good Academic Performance")
            .when(aes >= 50, "Fair Academic Performance")
            .otherwise("Poor Academic Performance")
            .alias("academic_performance_category"),
            F.when(oes >= 80, "Highly Efficient")
            .when(oes >= 65, "Efficient")
            .when(oes >= 50, "Moderately Efficient")
            .otherwise("Inefficient")
            .alias("operational_efficiency_category"),
            F.when(fhs >= 80, "Excellent Financial Health")
            .when(fhs >= 65, "Good Financial Health")
            .when(fhs >= 50, "Fair Financial Health")
            .otherwise("Poor Financial Health")
            .alias("financial_health_category"),
        )
        oas = F.col("overall_effectiveness_score")
        return ca.select(
            "*",
            F.when(oas >= 80,
                   "Maintain excellence and consider expansion opportunities")
            .when(aes < 50, "Focus on academic support and faculty development")
            .when(oes < 50,
                  "Review operational processes and resource allocation")
            .when(fhs < 50,
                  "Address financial sustainability and revenue diversification")
            .when(F.col("enrollment_trend_category") == "Declining Enrollment",
                  "Implement enrollment growth strategies")
            .otherwise("Continue current strategies with minor improvements")
            .alias("primary_strategic_recommendation"),
            F.when(
                (F.col("academic_trend_category")
                 == "Declining Academic Performance")
                & (F.col("operational_efficiency_category") == "Inefficient"),
                "High Priority Action Required",
            )
            .when(
                (F.col("financial_health_category") == "Poor Financial Health")
                & (F.col("enrollment_trend_category") == "Declining Enrollment"),
                "Critical Intervention Needed",
            )
            .when(oas < 60, "Moderate Intervention Required")
            .otherwise("Standard Monitoring")
            .alias("intervention_priority"),
            F.when(
                (ipr >= 80) & spf.between(15, 25) & (rps >= 6000),
                "All KPIs Met",
            )
            .when(
                (ipr < 70) | (spf > 30) | (rps < 4000),
                "Critical KPIs Not Met",
            )
            .otherwise("Some KPIs Need Attention")
            .alias("kpi_status"),
        )
