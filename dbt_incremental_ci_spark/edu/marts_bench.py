"""Marts tier, part 8: competitive program benchmarking (W7 `over ()`
grand totals, W1 rankings, W5 percentiles on a department-sized frame)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts_bench(reg: ModelRegistry) -> None:
    @reg.model(
        "competitive_program_benchmarking",
        deps=["stg_departments", "stg_students", "stg_faculty", "stg_courses",
              "stg_enrollments", "stg_tuition_payments", "stg_financial_aid",
              "int_course_performance_metrics"],
        materialized="table",
    )
    def competitive_program_benchmarking(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/
        #   competitive_program_benchmarking.sql:1-247 — W1 rankings
        # (:177-180, faculty tiebreaker program_name added), W5 percentiles
        # (:183-186), W7 `over ()` institutional averages (:189-192) — kept
        # as empty-partition windows: the frame is department-cardinality
        # (tiny at any data scale), so the single-partition window is safe
        # here, unlike row-level W7 uses (SURVEY §4).
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code", "budget",
                                              "department_size")
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"), F.col("major_id"),
            F.col("gpa").alias("s_gpa"), "student_status", "academic_standing",
        )
        f = ctx.ref("stg_faculty").select(
            F.col("faculty_id").alias("f_id"),
            F.col("department_id").alias("f_dep"), "position",
            F.col("salary").alias("f_salary"), "years_of_service",
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"),
            F.col("department_id").alias("c_dep"), "difficulty_level",
        )
        e = ctx.ref("stg_enrollments").select(
            F.col("student_id").alias("e_student"),
            F.col("course_id").alias("e_course"), "attendance_percentage",
        )
        ss = F.col("student_status")
        n_students = F.countDistinct("s_id")
        ppm = (
            d.join(s, d.department_id == s.major_id, "left")
            .join(f, d.department_id == F.col("f_dep"), "left")
            .join(c, d.department_id == F.col("c_dep"), "left")
            .join(
                e,
                (F.col("s_id") == F.col("e_student"))
                & (F.col("c_id") == F.col("e_course")),
                "left",
            )
            .groupBy(
                F.col("department_name").alias("program_name"),
                "department_code", "budget", "department_size",
            )
            .agg(
                n_students.alias("total_students"),
                F.countDistinct("f_id").alias("faculty_count"),
                F.countDistinct("c_id").alias("course_offerings"),
                F.avg("s_gpa").alias("program_avg_gpa"),
                F.count(F.when(ss == "graduated", 1)).alias("graduates"),
                F.count(
                    F.when(F.col("academic_standing") == "Deans List", 1)
                ).alias("honors_students"),
                F.avg("attendance_percentage").alias("avg_student_engagement"),
                F.round(
                    F.count(F.when(ss == "graduated", 1)) * 100.0
                    / F.when(n_students != 0, n_students),
                    2,
                ).alias("graduation_rate"),
                F.round(
                    F.count(
                        F.when(F.col("academic_standing") == "Deans List", 1)
                    ) * 100.0 / F.when(n_students != 0, n_students),
                    2,
                ).alias("honors_percentage"),
                F.round(
                    F.count(F.when(ss == "dropped", 1)) * 100.0
                    / F.when(n_students != 0, n_students),
                    2,
                ).alias("dropout_rate"),
            )
        )
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("student_id").alias("tp_student"),
            F.col("amount").alias("tp_amount"),
        )
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"),
            F.col("amount").alias("fa_amount"),
        )
        fpm = (
            d.join(s, d.department_id == s.major_id, "left")
            .join(tp, F.col("s_id") == F.col("tp_student"), "left")
            .join(fa, F.col("s_id") == F.col("fa_student"), "left")
            .join(f, d.department_id == F.col("f_dep"), "left")
            .groupBy("department_name", "budget")
            .agg(
                F.sum("tp_amount").alias("total_revenue"),
                F.sum("fa_amount").alias("aid_disbursed"),
                F.sum("f_salary").alias("faculty_costs"),
                F.round(
                    F.sum("tp_amount") / F.when(n_students != 0, n_students), 2
                ).alias("revenue_per_student"),
                F.round(
                    F.first("budget") / F.when(n_students != 0, n_students), 2
                ).alias("cost_per_student"),
                F.round(
                    F.sum("tp_amount")
                    / F.when(F.first("budget") != 0, F.first("budget")),
                    2,
                ).alias("revenue_efficiency_ratio"),
                F.round(
                    F.sum("f_salary")
                    / F.when(F.first("budget") != 0, F.first("budget")) * 100,
                    2,
                ).alias("faculty_cost_ratio"),
            )
            .drop("budget")
        )
        n_fac = F.countDistinct("f_id")
        fqm = (
            d.join(f, d.department_id == F.col("f_dep"), "left")
            .join(s, d.department_id == s.major_id, "left")
            .groupBy("department_name")
            .agg(
                F.avg("years_of_service").alias("avg_faculty_experience"),
                F.count(F.when(F.col("position") == "Professor", 1)).alias(
                    "senior_faculty_count"
                ),
                F.round(
                    F.count(F.when(F.col("position") == "Professor", 1)) * 100.0
                    / F.when(n_fac != 0, n_fac),
                    2,
                ).alias("senior_faculty_percentage"),
                F.avg("f_salary").alias("avg_faculty_compensation"),
                # PG integer division of counts (reference :66) — truncating
                F.round(
                    (n_students.cast("double") / F.when(n_fac != 0, n_fac))
                    .cast("long").cast("double"),
                    2,
                ).alias("student_faculty_ratio"),
            )
        )
        cpm = ctx.ref("int_course_performance_metrics").select(
            F.col("course_id").alias("cpm_id"), "pass_rate", "avg_grade_points"
        )
        cqm = (
            d.join(c, d.department_id == F.col("c_dep"), "left")
            .join(cpm, F.col("c_id") == F.col("cpm_id"), "left")
            .groupBy("department_name")
            .agg(
                F.avg("difficulty_level").alias("avg_course_rigor"),
                F.count(F.when(F.col("difficulty_level") >= 4, 1)).alias(
                    "advanced_courses"
                ),
                F.round(
                    F.count(F.when(F.col("difficulty_level") >= 4, 1)) * 100.0
                    / F.when(F.countDistinct("c_id") != 0,
                             F.countDistinct("c_id")),
                    2,
                ).alias("advanced_course_percentage"),
                F.avg("pass_rate").alias("avg_course_success_rate"),
                F.avg("avg_grade_points").alias("avg_course_gpa"),
            )
        )
        gr, hp_, pag = (F.col("graduation_rate"), F.col("honors_percentage"),
                        F.col("program_avg_gpa"))
        dr = F.col("dropout_rate")
        rer, cps_, fcr = (F.col("revenue_efficiency_ratio"),
                          F.col("cost_per_student"), F.col("faculty_cost_ratio"))
        sfp_, afe = (F.col("senior_faculty_percentage"),
                     F.col("avg_faculty_experience"))
        sfr, acp = F.col("student_faculty_ratio"), F.col("advanced_course_percentage")
        ca = (
            ppm.join(F.broadcast(fpm),
                     ppm.program_name == fpm.department_name, "left")
            .drop("department_name")
            .join(F.broadcast(fqm),
                  ppm.program_name == fqm.department_name, "left")
            .drop("department_name")
            .join(F.broadcast(cqm),
                  ppm.program_name == cqm.department_name, "left")
            .drop("department_name")
            .select(
                "program_name", "department_code", "total_students",
                "faculty_count", "course_offerings", "program_avg_gpa",
                "graduation_rate", "honors_percentage", "dropout_rate",
                "revenue_per_student", "cost_per_student",
                "revenue_efficiency_ratio", "faculty_cost_ratio",
                "avg_faculty_experience", "senior_faculty_percentage",
                "avg_faculty_compensation", "student_faculty_ratio",
                "avg_course_rigor", "advanced_course_percentage",
                "avg_course_success_rate", "avg_course_gpa",
                F.round(
                    F.when(gr >= 90, 25).when(gr >= 80, 20).when(gr >= 70, 15)
                    .otherwise(10)
                    + F.when(hp_ >= 15, 25).when(hp_ >= 10, 20).when(hp_ >= 5, 15)
                    .otherwise(10)
                    + F.when(pag >= 3.5, 25).when(pag >= 3.0, 20)
                    .when(pag >= 2.5, 15).otherwise(10)
                    + F.when(dr <= 5, 25).when(dr <= 10, 20).when(dr <= 15, 15)
                    .otherwise(10),
                    0,
                ).alias("academic_excellence_score"),
                F.round(
                    F.when(rer >= 1.5, 30).when(rer >= 1.2, 25)
                    .when(rer >= 1.0, 20).otherwise(10)
                    + F.when(cps_ <= 5000, 35).when(cps_ <= 8000, 25)
                    .when(cps_ <= 12000, 15).otherwise(5)
                    + F.when(fcr <= 60, 35).when(fcr <= 75, 25)
                    .when(fcr <= 85, 15).otherwise(5),
                    0,
                ).alias("financial_efficiency_score"),
                F.round(
                    F.when(sfp_ >= 40, 30).when(sfp_ >= 30, 25)
                    .when(sfp_ >= 20, 20).otherwise(15)
                    + F.when(afe >= 15, 25).when(afe >= 10, 20)
                    .when(afe >= 7, 15).otherwise(10)
                    + F.when(sfr.between(15, 25), 25)
                    .when(sfr.between(10, 30), 20)
                    .when(sfr.between(8, 35), 15).otherwise(10)
                    + F.when(acp >= 30, 20).when(acp >= 20, 15)
                    .when(acp >= 10, 10).otherwise(5),
                    0,
                ).alias("program_quality_score"),
            )
        )
        aes, fes, pqs = (F.col("academic_excellence_score"),
                         F.col("financial_efficiency_score"),
                         F.col("program_quality_score"))
        total = aes + fes + pqs
        w_all = Window.partitionBy()
        ba = ca.select(
            "*",
            (total / 3).alias("overall_competitiveness_score"),
            F.row_number().over(
                Window.orderBy(F.desc("academic_excellence_score"),
                               "program_name")
            ).alias("academic_excellence_rank"),
            F.row_number().over(
                Window.orderBy(F.desc("financial_efficiency_score"),
                               "program_name")
            ).alias("financial_efficiency_rank"),
            F.row_number().over(
                Window.orderBy(F.desc("program_quality_score"), "program_name")
            ).alias("program_quality_rank"),
            F.row_number().over(
                Window.orderBy(F.desc(total), "program_name")
            ).alias("overall_competitiveness_rank"),
            # PG ASC NULLS LAST parity (SURVEY §7.3)
            F.percent_rank().over(Window.orderBy(gr.asc_nulls_last())).alias(
                "graduation_rate_percentile"
            ),
            F.percent_rank().over(Window.orderBy(rer.asc_nulls_last())).alias(
                "revenue_efficiency_percentile"
            ),
            F.percent_rank().over(Window.orderBy(pag.asc_nulls_last())).alias(
                "gpa_percentile"
            ),
            F.percent_rank().over(Window.orderBy(sfp_.asc_nulls_last())).alias(
                "faculty_quality_percentile"
            ),
            F.avg(gr).over(w_all).alias("institutional_avg_graduation_rate"),
            F.avg(pag).over(w_all).alias("institutional_avg_gpa"),
            F.avg(rer).over(w_all).alias("institutional_avg_revenue_efficiency"),
            F.avg(sfp_).over(w_all).alias("institutional_avg_senior_faculty"),
            F.count(F.lit(1)).over(w_all).alias("__n_programs"),
        )
        ocs = F.col("overall_competitiveness_score")
        sp = ba.select(
            "*",
            F.when(ocs >= 80, "Market Leader")
            .when(ocs >= 65, "Strong Competitor")
            .when(ocs >= 50, "Average Performer")
            .when(ocs >= 35, "Below Average")
            .otherwise("Needs Significant Improvement")
            .alias("competitive_position"),
            F.when((aes > pqs) & (aes > fes), "Academic Excellence Focus")
            .when(fes > pqs, "Cost Leadership Focus")
            .when(pqs > fes, "Quality Differentiation Focus")
            .otherwise("Balanced Approach")
            .alias("strategic_strength"),
            F.when(aes < 40, "Improve academic outcomes and retention")
            .when(fes < 40, "Optimize costs and improve revenue generation")
            .when(pqs < 40, "Enhance faculty quality and curriculum rigor")
            .when(
                F.col("overall_competitiveness_rank")
                > F.col("__n_programs") * 0.75,
                "Focus on core competency development",
            )
            .otherwise("Maintain competitive advantage and explore growth")
            .alias("strategic_recommendation"),
            F.when(
                (gr > F.col("institutional_avg_graduation_rate") * 1.2)
                & (pag > F.col("institutional_avg_gpa") * 1.1),
                "Flagship Program",
            )
            .when(
                rer > F.col("institutional_avg_revenue_efficiency") * 1.3,
                "High Value Program",
            )
            .when(
                sfp_ > F.col("institutional_avg_senior_faculty") * 1.5,
                "Premium Quality Program",
            )
            .when(
                gr < F.col("institutional_avg_graduation_rate") * 0.8,
                "At-Risk Program",
            )
            .otherwise("Standard Program")
            .alias("program_classification"),
        ).drop("__n_programs")
        cp, pc_ = F.col("competitive_position"), F.col("program_classification")
        return sp.select(
            "*",
            F.when(
                (cp == "Market Leader") & (pc_ == "Flagship Program"),
                "High Growth Investment",
            )
            .when(
                (cp == "Strong Competitor") & (fes >= 70),
                "Expansion Investment",
            )
            .when(
                cp.isin("Average Performer", "Below Average")
                & (pc_ != "At-Risk Program"),
                "Improvement Investment",
            )
            .when(
                (cp == "Needs Significant Improvement")
                | (pc_ == "At-Risk Program"),
                "Restructuring Required",
            )
            .otherwise("Maintenance Investment")
            .alias("investment_priority"),
        )
