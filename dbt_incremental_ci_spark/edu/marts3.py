"""Marts tier, part 3: core dashboards built over the intermediates."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts3(reg: ModelRegistry) -> None:
    @reg.model(
        "faculty_performance_dashboard",
        deps=["int_faculty_teaching_load", "int_department_analytics"],
        materialized="table",
    )
    def faculty_performance_dashboard(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/faculty_performance_dashboard.sql:1-52
        f = ctx.ref("int_faculty_teaching_load")
        da = ctx.ref("int_department_analytics").select(
            F.col("department_id").alias("da_dep"),
            F.col("avg_faculty_salary").alias("dept_avg_salary"),
            F.col("student_faculty_ratio").alias("dept_student_faculty_ratio"),
        )
        tst = F.col("total_students_taught")
        aca = F.col("avg_class_attendance")
        yos = F.col("years_of_service")
        return (
            f.join(F.broadcast(da), f.department_id == F.col("da_dep"), "left")
            .drop("da_dep")
            .select(
                "faculty_id", "faculty_name", "position", "salary",
                "years_of_service", "salary_band", "department_name",
                "department_code", "unique_courses_taught", "semesters_active",
                "total_class_sessions", "total_students_taught",
                "avg_class_attendance", "total_credit_hours_taught",
                "avg_course_difficulty", "teaching_load_category",
                "credit_hour_load_category", "salary_per_course",
                "salary_per_credit_hour", "morning_sessions",
                "afternoon_sessions", "evening_sessions", "dept_avg_salary",
                "dept_student_faculty_ratio",
                F.round(
                    F.col("salary")
                    / F.when(F.col("dept_avg_salary") != 0,
                             F.col("dept_avg_salary")) * 100,
                    2,
                ).alias("salary_vs_dept_avg_percent"),
                F.when(tst >= 200, "High Impact Teacher")
                .when(tst >= 100, "Moderate Impact Teacher")
                .when(tst >= 50, "Standard Impact Teacher")
                .otherwise("Limited Impact Teacher")
                .alias("teaching_impact_category"),
                F.when(aca >= 95, "Excellent Student Engagement")
                .when(aca >= 85, "Good Student Engagement")
                .when(aca >= 75, "Fair Student Engagement")
                .otherwise("Poor Student Engagement")
                .alias("engagement_effectiveness"),
                F.when(yos >= 15, "Senior Faculty")
                .when(yos >= 10, "Experienced Faculty")
                .when(yos >= 5, "Mid-Career Faculty")
                .otherwise("Junior Faculty")
                .alias("career_stage"),
                F.round(
                    tst.cast("decimal(18,2)")
                    / F.when(F.col("semesters_active") != 0,
                             F.col("semesters_active")),
                    2,
                ).alias("avg_students_per_semester"),
            )
        )

    @reg.model(
        "course_catalog_enhanced",
        deps=["stg_courses", "stg_departments", "int_course_performance_metrics"],
        materialized="table",
    )
    def course_catalog_enhanced(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/course_catalog_enhanced.sql:1-53
        c = ctx.ref("stg_courses")
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code", "department_size")
        prereq = ctx.ref("stg_courses").select(
            F.col("course_id").alias("pr_id"),
            F.col("course_code").alias("prerequisite_course"),
            F.col("course_name").alias("prerequisite_name"),
        )
        cpm = ctx.ref("int_course_performance_metrics").select(
            F.col("course_id").alias("cpm_id"), "total_enrollments",
            "unique_students", "semesters_offered", "avg_grade_points",
            "avg_attendance", "pass_rate", "withdrawal_rate", "excellent_grades",
            "good_grades", "satisfactory_grades", "poor_grades", "failing_grades",
        )
        pr, wr, aa = F.col("pass_rate"), F.col("withdrawal_rate"), F.col("avg_attendance")
        return (
            c.join(F.broadcast(d), "department_id", "left")
            .join(F.broadcast(prereq),
                  c.prerequisite_course_id == F.col("pr_id"), "left")
            .drop("pr_id")
            .join(cpm, c.course_id == F.col("cpm_id"), "left")
            .drop("cpm_id")
            .select(
                "course_id", "course_code", "course_name", "description",
                "credits", "difficulty_level", "difficulty_description",
                "credit_category", "department_name", "department_code",
                "department_size", "prerequisite_course", "prerequisite_name",
                "total_enrollments", "unique_students", "semesters_offered",
                "avg_grade_points", "avg_attendance", "pass_rate",
                "withdrawal_rate", "excellent_grades", "good_grades",
                "satisfactory_grades", "poor_grades", "failing_grades",
                F.when(pr >= 90, "High Success Rate")
                .when(pr >= 75, "Good Success Rate")
                .when(pr >= 60, "Moderate Success Rate")
                .otherwise("Low Success Rate")
                .alias("success_category"),
                F.when(wr >= 20, "High Dropout Risk")
                .when(wr >= 10, "Moderate Dropout Risk")
                .when(wr >= 5, "Low Dropout Risk")
                .otherwise("Minimal Dropout Risk")
                .alias("dropout_risk"),
                F.when(aa >= 95, "Excellent Engagement")
                .when(aa >= 85, "Good Engagement")
                .when(aa >= 75, "Fair Engagement")
                .otherwise("Poor Engagement")
                .alias("engagement_level"),
            )
        )


def register_marts_finance2(reg: ModelRegistry) -> None:
    @reg.model(
        "tuition_revenue_analysis",
        deps=["stg_tuition_payments", "stg_semesters", "stg_students",
              "stg_departments"],
        materialized="table",
    )
    def tuition_revenue_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/marts/finance/tuition_revenue_analysis.sql:1-104 —
        # W2 lag partitioned by department over (year, quarter) ordering
        # (:75-87).
        tp = ctx.ref("stg_tuition_payments")
        sem = ctx.ref("stg_semesters").select(
            "semester_id", "semester_name", "academic_year", "semester_type",
            F.col("start_date").alias("semester_start"),
            F.col("end_date").alias("semester_end"),
        )
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"), "student_status", "gpa",
            "academic_standing", "major_id",
        )
        d = ctx.ref("stg_departments").select(
            "department_id", "department_name", "department_code",
            F.col("budget").alias("department_budget"),
        )
        td = (
            tp.join(F.broadcast(sem), "semester_id", "left")
            .join(s, tp.student_id == F.col("s_id"), "left")
            .join(F.broadcast(d), F.col("major_id") == d.department_id, "left")
            .withColumn("payment_quarter", F.quarter("payment_date"))
        )
        n_late = F.count(F.when(F.col("payment_timeliness") == "Late Payment", 1))
        pm = F.col("payment_method_category")
        rm = td.groupBy(
            "semester_id", "semester_name", "academic_year", "semester_type",
            "semester_start", "semester_end", "department_name",
            "department_code", "payment_year", "payment_quarter",
        ).agg(
            F.countDistinct("payment_id").alias("total_payments"),
            F.countDistinct("student_id").alias("paying_students"),
            F.sum("amount").alias("total_tuition_revenue"),
            F.sum("late_fee").alias("total_late_fees"),
            F.sum("total_payment").alias("total_revenue_with_fees"),
            F.avg("amount").alias("avg_tuition_payment"),
            F.min("amount").alias("min_payment"),
            F.max("amount").alias("max_payment"),
            n_late.alias("late_payments"),
            F.count(F.when(pm == "Credit Card", 1)).alias("credit_card_payments"),
            F.count(F.when(pm == "Bank Transfer", 1)).alias(
                "bank_transfer_payments"
            ),
            F.count(F.when(pm == "Check", 1)).alias("check_payments"),
            F.round(
                n_late * 100.0
                / F.when(F.count("payment_id") != 0, F.count("payment_id")),
                2,
            ).alias("late_payment_percentage"),
            F.round(
                F.sum("late_fee") * 100.0
                / F.when(F.sum("total_payment") != 0, F.sum("total_payment")),
                2,
            ).alias("late_fee_percentage_of_revenue"),
        )
        w = Window.partitionBy("department_name").orderBy(
            "payment_year", "payment_quarter"
        )
        ttr = F.col("total_tuition_revenue")
        prev = F.lag(ttr).over(w)
        lpp = F.col("late_payment_percentage")
        return rm.select(
            "*",
            prev.alias("prev_period_revenue"),
            F.round((ttr - prev) * 100.0 / F.when(prev != 0, prev), 2).alias(
                "revenue_growth_rate"
            ),
            F.when(ttr >= 100_000, "High Revenue")
            .when(ttr >= 50_000, "Moderate Revenue")
            .when(ttr >= 25_000, "Low Revenue")
            .otherwise("Minimal Revenue")
            .alias("revenue_category"),
            F.when(lpp >= 20, "High Collection Risk")
            .when(lpp >= 10, "Moderate Collection Risk")
            .when(lpp >= 5, "Low Collection Risk")
            .otherwise("Minimal Collection Risk")
            .alias("collection_risk_category"),
            F.round(
                ttr / F.when(F.col("paying_students") != 0,
                             F.col("paying_students")),
                2,
            ).alias("revenue_per_student"),
            F.round(
                F.col("total_late_fees")
                / F.when(F.col("late_payments") != 0, F.col("late_payments")),
                2,
            ).alias("avg_late_fee_per_late_payment"),
        )

    @reg.model(
        "financial_aid_impact_analysis",
        deps=["stg_financial_aid", "stg_students", "stg_departments",
              "int_student_enrollment_history"],
        materialized="table",
    )
    def financial_aid_impact_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/marts/finance/financial_aid_impact_analysis.sql:1-130
        # — J4 RIGHT JOIN keeping all students (:24-26), receives_aid flag,
        # null-skipping comparison averages (A6), department stats join.
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"), "aid_type", "aid_category",
            F.col("amount").alias("aid_amount"), "academic_year",
            "support_level", "disbursement_period",
        )
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "gpa", "academic_standing",
            "student_status", "years_enrolled", "major_id",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code")
        eh = (
            ctx.ref("int_student_enrollment_history")
            .groupBy(F.col("student_id").alias("eh_student"))
            .agg(
                F.max("total_enrollments").alias("total_enrollments"),
                F.max("total_credits_earned").alias("total_credits_earned"),
                F.max("avg_grade_points").alias("avg_grade_points"),
                F.max("failed_courses_count").alias("failed_courses_count"),
                F.max("withdrawn_courses_count").alias("withdrawn_courses_count"),
            )
        )
        base = (
            fa.join(s, fa.fa_student == s.student_id, "right")  # J4 right join
            .join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(eh, s.student_id == F.col("eh_student"), "left")
            .drop("eh_student")
            .withColumn(
                "receives_aid",
                F.when(F.col("fa_student").isNotNull(), 1).otherwise(0),
            )
            # reference quirk preserved (sql:5 selects fa.student_id): the
            # output key is the RIGHT-JOIN's nullable aid-side student_id,
            # so no-aid students carry a NULL id (verified by the DuckDB
            # differential oracle running the original SQL)
            .drop("student_id")
            .withColumnRenamed("fa_student", "student_id")
        )

        def max_cat(cat):
            return F.max(
                F.when(F.col("aid_category") == cat, F.col("aid_amount")).otherwise(
                    F.lit(0).cast("decimal(10,2)")
                )
            )

        summary = base.groupBy(
            "student_id", "full_name", "gpa", "academic_standing",
            "student_status", "years_enrolled", "department_name",
            "department_code", "total_enrollments", "total_credits_earned",
            "avg_grade_points", "failed_courses_count", "withdrawn_courses_count",
        ).agg(
            F.sum(
                F.when(F.col("receives_aid") == 1, F.col("aid_amount")).otherwise(
                    F.lit(0).cast("decimal(10,2)")
                )
            ).alias("total_aid_received"),
            F.count(F.when(F.col("receives_aid") == 1, 1)).alias(
                "aid_awards_count"
            ),
            max_cat("Merit-Based").alias("merit_aid"),
            max_cat("Need-Based").alias("need_based_aid"),
            max_cat("Loan").alias("loan_aid"),
            max_cat("Work-Study").alias("work_study_aid"),
            F.max("receives_aid").alias("receives_any_aid"),
        )
        tar, raa, gpa = (F.col("total_aid_received"), F.col("receives_any_aid"),
                         F.col("gpa"))
        ia = summary.select(
            "*",
            F.when(raa == 1, "Aid Recipient").otherwise("No Aid").alias(
                "aid_status"
            ),
            F.when(tar >= 15_000, "High Aid")
            .when(tar >= 8_000, "Moderate Aid")
            .when(tar >= 3_000, "Low Aid")
            .when(tar > 0, "Minimal Aid")
            .otherwise("No Aid")
            .alias("aid_level"),
            F.when(
                (F.col("merit_aid") > F.col("need_based_aid"))
                & (F.col("merit_aid") > F.col("loan_aid")),
                "Merit Primary",
            )
            .when(F.col("need_based_aid") > F.col("loan_aid"), "Need Primary")
            .when(F.col("loan_aid") > 0, "Loan Primary")
            .otherwise("No Primary Type")
            .alias("primary_aid_type"),
            F.round(
                tar / F.when(F.col("years_enrolled") != 0,
                             F.col("years_enrolled")),
                2,
            ).alias("aid_per_year"),
            F.when((gpa >= 3.5) & (raa == 1), "High Performing Aid Recipient")
            .when((gpa >= 3.0) & (raa == 1), "Good Performing Aid Recipient")
            .when((gpa < 3.0) & (raa == 1), "At-Risk Aid Recipient")
            .when((gpa >= 3.5) & (raa == 0), "High Performing No Aid")
            .when((gpa >= 3.0) & (raa == 0), "Good Performing No Aid")
            .otherwise("At-Risk No Aid")
            .alias("performance_aid_category"),
        )
        das = ia.groupBy("department_name").agg(
            F.count(F.lit(1)).alias("total_students_in_dept"),
            F.count(F.when(raa == 1, 1)).alias("aid_recipients_in_dept"),
            F.avg(F.when(raa == 1, gpa)).alias("avg_gpa_aid_recipients"),
            F.avg(F.when(raa == 0, gpa)).alias("avg_gpa_no_aid"),
            F.avg(F.when(raa == 1, tar)).alias("avg_aid_amount"),
            F.round(
                F.count(F.when(raa == 1, 1)) * 100.0
                / F.when(F.count(F.lit(1)) != 0, F.count(F.lit(1))),
                2,
            ).alias("aid_recipient_percentage"),
        )
        das_j = das.select(
            "department_name", "aid_recipients_in_dept",
            F.col("avg_gpa_aid_recipients").alias("dept_avg_gpa_aid_recipients"),
            F.col("avg_gpa_no_aid").alias("dept_avg_gpa_no_aid"),
            F.col("avg_aid_amount").alias("dept_avg_aid_amount"),
            F.col("aid_recipient_percentage").alias("dept_aid_percentage"),
        )
        return ia.join(F.broadcast(das_j), "department_name", "left").select(
            "*",
            F.when(
                F.col("dept_avg_gpa_aid_recipients")
                > F.col("dept_avg_gpa_no_aid"),
                "Aid Recipients Outperform",
            )
            .when(
                F.col("dept_avg_gpa_aid_recipients")
                < F.col("dept_avg_gpa_no_aid"),
                "Non-Aid Recipients Outperform",
            )
            .otherwise("Similar Performance")
            .alias("dept_aid_performance_comparison"),
        )
