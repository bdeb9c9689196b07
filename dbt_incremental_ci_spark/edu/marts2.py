"""Marts tier, part 2: the institutional KPI dashboard (U1 union-all
KPI stack, J5 chained full outer joins, J6 cartesians, A13 global
aggregates, O1 sort on CASE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts2(reg: ModelRegistry) -> None:
    @reg.model(
        "institutional_kpi_dashboard",
        deps=["stg_students", "stg_enrollments", "stg_courses", "stg_semesters",
              "stg_faculty", "stg_class_sessions", "stg_tuition_payments",
              "stg_financial_aid", "stg_departments", "stg_assignments",
              "int_assignment_performance"],
        materialized="table",
    )
    def institutional_kpi_dashboard(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/institutional_kpi_dashboard.sql:1-259.
        # Two of the reference's CTEs are dead code — neither
        # `operational_kpis` (the three `on 1=1` cartesians, sql:108-111)
        # nor `semester_trends` (sql:121-151) is referenced by the final
        # select — so they are not materialized (at 100 TB the literal
        # O(n⁴) cartesian would also be unrunnable; a query optimizer
        # prunes it the same way).
        # The financial full-outer chain (sql:89-92) multiplies sums, so
        # it is preserved exactly. PG integer division of counts at
        # sql:65 (student_faculty_ratio) is reproduced with truncating
        # division (SURVEY §7.3). Output parity with the original SQL is
        # verified by tests/test_edu_oracle.py.
        rd = F.lit(ctx.run_date)
        s = ctx.ref("stg_students")
        e = ctx.ref("stg_enrollments")
        c = ctx.ref("stg_courses")
        sem = ctx.ref("stg_semesters")
        f = ctx.ref("stg_faculty")
        cs = ctx.ref("stg_class_sessions")
        tp = ctx.ref("stg_tuition_payments")
        fa = ctx.ref("stg_financial_aid")
        d = ctx.ref("stg_departments")

        def cdw(cond, col):  # count(distinct case when … then col end)
            return F.countDistinct(F.when(cond, F.col(col)))

        st = F.col("student_status")
        ekpi = (
            s.join(e.select(F.col("student_id").alias("e_student"), "enrollment_id"),
                   s.student_id == F.col("e_student"), "left")
            .agg(
                F.countDistinct("student_id").alias("total_active_students"),
                cdw(st == "active", "student_id").alias("currently_enrolled_students"),
                cdw(st == "graduated", "student_id").alias("total_graduates"),
                F.countDistinct("enrollment_id").alias("total_course_enrollments"),
                F.round(F.avg("gpa"), 2).alias("institutional_avg_gpa"),
                F.round(
                    cdw(st == "graduated", "student_id") * 100.0
                    / F.countDistinct("student_id"),
                    2,
                ).alias("overall_graduation_rate"),
                F.round(
                    cdw(F.col("academic_standing") == "Deans List", "student_id")
                    * 100.0
                    / F.when(cdw(st == "active", "student_id") != 0,
                             cdw(st == "active", "student_id")),
                    2,
                ).alias("honors_student_percentage"),
                F.round(
                    cdw(st == "dropped", "student_id") * 100.0
                    / F.countDistinct("student_id"),
                    2,
                ).alias("dropout_rate"),
            )
        )
        gc = F.col("grade_category")
        n_graded = F.count(F.when(gc != "Unknown", 1))
        akpi = (
            e.join(c.select(F.col("course_id").alias("c_id"), "difficulty_level"),
                   e.course_id == F.col("c_id"))
            .join(sem.select(F.col("semester_id").alias("sm_id")),
                  e.semester_id == F.col("sm_id"))
            .agg(
                F.round(F.avg("grade_points"), 2).alias("avg_course_performance"),
                F.round(F.avg("attendance_percentage"), 2).alias(
                    "avg_student_attendance"
                ),
                F.round(
                    F.count(
                        F.when(gc.isin("Excellent", "Good", "Satisfactory"), 1)
                    ) * 100.0 / F.when(n_graded != 0, n_graded),
                    2,
                ).alias("course_success_rate"),
                F.round(
                    F.count(F.when(F.col("enrollment_status") == "Withdrawn", 1))
                    * 100.0
                    / F.when(F.count("enrollment_id") != 0, F.count("enrollment_id")),
                    2,
                ).alias("course_withdrawal_rate"),
                F.countDistinct("c_id").alias("total_courses_offered"),
                F.round(F.avg("difficulty_level"), 1).alias("avg_course_difficulty"),
                F.count(F.when(F.col("difficulty_level") >= 4, 1)).alias(
                    "advanced_courses_offered"
                ),
            )
        )
        fkpi = (
            f.join(cs.select(F.col("faculty_id").alias("cs_fac"),
                             F.col("course_id").alias("cs_course"),
                             F.col("semester_id").alias("cs_sem")),
                   f.faculty_id == F.col("cs_fac"), "left")
            .join(
                e.select(F.col("course_id").alias("e_course2"),
                         F.col("semester_id").alias("e_sem2"),
                         F.col("student_id").alias("e_student2")),
                (F.col("cs_course") == F.col("e_course2"))
                & (F.col("cs_sem") == F.col("e_sem2")),
                "left",
            )
            .join(s.select(F.col("student_id").alias("s_id2")),
                  F.col("e_student2") == F.col("s_id2"), "left")
            .agg(
                F.countDistinct("faculty_id").alias("total_faculty"),
                F.round(F.avg("salary"), 0).alias("avg_faculty_salary"),
                F.round(F.avg("years_of_service"), 1).alias("avg_years_of_service"),
                F.count(F.when(F.col("position") == "Professor", 1)).alias(
                    "full_professors"
                ),
                F.count(F.when(F.col("position") == "Associate Professor", 1)).alias(
                    "associate_professors"
                ),
                F.count(F.when(F.col("position") == "Assistant Professor", 1)).alias(
                    "assistant_professors"
                ),
                F.round(
                    F.count(F.when(F.col("position") == "Professor", 1)) * 100.0
                    / F.when(F.count("faculty_id") != 0, F.count("faculty_id")),
                    2,
                ).alias("senior_faculty_percentage"),
                # PG integer division of two counts (sql:65) — truncates.
                F.round(
                    (
                        F.countDistinct("s_id2").cast("double")
                        / F.when(F.countDistinct("faculty_id") != 0,
                                 F.countDistinct("faculty_id"))
                    ).cast("long").cast("double"),
                    2,
                ).alias("student_faculty_ratio"),
            )
        )
        # financial full-outer chain preserved exactly (multiplies sums)
        tp_j = tp.select(F.col("student_id").alias("tp_student"),
                         F.col("amount").alias("tp_amount"))
        fa_j = fa.select(F.col("student_id").alias("fa_student"),
                         F.col("amount").alias("fa_amount"))
        s_j = s.select(F.col("student_id").alias("s_id3"), "major_id")
        d_j = d.select(F.col("department_id").alias("d_id"), "budget")
        f_j = f.select(F.col("department_id").alias("f_dep"),
                       F.col("salary").alias("f_salary"))
        fin = (
            tp_j.join(fa_j, F.col("tp_student") == F.col("fa_student"), "full_outer")
            .join(
                s_j,
                F.coalesce("tp_student", "fa_student") == F.col("s_id3"),
                "full_outer",
            )
            .join(d_j, F.col("major_id") == F.col("d_id"), "full_outer")
            .join(f_j, F.col("d_id") == F.col("f_dep"), "full_outer")
        )
        fikpi = fin.agg(
            F.sum("tp_amount").alias("total_tuition_revenue"),
            F.sum("fa_amount").alias("total_financial_aid"),
            F.sum("budget").alias("total_departmental_budgets"),
            F.sum("f_salary").alias("total_faculty_compensation"),
            F.round(
                F.sum("tp_amount")
                / F.when(F.countDistinct("s_id3") != 0, F.countDistinct("s_id3")),
                2,
            ).alias("revenue_per_student"),
            F.round(
                F.sum("budget")
                / F.when(F.countDistinct("s_id3") != 0, F.countDistinct("s_id3")),
                2,
            ).alias("cost_per_student"),
            F.round(
                F.sum("tp_amount")
                / F.when(F.sum("budget") != 0, F.sum("budget")),
                2,
            ).alias("revenue_to_budget_ratio"),
            F.round(
                F.sum("f_salary") / F.when(F.sum("budget") != 0, F.sum("budget"))
                * 100,
                2,
            ).alias("faculty_cost_percentage"),
            F.round(
                F.sum("fa_amount") * 100.0
                / F.when(
                    (F.sum("tp_amount") + F.sum("fa_amount")) != 0,
                    F.sum("tp_amount") + F.sum("fa_amount"),
                ),
                2,
            ).alias("financial_aid_percentage"),
        )

        # ---- KPI target rows (U1 union-all stack, sql:154-216) ----------
        tas = F.col("total_active_students")
        k1 = ekpi.select(
            rd.alias("report_date"),
            F.lit("Enrollment Metrics").alias("kpi_category"),
            F.lit("Total Active Students").alias("kpi_name"),
            tas.cast("double").alias("actual_value"),
            F.lit(1200.0).alias("target_value"),
            F.when(tas >= 1200, "On Target")
            .when(tas >= 1080, "Close to Target")
            .otherwise("Below Target")
            .alias("status"),
            F.round(tas / 1200.0 * 100, 1).alias("achievement_percentage"),
        )
        csr = F.col("course_success_rate")
        k2 = akpi.select(
            rd.alias("report_date"),
            F.lit("Academic Performance").alias("kpi_category"),
            F.lit("Course Success Rate").alias("kpi_name"),
            csr.cast("double").alias("actual_value"),
            F.lit(85.0).alias("target_value"),
            F.when(csr >= 85, "On Target")
            .when(csr >= 76.5, "Close to Target")
            .otherwise("Below Target")
            .alias("status"),
            F.round(csr / 85.0 * 100, 1).alias("achievement_percentage"),
        )
        sfr = F.col("student_faculty_ratio")
        k3 = fkpi.select(
            rd.alias("report_date"),
            F.lit("Faculty Metrics").alias("kpi_category"),
            F.lit("Student Faculty Ratio").alias("kpi_name"),
            sfr.cast("double").alias("actual_value"),
            F.lit(20.0).alias("target_value"),
            F.when(sfr.between(15, 25), "On Target")
            .when(sfr.between(12, 28), "Close to Target")
            .otherwise("Below Target")
            .alias("status"),
            F.when(sfr.between(15, 25), F.lit(100.0))
            .otherwise(F.round(20.0 / F.abs(sfr - 20.0) * 100, 1))
            .alias("achievement_percentage"),
        )
        rbr = F.col("revenue_to_budget_ratio")
        k4 = fikpi.select(
            rd.alias("report_date"),
            F.lit("Financial Metrics").alias("kpi_category"),
            F.lit("Revenue to Budget Ratio").alias("kpi_name"),
            rbr.cast("double").alias("actual_value"),
            F.lit(1.2).alias("target_value"),
            F.when(rbr >= 1.2, "On Target")
            .when(rbr >= 1.08, "Close to Target")
            .otherwise("Below Target")
            .alias("status"),
            F.round(rbr / 1.2 * 100, 1).alias("achievement_percentage"),
        )
        kts = k1.unionByName(k2).unionByName(k3).unionByName(k4)

        st_col = F.col("status")
        eds = kts.agg(
            F.count(F.lit(1)).alias("total_kpis_tracked"),
            F.count(F.when(st_col == "On Target", 1)).alias("kpis_on_target"),
            F.count(F.when(st_col == "Close to Target", 1)).alias(
                "kpis_close_to_target"
            ),
            F.count(F.when(st_col == "Below Target", 1)).alias("kpis_below_target"),
            F.round(
                F.count(F.when(st_col == "On Target", 1)) * 100.0 / F.count(F.lit(1)),
                1,
            ).alias("overall_kpi_success_rate"),
            F.round(F.avg("achievement_percentage"), 1).alias(
                "avg_achievement_percentage"
            ),
            F.when(
                F.count(F.when(st_col == "Below Target", 1)) >= 3,
                "Critical - Multiple KPIs Below Target",
            )
            .when(
                F.count(F.when(st_col == "Below Target", 1)) >= 2,
                "Warning - Some KPIs Below Target",
            )
            .when(
                F.count(F.when(st_col == "On Target", 1))
                >= F.count(F.lit(1)) * 0.8,
                "Excellent - Most KPIs On Target",
            )
            .otherwise("Good - Majority of KPIs Performing Well")
            .alias("overall_institutional_health"),
        )
        kn = F.col("kpi_name")
        return (
            kts.crossJoin(
                F.broadcast(eds.select("overall_kpi_success_rate",
                                       "overall_institutional_health"))
            )
            .select(
                "*",
                F.when(
                    (st_col == "Below Target")
                    & kn.isin("Course Success Rate", "Student Faculty Ratio"),
                    "High Priority Action Required",
                )
                .when(st_col == "Below Target", "Action Required")
                .when(st_col == "Close to Target", "Monitor Closely")
                .otherwise("Continue Current Strategy")
                .alias("action_priority"),
                F.when(
                    (kn == "Total Active Students") & (st_col == "Below Target"),
                    "Enhance recruitment and retention programs",
                )
                .when(
                    (kn == "Course Success Rate") & (st_col == "Below Target"),
                    "Improve academic support and teaching effectiveness",
                )
                .when(
                    (kn == "Student Faculty Ratio") & (st_col == "Below Target"),
                    "Optimize faculty allocation or adjust enrollment",
                )
                .when(
                    (kn == "Revenue to Budget Ratio") & (st_col == "Below Target"),
                    "Review pricing strategy and cost management",
                )
                .otherwise("Maintain current practices")
                .alias("improvement_recommendation"),
            )
            .orderBy(
                F.when(st_col == "Below Target", 1)
                .when(st_col == "Close to Target", 2)
                .otherwise(3),
                F.asc("achievement_percentage"),
            )
        )

    @reg.model(
        "semester_enrollment_trends",
        deps=["stg_semesters", "stg_enrollments", "stg_courses", "stg_students",
              "stg_departments"],
        materialized="table",
    )
    def semester_enrollment_trends(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/semester_enrollment_trends.sql:1-123
        # — semester rollup, W2 lag trends (:42-52), seasonal re-aggregation
        # (A14 agg-of-agg), categorical buckets.
        sem = ctx.ref("stg_semesters").select(
            "semester_id", "semester_name", "academic_year", "semester_type",
            "start_date", "end_date", "semester_duration_days", "semester_status",
        )
        e = ctx.ref("stg_enrollments").select(
            "semester_id", "enrollment_id", "student_id", "course_id",
            "grade_points", "attendance_percentage", "grade_category",
            "enrollment_status",
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"), "credits", "difficulty_level",
            "department_id",
        )
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"), "academic_standing"
        )
        d = ctx.ref("stg_departments").select(
            F.col("department_id").alias("d_id")
        )
        gc = F.col("grade_category")
        base = (
            sem.join(e, "semester_id", "left")
            .join(F.broadcast(c), e.course_id == F.col("c_id"), "left")
            .join(s, e.student_id == F.col("s_id"), "left")
            .join(F.broadcast(d), F.col("department_id") == F.col("d_id"), "left")
            .groupBy(
                "semester_id", "semester_name", "academic_year", "semester_type",
                "start_date", "end_date", "semester_duration_days",
                "semester_status",
            )
            .agg(
                F.countDistinct("enrollment_id").alias("total_enrollments"),
                F.countDistinct("student_id").alias("unique_students"),
                F.countDistinct("course_id").alias("unique_courses"),
                F.countDistinct("d_id").alias("departments_with_enrollments"),
                F.avg("grade_points").alias("avg_semester_grade_points"),
                F.avg("attendance_percentage").alias("avg_semester_attendance"),
                F.sum("credits").alias("total_credit_hours_enrolled"),
                F.count(F.when(gc == "Excellent", 1)).alias("excellent_grades"),
                F.count(F.when(gc == "Good", 1)).alias("good_grades"),
                F.count(F.when(gc == "Satisfactory", 1)).alias(
                    "satisfactory_grades"
                ),
                F.count(F.when(gc == "Poor", 1)).alias("poor_grades"),
                F.count(F.when(gc == "Failing", 1)).alias("failing_grades"),
                F.count(F.when(F.col("enrollment_status") == "Withdrawn", 1)).alias(
                    "withdrawals"
                ),
                F.count(
                    F.when(F.col("academic_standing") == "Deans List", 1)
                ).alias("deans_list_students"),
                F.count(
                    F.when(F.col("academic_standing") == "Academic Probation", 1)
                ).alias("probation_students"),
                F.avg("difficulty_level").alias("avg_course_difficulty"),
            )
        )
        w = Window.orderBy("start_date")
        te, us = F.col("total_enrollments"), F.col("unique_students")
        prev_te, prev_us = F.lag(te).over(w), F.lag(us).over(w)
        ta = base.select(
            "*",
            prev_te.alias("prev_semester_enrollments"),
            prev_us.alias("prev_semester_students"),
            F.lag("avg_semester_grade_points").over(w).alias("prev_semester_gpa"),
            F.round(
                (te - prev_te) * 100.0 / F.when(prev_te != 0, prev_te), 2
            ).alias("enrollment_growth_rate"),
            F.round(
                (us - prev_us) * 100.0 / F.when(prev_us != 0, prev_us), 2
            ).alias("student_growth_rate"),
            F.round(
                (F.col("excellent_grades") + F.col("good_grades")
                 + F.col("satisfactory_grades")) * 100.0 / F.when(te != 0, te),
                2,
            ).alias("success_rate"),
            F.round(F.col("withdrawals") * 100.0 / F.when(te != 0, te), 2).alias(
                "withdrawal_rate"
            ),
            F.round(
                F.col("total_credit_hours_enrolled").cast("decimal(18,2)")
                / F.when(us != 0, us),
                2,
            ).alias("avg_credit_load_per_student"),
            F.round(
                F.col("deans_list_students") * 100.0 / F.when(us != 0, us), 2
            ).alias("deans_list_percentage"),
            F.round(
                F.col("probation_students") * 100.0 / F.when(us != 0, us), 2
            ).alias("probation_percentage"),
        )
        sp = ta.groupBy("semester_type").agg(
            F.count(F.lit(1)).alias("semester_count"),
            F.avg("total_enrollments").alias("avg_enrollments_by_season"),
            F.avg("unique_students").alias("avg_students_by_season"),
            F.avg("success_rate").alias("avg_success_rate_by_season"),
            F.avg("withdrawal_rate").alias("avg_withdrawal_rate_by_season"),
            F.avg("avg_semester_grade_points").alias("avg_gpa_by_season"),
            F.avg("avg_credit_load_per_student").alias("avg_credit_load_by_season"),
        )
        sr, wr = F.col("success_rate"), F.col("withdrawal_rate")
        egr, acl = F.col("enrollment_growth_rate"), F.col("avg_credit_load_per_student")
        return (
            ta.join(
                F.broadcast(
                    sp.select("semester_type", "avg_enrollments_by_season",
                              "avg_success_rate_by_season",
                              "avg_withdrawal_rate_by_season", "avg_gpa_by_season")
                ),
                "semester_type",
                "left",
            )
            .select(
                "*",
                F.when(sr >= 85, "High Performing Semester")
                .when(sr >= 70, "Good Performing Semester")
                .when(sr >= 60, "Average Performing Semester")
                .otherwise("Low Performing Semester")
                .alias("semester_performance_category"),
                F.when(wr <= 5, "Low Attrition")
                .when(wr <= 10, "Moderate Attrition")
                .when(wr <= 15, "High Attrition")
                .otherwise("Very High Attrition")
                .alias("attrition_category"),
                F.when(egr > 10, "High Growth")
                .when(egr > 0, "Positive Growth")
                .when(egr == 0, "No Growth")
                .when(egr > -10, "Decline")
                .otherwise("Significant Decline")
                .alias("growth_category"),
                F.when(acl >= 15, "Heavy Course Load")
                .when(acl >= 12, "Standard Course Load")
                .when(acl >= 9, "Light Course Load")
                .otherwise("Very Light Course Load")
                .alias("course_load_category"),
            )
            .orderBy("start_date")
        )
