"""Intermediate tier, part 3: faculty-student interactions (J6 explicit
cartesian, A11 distinct string_agg), at-risk indicators (cross-tier mart
dependency, flag-sum scoring)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.agg import string_agg_distinct
from dbt_incremental_ci_spark.functions.pg import pg_corr
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_intermediate4(reg: ModelRegistry) -> None:
    @reg.model(
        "int_faculty_student_interactions",
        deps=["stg_faculty", "stg_class_sessions", "stg_courses", "stg_enrollments",
              "stg_students", "stg_semesters", "stg_departments"],
    )
    def int_faculty_student_interactions(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_faculty_student_interactions.sql
        # :27-33 six-way join chain, :48 stddev, :59 corr, :75 distinct
        # ordered string_agg, :125 explicit `on 1=1` cartesian (J6,
        # preserved — the reference cross-joins every faculty metric row
        # with every student exposure row).
        f = ctx.ref("stg_faculty").select(
            "faculty_id", F.col("full_name").alias("faculty_name"), "position",
            "department_id", "years_of_service",
        )
        cs = ctx.ref("stg_class_sessions").select("faculty_id", "course_id",
                                                  "semester_id")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "difficulty_level", "credits")
        e = ctx.ref("stg_enrollments").select(
            F.col("course_id").alias("e_course"),
            F.col("semester_id").alias("e_sem"), "student_id", "grade",
            "grade_points", "attendance_percentage", "grade_category",
        )
        s = ctx.ref("stg_students").select(
            "student_id", F.col("full_name").alias("student_name"),
            F.col("gpa").alias("student_cumulative_gpa"), "academic_standing",
        )
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        conn = (
            f.join(cs, "faculty_id")
            .join(F.broadcast(c), "course_id")
            .join(e, (c.course_id == e.e_course) & (cs.semester_id == e.e_sem))
            .join(s, "student_id")
            .join(F.broadcast(sem), "semester_id")
            .join(F.broadcast(d), "department_id")
        )
        gc = F.col("grade_category")
        n_pass = F.count(F.when(gc.isin("Excellent", "Good", "Satisfactory"), 1))
        n_graded = F.count(F.when(gc != "Unknown", 1))
        fte = conn.groupBy(
            "faculty_id", "faculty_name", "position", "department_name",
            "years_of_service",
        ).agg(
            F.countDistinct("student_id").alias("total_unique_students_taught"),
            F.countDistinct("course_id").alias("unique_courses_taught"),
            F.countDistinct("semester_id").alias("semesters_taught"),
            F.avg("grade_points").alias("avg_grade_given"),
            F.avg("attendance_percentage").alias("avg_student_attendance"),
            F.stddev("grade_points").alias("grade_consistency"),
            F.count(F.when(gc == "Excellent", 1)).alias("excellent_grades_given"),
            F.count(F.when(gc == "Good", 1)).alias("good_grades_given"),
            F.count(F.when(gc == "Satisfactory", 1)).alias(
                "satisfactory_grades_given"
            ),
            F.count(F.when(gc == "Poor", 1)).alias("poor_grades_given"),
            F.count(F.when(gc == "Failing", 1)).alias("failing_grades_given"),
            F.round(n_pass * 100.0 / F.when(n_graded != 0, n_graded), 2).alias(
                "student_success_rate"
            ),
            F.avg("student_cumulative_gpa").alias("avg_incoming_student_gpa"),
            pg_corr("student_cumulative_gpa", "grade_points").alias(
                "gpa_correlation_with_performance"
            ),
            F.avg("difficulty_level").alias("avg_course_difficulty_taught"),
            F.sum("credits").alias("total_credit_hours_taught"),
        )
        sfe = conn.groupBy(
            "student_id", "student_name", "student_cumulative_gpa",
            "academic_standing",
        ).agg(
            F.countDistinct("faculty_id").alias("unique_faculty_encountered"),
            F.countDistinct("department_id").alias("departments_studied_in"),
            F.avg("grade_points").alias("avg_grade_received"),
            string_agg_distinct("faculty_name", ", ").alias("faculty_list"),
            F.count(F.when(F.col("position") == "Professor", 1)).alias(
                "courses_with_professors"
            ),
            F.count(F.when(F.col("position") == "Associate Professor", 1)).alias(
                "courses_with_assoc_professors"
            ),
            F.count(F.when(F.col("position") == "Assistant Professor", 1)).alias(
                "courses_with_asst_professors"
            ),
            F.avg("years_of_service").alias("avg_faculty_experience"),
            F.countDistinct("course_id").alias("total_courses_taken"),
        )
        ssr = F.col("student_success_rate")
        asa = F.col("avg_student_attendance")
        gcp = F.abs(F.col("gpa_correlation_with_performance"))
        gcons = F.col("grade_consistency")
        iqm = fte.select(
            "*",
            F.when(ssr >= 90, "Exceptional Educator")
            .when(ssr >= 80, "Highly Effective Educator")
            .when(ssr >= 70, "Effective Educator")
            .when(ssr >= 60, "Adequate Educator")
            .otherwise("Needs Improvement")
            .alias("teaching_effectiveness_category"),
            F.when(asa >= 95, "Highly Engaging")
            .when(asa >= 85, "Engaging")
            .when(asa >= 75, "Moderately Engaging")
            .otherwise("Low Engagement")
            .alias("student_engagement_level"),
            F.when(gcp >= 0.7, "Strong Predictor")
            .when(gcp >= 0.4, "Moderate Predictor")
            .when(gcp >= 0.2, "Weak Predictor")
            .otherwise("No Predictive Value")
            .alias("prior_gpa_predictive_power"),
            F.when(gcons <= 0.5, "Very Consistent Grading")
            .when(gcons <= 1.0, "Consistent Grading")
            .when(gcons <= 1.5, "Somewhat Inconsistent")
            .otherwise("Inconsistent Grading")
            .alias("grading_consistency_level"),
            F.round(
                F.col("total_unique_students_taught").cast("decimal(18,2)")
                / F.col("semesters_taught"),
                2,
            ).alias("avg_students_per_semester"),
        )
        return iqm.crossJoin(  # sql:125 `on 1=1` — explicit cartesian preserved
            sfe.select(
                "unique_faculty_encountered", "avg_faculty_experience",
                "courses_with_professors", "courses_with_assoc_professors",
                "courses_with_asst_professors",
            )
        )

    @reg.model(
        "int_student_at_risk_indicators",
        deps=["stg_students", "stg_departments", "int_student_enrollment_history",
              "student_financial_profile"],
    )
    def int_student_at_risk_indicators(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_student_at_risk_indicators.sql:1-103
        # — cross-tier dependency on the student_financial_profile MART
        # (the reference DAG has marts feeding intermediates, SURVEY §7
        # build-plan note), 8 binary risk flags summed into a score.
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "email", "gpa", "academic_standing",
            "student_status", "years_enrolled", "major_id",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name")
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
        sfp = ctx.ref("student_financial_profile").select(
            F.col("student_id").alias("sfp_student"), "total_aid_received",
            "late_payment_rate", "payment_reliability",
        )
        base = (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(eh, "student_id", "left")
            .join(sfp, s.student_id == sfp.sfp_student, "left")
            .drop("sfp_student")
        )
        flags = base.select(
            "*",
            F.when(F.col("avg_attendance") < 75, 1).otherwise(0).alias(
                "low_attendance_flag"
            ),
            F.when(F.col("gpa") < 2.0, 1).otherwise(0).alias(
                "academic_probation_flag"
            ),
            F.when(F.col("failed_courses_count") >= 2, 1).otherwise(0).alias(
                "multiple_failures_flag"
            ),
            F.when(F.col("withdrawn_courses_count") >= 3, 1).otherwise(0).alias(
                "excessive_withdrawals_flag"
            ),
            F.when(F.col("late_payment_rate") > 25, 1).otherwise(0).alias(
                "payment_issues_flag"
            ),
            F.when(
                (F.col("years_enrolled") > 5) & (F.col("student_status") == "active"),
                1,
            ).otherwise(0).alias("extended_timeline_flag"),
            F.when(
                F.col("total_credits_earned") < F.col("years_enrolled") * 12, 1
            ).otherwise(0).alias("slow_progress_flag"),
            F.when(
                (F.col("total_aid_received") == 0)
                & (F.col("late_payment_rate") > 10),
                1,
            ).otherwise(0).alias("financial_stress_flag"),
        )
        total = (
            F.col("low_attendance_flag") + F.col("academic_probation_flag")
            + F.col("multiple_failures_flag") + F.col("excessive_withdrawals_flag")
            + F.col("payment_issues_flag") + F.col("extended_timeline_flag")
            + F.col("slow_progress_flag") + F.col("financial_stress_flag")
        )
        scored = flags.select(
            "*",
            total.alias("total_risk_score"),
            F.when(total >= 5, "Critical Risk")
            .when(total >= 3, "High Risk")
            .when(total >= 1, "Moderate Risk")
            .otherwise("Low Risk")
            .alias("risk_level"),
            F.when(
                (F.col("academic_probation_flag") == 1)
                & (F.col("multiple_failures_flag") == 1),
                "Academic Crisis",
            )
            .when(
                (F.col("low_attendance_flag") == 1)
                & (F.col("slow_progress_flag") == 1),
                "Engagement Issues",
            )
            .when(
                (F.col("payment_issues_flag") == 1)
                & (F.col("financial_stress_flag") == 1),
                "Financial Crisis",
            )
            .when(
                (F.col("excessive_withdrawals_flag") == 1)
                & (F.col("extended_timeline_flag") == 1),
                "Completion Risk",
            )
            .otherwise("General Risk")
            .alias("primary_risk_category"),
        )
        rl, prc = F.col("risk_level"), F.col("primary_risk_category")
        return scored.select(
            "*",
            F.when(
                rl == "Critical Risk",
                "Immediate intervention required - Academic advisor meeting, "
                "counseling referral, financial aid review",
            )
            .when(
                (rl == "High Risk") & (prc == "Academic Crisis"),
                "Academic support - Tutoring, study skills workshop, course load "
                "reduction",
            )
            .when(
                (rl == "High Risk") & (prc == "Financial Crisis"),
                "Financial counseling - Payment plan setup, additional aid "
                "application assistance",
            )
            .when(
                (rl == "High Risk") & (prc == "Engagement Issues"),
                "Engagement support - Attendance monitoring, study group "
                "placement, mentor assignment",
            )
            .when(
                rl == "Moderate Risk",
                "Preventive support - Regular check-ins, academic planning session",
            )
            .otherwise("Standard support - Routine academic advising")
            .alias("recommended_intervention"),
            F.concat(
                F.when(F.col("low_attendance_flag") == 1,
                       "Monitor attendance closely").otherwise(""),
                F.when(F.col("academic_probation_flag") == 1,
                       " | Academic probation follow-up").otherwise(""),
                F.when(F.col("payment_issues_flag") == 1,
                       " | Financial aid counseling").otherwise(""),
                F.when(F.col("slow_progress_flag") == 1,
                       " | Degree planning review").otherwise(""),
            ).alias("specific_action_items"),
        )
