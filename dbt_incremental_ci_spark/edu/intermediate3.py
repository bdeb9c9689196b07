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


def register_intermediate5(reg: ModelRegistry) -> None:
    @reg.model(
        "int_student_success_predictors",
        deps=["stg_students", "stg_departments", "stg_enrollments", "stg_courses",
              "stg_semesters", "student_financial_profile",
              "int_student_enrollment_history"],
    )
    def int_student_success_predictors(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_student_success_predictors.sql:1-199
        # — W4 first_value early-indicator windows (:14-16, tiebreaker
        # enrollment_id added), cross-tier mart joins (:34-61), weighted
        # success scoring. Output grain = enrollment fan-out rows, as in
        # the reference (no collapse before the final select).
        from pyspark.sql import Window

        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "age", "gpa", "student_status",
            "years_enrolled", "academic_standing", "major_id",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        e = ctx.ref("stg_enrollments").select(
            F.col("student_id").alias("e_student"), "course_id", "semester_id",
            "enrollment_id", "grade_points", "attendance_percentage",
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"), "difficulty_level"
        )
        sem = ctx.ref("stg_semesters").select(
            F.col("semester_id").alias("sm_id"), "start_date"
        )
        sfp = ctx.ref("student_financial_profile")
        fa = sfp.groupBy(F.col("student_id").alias("fa_student")).agg(
            F.sum("total_aid_received").alias("total_aid_received"),
            F.max("aid_recipient_category").alias("aid_recipient_category"),
        )
        tp = sfp.groupBy(F.col("student_id").alias("tp_student")).agg(
            F.max("late_payment_rate").alias("late_payment_rate"),
            F.max("payment_reliability").alias("payment_reliability"),
        )
        eh = (
            ctx.ref("int_student_enrollment_history")
            .groupBy(F.col("student_id").alias("eh_student"))
            .agg(
                F.max("avg_attendance").alias("avg_attendance"),
                F.max("total_enrollments").alias("total_enrollments"),
                F.max("failed_courses_count").alias("failed_courses_count"),
                F.max("withdrawn_courses_count").alias("withdrawn_courses_count"),
                F.max("total_credits_attempted").alias("total_credits_attempted"),
                F.max("total_credits_earned").alias("total_credits_earned"),
            )
        )
        w = Window.partitionBy("student_id").orderBy("start_date", "enrollment_id")
        base = (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(e, s.student_id == e.e_student, "left")
            .join(F.broadcast(c), F.col("course_id") == F.col("c_id"), "left")
            .join(F.broadcast(sem), F.col("semester_id") == F.col("sm_id"), "left")
            .join(fa, s.student_id == F.col("fa_student"), "left")
            .join(tp, s.student_id == F.col("tp_student"), "left")
            .join(eh, s.student_id == F.col("eh_student"), "left")
            .select(
                "student_id", "full_name", "age", "gpa", "student_status",
                "years_enrolled", "academic_standing", "department_name",
                F.first("grade_points").over(w).alias("first_semester_gpa"),
                F.first("attendance_percentage").over(w).alias(
                    "first_semester_attendance"
                ),
                F.first("difficulty_level").over(w).alias("first_course_difficulty"),
                "total_aid_received", "aid_recipient_category",
                "late_payment_rate", "payment_reliability", "avg_attendance",
                "total_enrollments", "failed_courses_count",
                "withdrawn_courses_count", "total_credits_attempted",
                "total_credits_earned",
            )
        )
        flag = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
        pf = base.select(
            "*",
            flag(F.col("first_semester_gpa") >= 3.5).alias("strong_academic_start"),
            flag(F.col("first_semester_attendance") >= 90).alias(
                "strong_engagement_start"
            ),
            flag(F.col("first_course_difficulty") <= 2).alias(
                "appropriate_starting_difficulty"
            ),
            flag(F.col("age") > 25).alias("non_traditional_age"),
            flag(F.col("total_aid_received") > 15_000).alias("high_financial_need"),
            flag(F.col("late_payment_rate") > 15).alias("payment_issues"),
            flag(F.col("avg_attendance") < 80).alias("attendance_concern"),
            flag(F.col("failed_courses_count") > 0).alias("has_failed_courses"),
            flag(F.col("withdrawn_courses_count") > 2).alias(
                "excessive_withdrawals"
            ),
            flag(F.col("aid_recipient_category").like("%Merit%")).alias(
                "merit_based_aid"
            ),
            flag(
                F.col("payment_reliability") == "Excellent Payment History"
            ).alias("reliable_payments"),
            flag(
                F.col("total_credits_earned") >= F.col("years_enrolled") * 15
            ).alias("on_track_credits"),
            F.round(
                F.col("total_credits_earned").cast("decimal(18,2)")
                / F.when(F.col("total_credits_attempted") != 0,
                         F.col("total_credits_attempted")) * 100,
                2,
            ).alias("completion_rate"),
            F.round(
                F.col("total_credits_earned").cast("decimal(18,2)")
                / F.when(F.col("years_enrolled") != 0, F.col("years_enrolled")),
                2,
            ).alias("credits_per_year"),
            (F.col("gpa") - F.col("first_semester_gpa")).alias("gpa_trajectory"),
            F.when(F.col("student_status") == "graduated", 1)
            .when(
                (F.col("student_status") == "active") & (F.col("gpa") >= 2.0),
                F.lit(None).cast("int"),
            )
            .otherwise(0)
            .alias("successful_outcome"),
        )
        gpa, cr = F.col("gpa"), F.col("completion_rate")
        risk_sum = (
            F.col("non_traditional_age") + F.col("high_financial_need")
            + F.col("payment_issues") + F.col("attendance_concern")
            + F.col("has_failed_courses") + F.col("excessive_withdrawals")
        )
        score = (
            F.col("strong_academic_start") * 15
            + F.col("strong_engagement_start") * 10
            + F.col("appropriate_starting_difficulty") * 5
            + F.col("merit_based_aid") * 10
            + F.col("reliable_payments") * 10
            + F.col("on_track_credits") * 15
            + F.when(gpa >= 3.5, 15).when(gpa >= 3.0, 12).when(gpa >= 2.5, 8)
            .when(gpa >= 2.0, 5).otherwise(0)
            + F.when(cr >= 95, 10).when(cr >= 85, 8).when(cr >= 75, 6).otherwise(3)
            - F.col("non_traditional_age") * 3
            - F.col("high_financial_need") * 5
            - F.col("payment_issues") * 8
            - F.col("attendance_concern") * 12
            - F.col("has_failed_courses") * 10
            - F.col("excessive_withdrawals") * 15
        )
        ss = pf.select(
            "*",
            F.round(score, 0).alias("success_probability_score"),
            F.when(risk_sum >= 4, "Very High Risk")
            .when(risk_sum >= 3, "High Risk")
            .when(risk_sum >= 2, "Moderate Risk")
            .when(risk_sum == 1, "Low Risk")
            .otherwise("Very Low Risk")
            .alias("overall_risk_category"),
            F.when(
                (F.col("strong_academic_start") == 1)
                & (F.col("strong_engagement_start") == 1),
                "Strong Foundation",
            )
            .when(
                (F.col("reliable_payments") == 1) & (F.col("on_track_credits") == 1),
                "Financial Stability",
            )
            .when((F.col("merit_based_aid") == 1) & (gpa >= 3.5),
                  "Academic Excellence")
            .when((cr >= 90) & (F.col("avg_attendance") >= 85),
                  "Consistent Performance")
            .otherwise("Mixed Indicators")
            .alias("primary_success_factor"),
            F.when(
                (F.col("attendance_concern") == 1)
                & (F.col("has_failed_courses") == 1),
                "Academic Disengagement",
            )
            .when(
                (F.col("payment_issues") == 1)
                & (F.col("high_financial_need") == 1),
                "Financial Stress",
            )
            .when(F.col("excessive_withdrawals") == 1, "Course Completion Issues")
            .when(F.col("non_traditional_age") == 1, "Non-Traditional Challenges")
            .otherwise("Standard Risk Profile")
            .alias("primary_risk_factor"),
        )
        orc, prf = F.col("overall_risk_category"), F.col("primary_risk_factor")
        sps, cpy = F.col("success_probability_score"), F.col("credits_per_year")
        return ss.select(
            "*",
            F.when(
                orc.isin("Very High Risk", "High Risk")
                & (prf == "Academic Disengagement"),
                "Immediate academic coaching, mandatory study sessions, "
                "attendance monitoring",
            )
            .when(
                orc.isin("Very High Risk", "High Risk")
                & (prf == "Financial Stress"),
                "Emergency financial aid, payment plan restructuring, financial "
                "literacy counseling",
            )
            .when(
                orc.isin("Very High Risk", "High Risk")
                & (prf == "Course Completion Issues"),
                "Academic planning review, prerequisite assessment, course load "
                "reduction",
            )
            .when(
                orc == "Moderate Risk",
                "Regular check-ins with advisor, peer tutoring, study skill "
                "workshops",
            )
            .when(
                (orc == "Low Risk")
                & (F.col("primary_success_factor") == "Academic Excellence"),
                "Honors program recruitment, research opportunities, leadership "
                "roles",
            )
            .otherwise("Standard academic support services")
            .alias("recommended_interventions"),
            F.when(
                (F.col("years_enrolled") >= 2) & (F.col("total_enrollments") >= 8),
                "High Confidence",
            )
            .when(
                (F.col("years_enrolled") >= 1) & (F.col("total_enrollments") >= 4),
                "Moderate Confidence",
            )
            .otherwise("Low Confidence - Insufficient Data")
            .alias("prediction_confidence"),
            F.when(F.col("successful_outcome") == 1, "Already Graduated")
            .when(
                sps >= 80,
                F.when(cpy >= 15, "Expected 4-year graduation")
                .when(cpy >= 12, "Expected 5-year graduation")
                .otherwise("Extended timeline likely"),
            )
            .when(sps >= 60, "Likely to graduate with support")
            .when(sps >= 40, "At risk - intensive intervention needed")
            .otherwise("Unlikely to graduate without major intervention")
            .alias("graduation_prediction"),
        ).orderBy(F.asc("success_probability_score"),
                  F.desc("overall_risk_category"), "student_id")


def register_intermediate6(reg: ModelRegistry) -> None:
    @reg.model(
        "int_resource_utilization_analysis",
        deps=["stg_class_sessions", "stg_courses", "stg_semesters", "stg_faculty",
              "stg_departments", "stg_assignments", "int_assignment_performance",
              "stg_students", "stg_tuition_payments", "stg_financial_aid"],
    )
    def int_resource_utilization_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/
        #   int_resource_utilization_analysis.sql:1-218 — four sub-analyses
        # combined by `full outer join on 1=1` (:164-166, J6). With
        # non-empty sides that's a cross product — implemented as
        # crossJoin (identical results; a FULL OUTER on 1=1 only differs
        # when a side is empty, which the WHERE at :211-212 then filters
        # the same way).
        from dbt_incremental_ci_spark.functions.pg import pg_dow

        cs = ctx.ref("stg_class_sessions")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "credits", "department_id")
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        cu = (
            cs.join(F.broadcast(c.select("course_id", "course_code", "credits")),
                    "course_id")
            .join(F.broadcast(sem), "semester_id")
            .groupBy(
                "room_id", "course_id", "semester_id", "course_code", "credits",
                "semester_name", "academic_year", "session_time", "session_date",
            )
            .agg(
                F.countDistinct("session_date").alias("sessions_held"),
                F.avg("attendance_count").alias("avg_session_attendance"),
                F.max("attendance_count").alias("max_session_attendance"),
                F.sum("attendance_count").alias("total_student_sessions"),
            )
            .withColumn("session_hour",
                        F.substring("session_time", 1, 2).cast("int"))
            .withColumn("day_of_week", pg_dow("session_date"))
        )
        rem = cu.groupBy("room_id", "semester_id", "semester_name").agg(
            F.countDistinct("course_id").alias("courses_using_room"),
            F.sum("sessions_held").alias("total_sessions_in_room"),
            F.avg("avg_session_attendance").alias("room_avg_attendance"),
            F.sum("total_student_sessions").alias("total_student_hours"),
            F.countDistinct("session_hour").alias("unique_time_slots_used"),
            F.countDistinct("day_of_week").alias("days_per_week_used"),
            F.round(
                F.avg(
                    F.col("avg_session_attendance")
                    / F.when(F.col("max_session_attendance") != 0,
                             F.col("max_session_attendance"))
                ) * 100,
                2,
            ).alias("avg_capacity_utilization"),
        )
        f = ctx.ref("stg_faculty")
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "budget", "department_size")
        fra = (
            f.join(F.broadcast(d), "department_id")
            .join(cs.select(F.col("faculty_id").alias("cs_fac"), "course_id",
                            "semester_id", "session_date", "attendance_count"),
                  f.faculty_id == F.col("cs_fac"), "left")
            .join(F.broadcast(c.select("course_id",
                                       F.col("credits").alias("c_credits"))),
                  "course_id", "left")
            .groupBy(
                "faculty_id", F.col("full_name").alias("faculty_name"), "position",
                "salary", "years_of_service", "department_name",
                F.col("budget").alias("department_budget"),
            )
            .agg(
                F.countDistinct("course_id").alias("courses_taught"),
                F.countDistinct("semester_id").alias("semesters_active"),
                F.sum("c_credits").alias("total_credit_hours_taught"),
                F.countDistinct("session_date").alias("total_class_sessions"),
                F.avg("attendance_count").alias("avg_class_size"),
                F.sum("attendance_count").alias("total_student_contact_hours"),
                F.round(
                    F.first("salary")
                    / F.when(F.sum("attendance_count") != 0,
                             F.sum("attendance_count")),
                    2,
                ).alias("cost_per_student_contact_hour"),
                F.round(
                    F.first("salary")
                    / F.when(F.sum("c_credits") != 0, F.sum("c_credits")),
                    2,
                ).alias("cost_per_credit_hour_taught"),
            )
        )
        a = ctx.ref("stg_assignments")
        ap = ctx.ref("int_assignment_performance").select(
            F.col("assignment_id").alias("ap_id"), "total_submissions",
            "avg_percentage_score", "grading_completion_rate",
        )
        tau = (
            a.join(F.broadcast(c.select("course_id", "course_code", "course_name",
                                        "department_id")), "course_id")
            .join(F.broadcast(d.select("department_id", "department_name")),
                  "department_id")
            .join(ap, a.assignment_id == F.col("ap_id"), "left")
            .groupBy("course_id", "course_code", "course_name", "department_name")
            .agg(
                F.countDistinct("assignment_id").alias("total_assignments"),
                F.avg("total_submissions").alias("avg_submissions_per_assignment"),
                F.avg("avg_percentage_score").alias("avg_assignment_performance"),
                F.avg("grading_completion_rate").alias(
                    "avg_grading_completion_rate"
                ),
                F.sum("total_submissions").alias("total_submission_volume"),
                F.count(
                    F.when(F.col("assignment_category") == "Assessment", 1)
                ).alias("assessment_assignments"),
                F.count(F.when(F.col("assignment_category") == "Project", 1)).alias(
                    "project_assignments"
                ),
                F.count(F.when(F.col("assignment_category") == "Homework", 1)).alias(
                    "homework_assignments"
                ),
            )
        )
        s = ctx.ref("stg_students").select("student_id", "major_id")
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("student_id").alias("tp_student"),
            F.col("amount").alias("tp_amount"),
        )
        fa_ = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"),
            F.col("amount").alias("fa_amount"),
        )
        fre = (
            d.join(f.select(F.col("department_id").alias("f_dep"),
                            F.col("faculty_id").alias("f_id"),
                            F.col("salary").alias("f_salary")),
                   d.department_id == F.col("f_dep"), "left")
            .join(s, d.department_id == s.major_id, "left")
            .join(c.select(F.col("department_id").alias("c_dep"),
                           F.col("course_id").alias("c_id2")),
                  d.department_id == F.col("c_dep"), "left")
            .join(tp, s.student_id == F.col("tp_student"), "left")
            .join(fa_, s.student_id == F.col("fa_student"), "left")
            .groupBy("department_id", "department_name", "budget",
                     F.col("department_size"))
            .agg(
                F.countDistinct("f_id").alias("faculty_count"),
                F.countDistinct("student_id").alias("student_count"),
                F.countDistinct("c_id2").alias("course_count"),
                F.sum("f_salary").alias("total_faculty_costs"),
                F.sum("tp_amount").alias("department_tuition_revenue"),
                F.sum("fa_amount").alias("department_aid_disbursed"),
                F.round(
                    F.first("budget")
                    / F.when(F.countDistinct("student_id") != 0,
                             F.countDistinct("student_id")),
                    2,
                ).alias("budget_per_student"),
                F.round(
                    F.first("budget")
                    / F.when(F.countDistinct("f_id") != 0,
                             F.countDistinct("f_id")),
                    2,
                ).alias("budget_per_faculty"),
                F.round(
                    F.sum("tp_amount")
                    / F.when(F.first("budget") != 0, F.first("budget")),
                    2,
                ).alias("revenue_to_budget_ratio"),
                F.round(
                    F.sum("f_salary")
                    / F.when(F.first("budget") != 0, F.first("budget")) * 100,
                    2,
                ).alias("faculty_cost_percentage"),
            )
        )
        acu = F.col("avg_capacity_utilization")
        cpsch = F.col("cost_per_student_contact_hour")
        agcr = F.col("avg_grading_completion_rate")
        rbr = F.col("revenue_to_budget_ratio")
        roa = (
            rem.select(
                "room_id", "semester_name", "room_avg_attendance",
                "avg_capacity_utilization", "unique_time_slots_used",
                "days_per_week_used",
                F.when(acu >= 85, "High Utilization")
                .when(acu >= 65, "Good Utilization")
                .when(acu >= 45, "Moderate Utilization")
                .otherwise("Low Utilization")
                .alias("room_utilization_category"),
            )
            .crossJoin(
                fra.select(
                    "faculty_id", "faculty_name", "department_name",
                    "cost_per_student_contact_hour", "cost_per_credit_hour_taught",
                    "total_credit_hours_taught", "total_student_contact_hours",
                    F.when(cpsch <= 50, "Highly Efficient")
                    .when(cpsch <= 100, "Efficient")
                    .when(cpsch <= 200, "Moderately Efficient")
                    .otherwise("Inefficient")
                    .alias("faculty_efficiency_category"),
                )
            )
            .crossJoin(
                tau.select(
                    F.col("course_id").alias("tech_course_id"),
                    "total_submission_volume", "avg_grading_completion_rate",
                    F.when(agcr >= 95, "Excellent Assignment Management")
                    .when(agcr >= 85, "Good Assignment Management")
                    .when(agcr >= 70, "Fair Assignment Management")
                    .otherwise("Poor Assignment Management")
                    .alias("assignment_management_category"),
                )
            )
            .crossJoin(
                fre.select(
                    F.col("department_id").alias("finance_dept_id"),
                    "revenue_to_budget_ratio", "faculty_cost_percentage",
                    "budget_per_student",
                    F.when(rbr >= 1.2, "Highly Profitable")
                    .when(rbr >= 1.0, "Profitable")
                    .when(rbr >= 0.8, "Break Even")
                    .otherwise("Loss Making")
                    .alias("financial_efficiency_category"),
                )
            )
        )
        fec = F.col("faculty_efficiency_category")
        amc = F.col("assignment_management_category")
        fin = F.col("financial_efficiency_category")
        scored = roa.filter(
            F.col("room_id").isNotNull() | F.col("faculty_id").isNotNull()
            | F.col("tech_course_id").isNotNull()
            | F.col("finance_dept_id").isNotNull()
        ).select(
            F.coalesce("room_id", "faculty_id", "tech_course_id",
                       "finance_dept_id").alias("resource_identifier"),
            F.lit("Multi-Resource Analysis").alias("resource_type"),
            F.when(acu >= 85, 25).when(acu >= 65, 20).when(acu >= 45, 15)
            .otherwise(10).alias("room_score"),
            F.when(fec == "Highly Efficient", 25)
            .when(fec == "Efficient", 20)
            .when(fec == "Moderately Efficient", 15)
            .otherwise(10)
            .alias("faculty_score"),
            F.when(amc == "Excellent Assignment Management", 25)
            .when(amc == "Good Assignment Management", 20)
            .when(amc == "Fair Assignment Management", 15)
            .otherwise(10)
            .alias("technology_score"),
            F.when(fin == "Highly Profitable", 25)
            .when(fin == "Profitable", 20)
            .when(fin == "Break Even", 15)
            .otherwise(10)
            .alias("financial_score"),
            F.when(acu < 45, "Optimize room scheduling and capacity")
            .when(fec == "Inefficient", "Review faculty workload and compensation")
            .when(amc == "Poor Assignment Management",
                  "Improve assignment workflow processes")
            .when(fin == "Loss Making", "Critical financial restructuring needed")
            .otherwise("Continue monitoring and minor optimizations")
            .alias("utilization_recommendation"),
        )
        return scored.select(
            "*",
            (
                F.col("room_score") + F.col("faculty_score")
                + F.col("technology_score") + F.col("financial_score")
            ).alias("total_utilization_score"),
        )
