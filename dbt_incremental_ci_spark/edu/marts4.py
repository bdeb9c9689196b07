"""Marts tier, part 4: academic marts (success predictors, retention)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.pg import pg_corr
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts4(reg: ModelRegistry) -> None:
    @reg.model(
        "course_success_predictors",
        deps=["stg_courses", "stg_enrollments", "stg_students", "stg_departments",
              "stg_semesters", "int_assignment_performance"],
        materialized="table",
    )
    def course_success_predictors(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/course_success_predictors.sql:1-131 —
        # A9 four-way correlations (:62-65), A6 per-season null-skipping
        # averages (:70-72), HAVING ≥5 (:77).
        c = ctx.ref("stg_courses").select(
            "course_id", "course_code", "course_name", "difficulty_level",
            "credits", "prerequisite_course_id", "department_id",
        )
        e = ctx.ref("stg_enrollments").filter(
            F.col("enrollment_status") == "Completed"
        ).select(
            F.col("course_id").alias("e_course"), "student_id", "grade",
            "grade_points", "attendance_percentage", "grade_category",
            "semester_id",
        )
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"),
            F.col("gpa").alias("student_cumulative_gpa"), "academic_standing",
            "age", "years_enrolled",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        sem = ctx.ref("stg_semesters").select(
            F.col("semester_id").alias("sm_id"), "semester_name", "semester_type"
        )
        ap = (
            ctx.ref("int_assignment_performance")
            .groupBy(F.col("course_id").alias("ap_course"))
            .agg(
                F.avg("total_submissions").alias("total_submissions"),
                F.avg("avg_percentage_score").alias("avg_assignment_score"),
                F.avg("late_submission_rate").alias("late_submission_rate"),
            )
        )
        base = (
            c.join(e, c.course_id == e.e_course)
            .join(s, e.student_id == s.s_id)
            .join(F.broadcast(d), "department_id")
            .join(F.broadcast(sem), e.semester_id == F.col("sm_id"))
            .join(ap, c.course_id == F.col("ap_course"), "left")
            .withColumn(
                "successful_completion",
                F.when(F.col("grade_points") >= 3.0, 1).otherwise(0),
            )
            .withColumn(
                "good_attendance",
                F.when(F.col("attendance_percentage") >= 80, 1).otherwise(0),
            )
            .withColumn(
                "strong_academic_record",
                F.when(F.col("student_cumulative_gpa") >= 3.0, 1).otherwise(0),
            )
        )
        st = F.col("semester_type")
        sf = (
            base.groupBy("course_id", "course_code", "course_name",
                         "difficulty_level", "credits", "department_name")
            .agg(
                F.count(F.lit(1)).alias("total_completions"),
                F.sum("successful_completion").alias("successful_completions"),
                F.round(F.avg("successful_completion") * 100, 2).alias(
                    "success_rate"
                ),
                F.avg("grade_points").alias("avg_course_grade_points"),
                F.avg("attendance_percentage").alias("avg_course_attendance"),
                F.avg("student_cumulative_gpa").alias("avg_student_entering_gpa"),
                F.avg("avg_assignment_score").alias("avg_assignment_performance"),
                pg_corr("student_cumulative_gpa", "grade_points").alias(
                    "gpa_correlation"
                ),
                pg_corr("attendance_percentage", "grade_points").alias(
                    "attendance_correlation"
                ),
                pg_corr("avg_assignment_score", "grade_points").alias(
                    "assignment_correlation"
                ),
                pg_corr("age", "grade_points").alias("age_correlation"),
                F.count(
                    F.when(
                        (F.col("strong_academic_record") == 1)
                        & (F.col("successful_completion") == 1),
                        1,
                    )
                ).alias("strong_students_successful"),
                F.count(F.when(F.col("strong_academic_record") == 1, 1)).alias(
                    "strong_students_total"
                ),
                F.count(
                    F.when(
                        (F.col("good_attendance") == 1)
                        & (F.col("successful_completion") == 1),
                        1,
                    )
                ).alias("good_attendance_successful"),
                F.count(F.when(F.col("good_attendance") == 1, 1)).alias(
                    "good_attendance_total"
                ),
                F.avg(F.when(st == "Fall", F.col("grade_points"))).alias(
                    "fall_avg_performance"
                ),
                F.avg(F.when(st == "Spring", F.col("grade_points"))).alias(
                    "spring_avg_performance"
                ),
                F.avg(F.when(st == "Summer", F.col("grade_points"))).alias(
                    "summer_avg_performance"
                ),
            )
            .filter(F.col("total_completions") >= 5)
        )
        sr = F.col("success_rate")
        gpa_c, att_c = F.abs(F.col("gpa_correlation")), F.abs(F.col("attendance_correlation"))
        asg_c = F.abs(F.col("assignment_correlation"))
        fall, spring, summer = (F.col("fall_avg_performance"),
                                F.col("spring_avg_performance"),
                                F.col("summer_avg_performance"))
        dl = F.col("difficulty_level")
        return sf.select(
            "*",
            F.round(
                F.col("strong_students_successful") * 100.0
                / F.when(F.col("strong_students_total") != 0,
                         F.col("strong_students_total")),
                2,
            ).alias("strong_student_success_rate"),
            F.round(
                F.col("good_attendance_successful") * 100.0
                / F.when(F.col("good_attendance_total") != 0,
                         F.col("good_attendance_total")),
                2,
            ).alias("good_attendance_success_rate"),
            F.when(sr >= 90, "Very High Success")
            .when(sr >= 75, "High Success")
            .when(sr >= 60, "Moderate Success")
            .when(sr >= 45, "Low Success")
            .otherwise("Very Low Success")
            .alias("success_category"),
            F.when(gpa_c >= 0.7, "Strong GPA Predictor")
            .when(gpa_c >= 0.4, "Moderate GPA Predictor")
            .when(gpa_c >= 0.2, "Weak GPA Predictor")
            .otherwise("GPA Not Predictive")
            .alias("gpa_predictive_strength"),
            F.when(att_c >= 0.7, "Strong Attendance Predictor")
            .when(att_c >= 0.4, "Moderate Attendance Predictor")
            .when(att_c >= 0.2, "Weak Attendance Predictor")
            .otherwise("Attendance Not Predictive")
            .alias("attendance_predictive_strength"),
            F.when(asg_c >= 0.7, "Strong Assignment Predictor")
            .when(asg_c >= 0.4, "Moderate Assignment Predictor")
            .when(asg_c >= 0.2, "Weak Assignment Predictor")
            .otherwise("Assignments Not Predictive")
            .alias("assignment_predictive_strength"),
            F.when((fall > spring) & (fall > summer), "Fall Best Performance")
            .when(spring > summer, "Spring Best Performance")
            .when(summer.isNotNull(), "Summer Best Performance")
            .otherwise("No Clear Seasonal Pattern")
            .alias("seasonal_performance_pattern"),
            F.when((dl <= 2) & (sr >= 85), "Appropriately Difficult")
            .when((dl >= 4) & (sr <= 60), "Appropriately Challenging")
            .when((dl <= 2) & (sr <= 60), "Unexpectedly Difficult")
            .when((dl >= 4) & (sr >= 85), "Easier Than Expected")
            .otherwise("Standard Difficulty-Success Alignment")
            .alias("difficulty_alignment"),
        ).orderBy(F.desc("success_rate"), "course_id")

    @reg.model(
        "student_retention_analysis",
        deps=["stg_students", "stg_departments", "int_student_enrollment_history"],
        materialized="table",
    )
    def student_retention_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/student_retention_analysis.sql:1-134 —
        # retention buckets, year-span via extract(year) difference (frozen
        # clock for the not-graduated branch), departmental rollup join.
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "email", "enrollment_date",
            "graduation_date", "student_status", "gpa", "academic_standing",
            "years_enrolled", "age", "major_id",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code")
        eh = (
            ctx.ref("int_student_enrollment_history")
            .groupBy(F.col("student_id").alias("eh_student"))
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
        ss = F.col("student_status")
        base = (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(eh, s.student_id == F.col("eh_student"), "left")
            .drop("eh_student")
            .withColumn(
                "retention_status",
                F.when(F.col("graduation_date").isNotNull(), "Graduated")
                .when(ss == "dropped", "Dropped Out")
                .when(ss == "suspended", "Suspended")
                .when(ss == "active", "Currently Enrolled")
                .otherwise("Other Status"),
            )
            .withColumn(
                "years_in_program",
                F.when(
                    F.col("graduation_date").isNotNull(),
                    F.year("graduation_date") - F.year("enrollment_date"),
                ).otherwise(
                    F.year(F.lit(ctx.run_date)) - F.year("enrollment_date")
                ),
            )
            .withColumn(
                "completion_rate",
                F.round(
                    F.col("total_credits_earned").cast("decimal(18,2)")
                    / F.when(F.col("total_credits_attempted") != 0,
                             F.col("total_credits_attempted")) * 100,
                    2,
                ),
            )
        )
        gpa, att, fcc = F.col("gpa"), F.col("avg_attendance"), F.col("failed_courses_count")
        rs, yip = F.col("retention_status"), F.col("years_in_program")
        cr, wc = F.col("completion_rate"), F.col("withdrawn_courses_count")
        ra = base.select(
            "*",
            F.when(rs == "Graduated", 0)
            .when((gpa >= 3.5) & (att >= 90) & (fcc == 0), 1)
            .when((gpa >= 3.0) & (att >= 80) & (fcc <= 1), 2)
            .when((gpa >= 2.5) & (att >= 70) & (fcc <= 2), 3)
            .when((gpa >= 2.0) & (att >= 60) & (fcc <= 3), 4)
            .otherwise(5)
            .alias("retention_risk_score"),
            F.when(rs == "Graduated", "Successful Completion")
            .when((gpa >= 3.5) & (att >= 90) & (fcc == 0), "Excellent - No Risk")
            .when((gpa >= 3.0) & (att >= 80) & (fcc <= 1), "Good - Low Risk")
            .when((gpa >= 2.5) & (att >= 70) & (fcc <= 2), "Fair - Moderate Risk")
            .when((gpa >= 2.0) & (att >= 60) & (fcc <= 3), "Poor - High Risk")
            .otherwise("Critical - Very High Risk")
            .alias("risk_category"),
            F.when(
                (yip <= 4) & rs.isin("Currently Enrolled", "Graduated"), "On Track"
            )
            .when(
                yip.between(5, 6) & rs.isin("Currently Enrolled", "Graduated"),
                "Extended Timeline",
            )
            .when((yip > 6) & (rs == "Currently Enrolled"),
                  "Significantly Delayed")
            .when(rs.isin("Dropped Out", "Suspended"), "Did Not Complete")
            .otherwise("Unknown")
            .alias("completion_timeline_status"),
            F.when(cr >= 95, "Excellent Progress")
            .when(cr >= 85, "Good Progress")
            .when(cr >= 75, "Fair Progress")
            .when(cr >= 60, "Slow Progress")
            .otherwise("Very Slow Progress")
            .alias("progress_category"),
            F.when(wc == 0, "No Withdrawals")
            .when(wc == 1, "Minimal Withdrawals")
            .when(wc <= 3, "Some Withdrawals")
            .otherwise("Many Withdrawals")
            .alias("withdrawal_pattern"),
        )
        rc = F.col("risk_category")
        dr = ra.groupBy("department_name").agg(
            F.count(F.lit(1)).alias("total_students"),
            F.count(F.when(rs == "Graduated", 1)).alias("graduated_students"),
            F.count(F.when(rs == "Currently Enrolled", 1)).alias(
                "currently_enrolled"
            ),
            F.count(F.when(rs == "Dropped Out", 1)).alias("dropped_students"),
            F.count(F.when(rs == "Suspended", 1)).alias("suspended_students"),
            F.avg(F.when(rs == "Graduated", yip)).alias("avg_graduation_time"),
            F.avg("gpa").alias("dept_avg_gpa"),
            F.avg("completion_rate").alias("dept_avg_completion_rate"),
            F.round(
                F.count(F.when(rs == "Graduated", 1)) * 100.0
                / F.when(
                    F.count(
                        F.when(rs.isin("Graduated", "Dropped Out", "Suspended"), 1)
                    ) != 0,
                    F.count(
                        F.when(rs.isin("Graduated", "Dropped Out", "Suspended"), 1)
                    ),
                ),
                2,
            ).alias("graduation_rate"),
            F.round(
                F.count(F.when(rs == "Dropped Out", 1)) * 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("dropout_rate"),
            F.round(
                F.count(
                    F.when(rc.like("%High Risk%") | rc.like("%Critical%"), 1)
                ) * 100.0
                / F.when(
                    F.count(F.when(rs == "Currently Enrolled", 1)) != 0,
                    F.count(F.when(rs == "Currently Enrolled", 1)),
                ),
                2,
            ).alias("at_risk_percentage"),
        )
        dr_j = dr.select(
            "department_name",
            F.col("graduated_students").alias("dept_graduated_students"),
            F.col("currently_enrolled").alias("dept_currently_enrolled"),
            F.col("graduation_rate").alias("dept_graduation_rate"),
            F.col("dropout_rate").alias("dept_dropout_rate"),
            F.col("at_risk_percentage").alias("dept_at_risk_percentage"),
            F.col("avg_graduation_time").alias("dept_avg_graduation_time"),
            "dept_avg_gpa", "dept_avg_completion_rate",
        )
        return ra.join(F.broadcast(dr_j), "department_name", "left")


def register_marts5(reg: ModelRegistry) -> None:
    @reg.model(
        "assignment_workload_analysis",
        deps=["stg_semesters", "stg_assignments", "stg_courses", "stg_departments",
              "int_assignment_performance"],
        materialized="table",
    )
    def assignment_workload_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/assignment_workload_analysis.sql:1-148
        # — ISO week buckets (extract(week)), PG dow weekend flag, J6
        # `on 1=1` course-stats cross join (:137) preserved.
        from dbt_incremental_ci_spark.functions.pg import pg_dow

        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year", "semester_type")
        a = ctx.ref("stg_assignments")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "credits", "difficulty_level",
                                          "department_id")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        ap = ctx.ref("int_assignment_performance").select(
            F.col("assignment_id").alias("ap_id"), "total_submissions",
            "avg_percentage_score", "late_submission_rate", "avg_score",
        )
        aw = (
            sem.join(a, "semester_id")
            .join(F.broadcast(c), "course_id")
            .join(F.broadcast(d), "department_id")
            .join(ap, a.assignment_id == F.col("ap_id"), "left")
            .withColumn("due_week", F.weekofyear("due_date"))
            .withColumn("due_month", F.month("due_date"))
            .withColumn(
                "due_day_type",
                F.when(pg_dow("due_date").isin(0, 6), "Weekend").otherwise(
                    "Weekday"
                ),
            )
        )
        ac = F.col("assignment_category")
        swa = aw.groupBy("semester_id", "semester_name", "academic_year",
                         "semester_type").agg(
            F.countDistinct("assignment_id").alias("total_assignments"),
            F.countDistinct("course_id").alias("courses_with_assignments"),
            F.sum("max_points").alias("total_possible_points"),
            F.avg("max_points").alias("avg_assignment_points"),
            F.sum("weight_percentage").alias("total_weight_percentage"),
            F.avg("weight_percentage").alias("avg_assignment_weight"),
            F.count(F.when(ac == "Assessment", 1)).alias("exam_count"),
            F.count(F.when(ac == "Project", 1)).alias("project_count"),
            F.count(F.when(ac == "Homework", 1)).alias("homework_count"),
            F.count(F.when(ac == "Quiz", 1)).alias("quiz_count"),
            F.count(F.when(F.col("due_day_type") == "Weekend", 1)).alias(
                "weekend_due_assignments"
            ),
            F.avg("avg_percentage_score").alias("semester_avg_score"),
            F.avg("late_submission_rate").alias("semester_late_rate"),
        )
        cwa = aw.groupBy("course_id", "course_code", "course_name", "credits",
                         "difficulty_level", "department_name").agg(
            F.countDistinct("assignment_id").alias("assignments_per_course"),
            F.sum("max_points").alias("total_points_possible"),
            F.avg("max_points").alias("avg_points_per_assignment"),
            F.sum("weight_percentage").alias("total_course_weight"),
            F.round(
                F.countDistinct("assignment_id").cast("decimal(18,2)")
                / F.col("credits"),
                2,
            ).alias("assignments_per_credit"),
            F.round(
                F.sum("max_points").cast("decimal(18,2)") / F.col("credits"), 2
            ).alias("points_per_credit"),
            F.count(F.when(ac == "Assessment", 1)).alias("course_exams"),
            F.count(F.when(ac == "Project", 1)).alias("course_projects"),
            F.count(F.when(ac == "Homework", 1)).alias("course_homework"),
            F.avg("avg_percentage_score").alias("course_avg_performance"),
            F.avg("late_submission_rate").alias("course_late_rate"),
        )
        www = (
            aw.filter(F.col("due_week").isNotNull())
            .groupBy("semester_id", "semester_name", "due_week")
            .agg(
                F.countDistinct("assignment_id").alias(
                    "assignments_due_this_week"
                ),
                F.sum("max_points").alias("total_points_due_this_week"),
                F.countDistinct("course_id").alias(
                    "courses_with_assignments_due"
                ),
                F.avg("weight_percentage").alias("avg_weight_this_week"),
            )
            .groupBy("semester_id")
            .agg(
                F.max("assignments_due_this_week").alias("max_weekly_assignments"),
                F.max("total_points_due_this_week").alias("max_weekly_points"),
                F.avg("assignments_due_this_week").alias("avg_weekly_assignments"),
            )
        )
        cwa_1 = cwa.groupBy("course_id").agg(
            F.avg("assignments_per_course").alias("assignments_per_course"),
            F.avg("assignments_per_credit").alias("assignments_per_credit"),
            F.avg("points_per_credit").alias("points_per_credit"),
        )
        ta = F.col("total_assignments")
        mwa = F.col("max_weekly_assignments")
        slr = F.col("semester_late_rate")
        return (
            swa.crossJoin(  # sql:137 `on 1=1` cross join preserved
                F.broadcast(cwa_1.drop("course_id"))
            )
            .join(F.broadcast(www), "semester_id", "left")
            .select(
                "*",
                F.when(ta >= 100, "Very High Workload")
                .when(ta >= 75, "High Workload")
                .when(ta >= 50, "Moderate Workload")
                .when(ta >= 25, "Light Workload")
                .otherwise("Very Light Workload")
                .alias("semester_workload_category"),
                F.when(mwa >= 15, "Overwhelming Weeks")
                .when(mwa >= 10, "Heavy Weeks")
                .when(mwa >= 7, "Busy Weeks")
                .otherwise("Manageable Weeks")
                .alias("peak_week_intensity"),
                F.round(ta.cast("decimal(18,2)") / 16, 2).alias(
                    "avg_assignments_per_week"
                ),
                F.when(slr >= 25, "High Stress Semester")
                .when(slr >= 15, "Moderate Stress Semester")
                .when(slr >= 10, "Low Stress Semester")
                .otherwise("Well-Managed Semester")
                .alias("stress_indicator"),
            )
        )
