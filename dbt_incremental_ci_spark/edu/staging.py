"""Staging tier: 12 view models (pure projections + computed buckets).

Each function mirrors the semantics of the same-named reference model
(DEDP/models/staging/*.sql) — cited per model — re-expressed as Column
expressions. ``current_date`` is replaced by the engine's frozen
``ctx.run_date`` (SURVEY §4 deterministic time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.pg import age_years, ilike, pg_dow
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_staging(reg: ModelRegistry) -> None:
    @reg.model("stg_students", deps=["students"])
    def stg_students(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_students.sql:4-31
        s = ctx.source("students")
        rd = F.lit(ctx.run_date)
        gpa = F.col("gpa")
        return s.select(
            "student_id",
            "first_name",
            "last_name",
            # `||` null semantics: any NULL name -> NULL full_name (the
            # reference's first_name || ' ' || last_name; concat_ws would
            # silently skip NULLs). ref stg_students.sql:8 / stg_faculty.sql:8
            F.concat("first_name", F.lit(" "), "last_name").alias("full_name"),
            "email",
            "date_of_birth",
            "enrollment_date",
            "graduation_date",
            "student_status",
            "gpa",
            "major_id",
            "advisor_id",
            "address_id",
            age_years(rd, "date_of_birth").alias("age"),
            age_years(rd, "enrollment_date").alias("years_enrolled"),
            F.when(gpa >= 3.5, "Deans List")
            .when(gpa >= 3.0, "Good Standing")
            .when(gpa >= 2.0, "Academic Warning")
            .otherwise("Academic Probation")
            .alias("academic_standing"),
            F.when(F.col("graduation_date").isNotNull(), "Graduated")
            .when((F.col("student_status") == "active") & (gpa >= 2.0), "Active")
            .when((F.col("student_status") == "active") & (gpa < 2.0), "At Risk")
            .otherwise(F.initcap("student_status"))
            .alias("current_status"),
            "created_at",
        )

    @reg.model("stg_courses", deps=["courses"])
    def stg_courses(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_courses.sql:4-33
        dl, cr = F.col("difficulty_level"), F.col("credits")
        return ctx.source("courses").select(
            "course_id",
            "course_code",
            "course_name",
            "description",
            "credits",
            "department_id",
            "prerequisite_course_id",
            "difficulty_level",
            F.when(dl == 1, "Beginner")
            .when(dl == 2, "Intermediate")
            .when(dl == 3, "Advanced")
            .when(dl == 4, "Expert")
            .when(dl == 5, "Graduate")
            .otherwise("Unknown")
            .alias("difficulty_description"),
            F.when(cr <= 1, "Workshop")
            .when(cr == 2, "Seminar")
            .when(cr == 3, "Standard")
            .when(cr >= 4, "Intensive")
            .otherwise("Other")
            .alias("credit_category"),
            "created_at",
        )

    @reg.model("stg_departments", deps=["departments"])
    def stg_departments(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_departments.sql:4-20
        b = F.col("budget")
        return ctx.source("departments").select(
            "department_id",
            "department_name",
            "department_code",
            "head_faculty_id",
            "budget",
            "building_location",
            F.when(b >= 3_000_000, "Large")
            .when(b >= 2_000_000, "Medium")
            .when(b >= 1_000_000, "Small")
            .otherwise("Micro")
            .alias("department_size"),
            F.round(b / 1_000_000.0, 2).alias("budget_millions"),
            "created_at",
        )

    @reg.model("stg_faculty", deps=["faculty"])
    def stg_faculty(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_faculty.sql:4-31
        p, sal = F.col("position"), F.col("salary")
        return ctx.source("faculty").select(
            "faculty_id",
            "first_name",
            "last_name",
            # `||` null semantics: any NULL name -> NULL full_name (the
            # reference's first_name || ' ' || last_name; concat_ws would
            # silently skip NULLs). ref stg_students.sql:8 / stg_faculty.sql:8
            F.concat("first_name", F.lit(" "), "last_name").alias("full_name"),
            "email",
            "department_id",
            "position",
            "salary",
            "hire_date",
            "office_number",
            "research_interests",
            age_years(F.lit(ctx.run_date), "hire_date").alias("years_of_service"),
            F.when(p == "Professor", 4)
            .when(p == "Associate Professor", 3)
            .when(p == "Assistant Professor", 2)
            .when(p == "Lecturer", 1)
            .otherwise(0)
            .alias("rank_level"),
            F.when(sal >= 100_000, "Senior")
            .when(sal >= 80_000, "Mid-level")
            .when(sal >= 60_000, "Junior")
            .otherwise("Entry")
            .alias("salary_band"),
            "created_at",
        )

    @reg.model("stg_enrollments", deps=["enrollments"])
    def stg_enrollments(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_enrollments.sql:4-40
        g, att = F.col("grade"), F.col("attendance_percentage")
        return ctx.source("enrollments").select(
            "enrollment_id",
            "student_id",
            "course_id",
            "semester_id",
            "enrollment_date",
            "completion_date",
            "grade",
            "grade_points",
            "attendance_percentage",
            F.when(g.isin("A+", "A", "A-"), "Excellent")
            .when(g.isin("B+", "B", "B-"), "Good")
            .when(g.isin("C+", "C", "C-"), "Satisfactory")
            .when(g.isin("D+", "D", "D-"), "Poor")
            .when(g.isin("F", "WF"), "Failing")
            .when(g == "W", "Withdrawn")
            .when(g == "I", "Incomplete")
            .otherwise("Unknown")
            .alias("grade_category"),
            F.when(F.col("completion_date").isNotNull(), "Completed")
            .when(g == "W", "Withdrawn")
            .when(g == "I", "Incomplete")
            .otherwise("In Progress")
            .alias("enrollment_status"),
            F.when(att >= 95, "Excellent")
            .when(att >= 85, "Good")
            .when(att >= 75, "Acceptable")
            .when(att >= 65, "Poor")
            .otherwise("Critical")
            .alias("attendance_level"),
            "created_at",
        )

    @reg.model("stg_semesters", deps=["semesters"])
    def stg_semesters(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_semesters.sql:4-30
        sm = F.month("start_date")
        rd = F.lit(ctx.run_date)
        return ctx.source("semesters").select(
            "semester_id",
            "semester_name",
            "academic_year",
            "start_date",
            "end_date",
            "is_current",
            F.year("start_date").alias("start_year"),
            sm.alias("start_month"),
            F.when(sm.between(8, 12), "Fall")
            .when(sm.between(1, 5), "Spring")
            .when(sm.between(6, 7), "Summer")
            .otherwise("Special")
            .alias("semester_type"),
            F.datediff("end_date", "start_date").alias("semester_duration_days"),
            F.when(rd.between(F.col("start_date"), F.col("end_date")), "Active")
            .when(rd < F.col("start_date"), "Upcoming")
            .when(rd > F.col("end_date"), "Completed")
            .otherwise("Unknown")
            .alias("semester_status"),
            "created_at",
        )

    @reg.model("stg_class_sessions", deps=["class_sessions"])
    def stg_class_sessions(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_class_sessions.sql:4-38
        # session_time is "HH:mm:ss" (no Spark TIME type, SURVEY §1.2)
        hour = F.substring("session_time", 1, 2).cast("int")
        dow = pg_dow("session_date")
        return ctx.source("class_sessions").select(
            "session_id",
            "course_id",
            "faculty_id",
            "semester_id",
            "session_time",
            "session_date",
            "room_id",
            "attendance_count",
            dow.alias("day_of_week"),
            hour.alias("session_hour"),
            F.when(hour.between(8, 11), "Morning")
            .when(hour.between(12, 16), "Afternoon")
            .when(hour.between(17, 21), "Evening")
            .otherwise("Night")
            .alias("time_block"),
            F.when(dow == 0, "Sunday")
            .when(dow == 1, "Monday")
            .when(dow == 2, "Tuesday")
            .when(dow == 3, "Wednesday")
            .when(dow == 4, "Thursday")
            .when(dow == 5, "Friday")
            .when(dow == 6, "Saturday")
            .alias("day_name"),
            "created_at",
        )

    @reg.model("stg_assignments", deps=["assignments"])
    def stg_assignments(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_assignments.sql:4-44
        at = F.col("assignment_type")
        rd = F.lit(ctx.run_date)
        days_until = F.datediff("due_date", rd)
        wp = F.col("weight_percentage")
        return ctx.source("assignments").select(
            "assignment_id",
            "course_id",
            "semester_id",
            "assignment_name",
            "assignment_type",
            "due_date",
            "max_points",
            "weight_percentage",
            F.when(ilike(at, "%exam%") | ilike(at, "%test%"), "Assessment")
            .when(ilike(at, "%project%"), "Project")
            .when(ilike(at, "%homework%") | ilike(at, "%hw%"), "Homework")
            .when(ilike(at, "%quiz%"), "Quiz")
            .when(ilike(at, "%discussion%"), "Discussion")
            .when(ilike(at, "%presentation%"), "Presentation")
            .otherwise("Other")
            .alias("assignment_category"),
            F.when(rd > F.col("due_date"), "Past Due")
            .when(rd == F.col("due_date"), "Due Today")
            .when(days_until <= 7, "Due This Week")
            .when(days_until <= 30, "Due This Month")
            .otherwise("Future")
            .alias("due_status"),
            days_until.alias("days_until_due"),
            F.when(wp >= 30, "High Weight")
            .when(wp >= 15, "Medium Weight")
            .when(wp >= 5, "Low Weight")
            .otherwise("Minimal Weight")
            .alias("weight_category"),
            "created_at",
        )

    @reg.model("stg_assignment_submissions", deps=["assignment_submissions"])
    def stg_assignment_submissions(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_assignment_submissions.sql:4-33
        sc = F.col("score")
        return ctx.source("assignment_submissions").select(
            "submission_id",
            "assignment_id",
            "student_id",
            "submission_date",
            "score",
            "late_submission",
            "feedback",
            F.when(sc.isNull(), "Not Graded")
            .when(sc == 0, "Zero Score")
            .when(sc > 0, "Graded")
            .otherwise("Unknown")
            .alias("grading_status"),
            F.when(F.col("late_submission"), "Late")
            .otherwise("On Time")
            .alias("submission_timeliness"),
            F.when(
                F.col("feedback").isNotNull() & (F.trim("feedback") != ""),
                "Has Feedback",
            )
            .otherwise("No Feedback")
            .alias("feedback_status"),
            "created_at",
        )

    @reg.model("stg_financial_aid", deps=["financial_aid"])
    def stg_financial_aid(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_financial_aid.sql:4-37
        atype, amt = F.col("aid_type"), F.col("amount")
        dm = F.month("disbursement_date")
        return ctx.source("financial_aid").select(
            "aid_id",
            "student_id",
            "aid_type",
            "amount",
            "academic_year",
            "disbursement_date",
            F.when(ilike(atype, "%scholarship%"), "Merit-Based")
            .when(ilike(atype, "%grant%"), "Need-Based")
            .when(ilike(atype, "%loan%"), "Loan")
            .when(ilike(atype, "%work%"), "Work-Study")
            .otherwise("Other")
            .alias("aid_category"),
            F.when(amt >= 10_000, "High Support")
            .when(amt >= 5_000, "Medium Support")
            .when(amt >= 1_000, "Low Support")
            .otherwise("Minimal Support")
            .alias("support_level"),
            F.year("disbursement_date").alias("disbursement_year"),
            dm.alias("disbursement_month"),
            F.when(dm.between(8, 12), "Fall Disbursement")
            .when(dm.between(1, 5), "Spring Disbursement")
            .otherwise("Summer Disbursement")
            .alias("disbursement_period"),
            "created_at",
        )

    @reg.model("stg_tuition_payments", deps=["tuition_payments"])
    def stg_tuition_payments(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_tuition_payments.sql:4-40
        pm, amt = F.col("payment_method"), F.col("amount")
        return ctx.source("tuition_payments").select(
            "payment_id",
            "student_id",
            "semester_id",
            "amount",
            "payment_date",
            "payment_method",
            "late_fee",
            (amt + F.coalesce("late_fee", F.lit(0))).alias("total_payment"),
            F.when(F.col("late_fee") > 0, "Late Payment")
            .otherwise("On Time Payment")
            .alias("payment_timeliness"),
            F.when(ilike(pm, "%credit%") | ilike(pm, "%card%"), "Credit Card")
            .when(ilike(pm, "%check%"), "Check")
            .when(ilike(pm, "%transfer%") | ilike(pm, "%ach%"), "Bank Transfer")
            .when(ilike(pm, "%cash%"), "Cash")
            .otherwise("Other")
            .alias("payment_method_category"),
            F.year("payment_date").alias("payment_year"),
            F.month("payment_date").alias("payment_month"),
            F.when(amt >= 10_000, "High Amount")
            .when(amt >= 5_000, "Medium Amount")
            .when(amt >= 1_000, "Low Amount")
            .otherwise("Minimal Amount")
            .alias("payment_size_category"),
            "created_at",
        )

    @reg.model(
        "stg_enrollments_incremental",
        deps=["enrollments"],
        materialized="incremental",
        unique_key="enrollment_id",
        watermark_col="enrollment_date",
        watermark_strict=False,
    )
    def stg_enrollments_incremental(ctx) -> DataFrame:
        # ref: DEDP/models/staging/stg_enrollments_incremental.sql:1-24.
        # The original selects final_grade/credits_earned, columns that do
        # not exist in the declared sources (bit-rot, SURVEY §7.5) — built
        # here against the real columns (grade, grade_points). The >=
        # watermark (sql:20, watermark_strict=False above) re-reads
        # boundary rows; the unique-key upsert absorbs them.
        return ctx.source("enrollments").select(
            "enrollment_id",
            "student_id",
            "course_id",
            "semester_id",
            "enrollment_date",
            "grade",
            "grade_points",
            F.lit(ctx.run_date).cast("timestamp").alias("loaded_at"),
        )
