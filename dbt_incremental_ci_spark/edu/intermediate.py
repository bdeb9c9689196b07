"""Intermediate tier: joined/aggregated view models.

Ports of DEDP/models/intermediate/*.sql (cited per model). Determinism
deviation (documented per SURVEY §7.4): windows ordered by non-unique
keys in the reference (e.g. ``order by semester_name``) get an
``enrollment_id``/``course_id`` tiebreaker so results are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.agg import string_agg_ordered
from dbt_incremental_ci_spark.plans.recursion import recursive_loop
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_intermediate(reg: ModelRegistry) -> None:
    @reg.model(
        "int_student_enrollment_history",
        deps=["stg_students", "stg_enrollments", "stg_courses", "stg_semesters",
              "stg_departments"],
    )
    def int_student_enrollment_history(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_student_enrollment_history.sql:1-52
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "email", "student_status", "gpa",
            "academic_standing",
        )
        e = ctx.ref("stg_enrollments").select(
            "enrollment_id", "student_id", "course_id", "semester_id", "grade",
            "grade_points", "attendance_percentage", "grade_category",
            "enrollment_status",
        )
        c = ctx.ref("stg_courses").select(
            "course_id", "course_code", "course_name", "credits",
            "difficulty_level", "department_id",
        )
        sem = ctx.ref("stg_semesters").select(
            "semester_id", "semester_name", "academic_year", "semester_type"
        )
        d = ctx.ref("stg_departments").select(
            "department_id", "department_name", "department_code"
        )
        joined = (
            s.join(e, "student_id", "left")
            .join(F.broadcast(c), "course_id", "left")
            .join(F.broadcast(sem), "semester_id", "left")
            .join(F.broadcast(d), "department_id", "left")
            .drop("department_id")
        )
        w = Window.partitionBy("student_id")
        w_seq = w.orderBy("semester_name", "enrollment_id")  # tiebreak added
        good = F.col("grade_category").isin("Excellent", "Good", "Satisfactory")
        return joined.select(
            "*",
            F.row_number().over(w_seq).alias("enrollment_sequence"),
            F.count(F.lit(1)).over(w).alias("total_enrollments"),
            F.avg("grade_points").over(w).alias("avg_grade_points"),
            F.avg("attendance_percentage").over(w).alias("avg_attendance"),
            F.sum("credits").over(w).alias("total_credits_attempted"),
            F.sum(F.when(good, F.col("credits")).otherwise(0)).over(w).alias(
                "total_credits_earned"
            ),
            F.count(F.when(F.col("grade_category") == "Failing", 1)).over(w).alias(
                "failed_courses_count"
            ),
            F.count(F.when(F.col("enrollment_status") == "Withdrawn", 1)).over(w).alias(
                "withdrawn_courses_count"
            ),
        )

    @reg.model(
        "int_course_performance_metrics",
        deps=["stg_courses", "stg_enrollments", "stg_departments", "stg_semesters",
              "stg_class_sessions", "stg_faculty"],
    )
    def int_course_performance_metrics(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_course_performance_metrics.sql:1-85.
        # NOTE the reference's session/faculty joins multiply enrollment rows
        # per session before re-collapsing with count(distinct …) — semantics
        # preserved (aggregates over the multiplied relation).
        c = ctx.ref("stg_courses")
        e = ctx.ref("stg_enrollments")
        d = ctx.ref("stg_departments").select(
            "department_id", "department_name", "department_code"
        )
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        cs = ctx.ref("stg_class_sessions").select("course_id", "semester_id",
                                                  "faculty_id")
        f = ctx.ref("stg_faculty").select("faculty_id", "full_name", "position")
        joined = (
            c.join(e.withColumnRenamed("course_id", "course_id_e"),
                   c.course_id == F.col("course_id_e"), "left")
            .join(F.broadcast(d), "department_id", "left")
            .join(F.broadcast(sem), "semester_id", "left")
            .join(
                F.broadcast(cs.withColumnRenamed("course_id", "cs_course")
                            .withColumnRenamed("semester_id", "cs_sem")),
                (c.course_id == F.col("cs_course"))
                & (F.col("semester_id") == F.col("cs_sem")),
                "left",
            )
            .join(F.broadcast(f), "faculty_id", "left")
        )
        gc = F.col("grade_category")
        n_pass = F.count(F.when(gc.isin("Excellent", "Good", "Satisfactory"), 1))
        n_graded = F.count(F.when(gc != "Unknown", 1))
        n_withdrawn = F.count(F.when(F.col("enrollment_status") == "Withdrawn", 1))
        return (
            joined.filter(F.col("course_id").isNotNull())
            .groupBy(
                "course_id", "course_code", "course_name", "credits",
                "difficulty_level", "difficulty_description", "department_name",
                "department_code",
            )
            .agg(
                F.countDistinct("enrollment_id").alias("total_enrollments"),
                F.countDistinct("student_id").alias("unique_students"),
                F.countDistinct("semester_id").alias("semesters_offered"),
                F.avg("grade_points").alias("avg_grade_points"),
                F.avg("attendance_percentage").alias("avg_attendance"),
                F.count(F.when(gc == "Excellent", 1)).alias("excellent_grades"),
                F.count(F.when(gc == "Good", 1)).alias("good_grades"),
                F.count(F.when(gc == "Satisfactory", 1)).alias("satisfactory_grades"),
                F.count(F.when(gc == "Poor", 1)).alias("poor_grades"),
                F.count(F.when(gc == "Failing", 1)).alias("failing_grades"),
                n_withdrawn.alias("withdrawals"),
                F.round(
                    n_pass * 100.0 / F.when(n_graded != 0, n_graded), 2
                ).alias("pass_rate"),
                F.round(
                    n_withdrawn * 100.0
                    / F.when(F.count("enrollment_id") != 0, F.count("enrollment_id")),
                    2,
                ).alias("withdrawal_rate"),
            )
        )

    @reg.model(
        "int_department_analytics",
        deps=["stg_departments", "stg_faculty", "stg_courses", "stg_students",
              "stg_enrollments"],
    )
    def int_department_analytics(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_department_analytics.sql:1-70.
        # The reference left-joins four fact tables off departments (row
        # multiplication, then distinct-counts) — preserved as-is.
        d = ctx.ref("stg_departments")
        f = ctx.ref("stg_faculty").select("faculty_id", "department_id", "position",
                                          "salary")
        c = ctx.ref("stg_courses").select("course_id", "department_id", "credits",
                                          "difficulty_level")
        s = ctx.ref("stg_students").select("student_id", "major_id", "gpa")
        e = ctx.ref("stg_enrollments").select("enrollment_id", "course_id")
        joined = (
            d.join(f.withColumnRenamed("department_id", "dep_f"),
                   d.department_id == F.col("dep_f"), "left")
            .join(c.withColumnRenamed("department_id", "dep_c"),
                  d.department_id == F.col("dep_c"), "left")
            .join(s, d.department_id == s.major_id, "left")
            .join(e, c.course_id == e.course_id, "left")
        )
        agg = joined.groupBy(
            "department_id", "department_name", "department_code", "budget",
            "budget_millions", "department_size", "building_location",
        ).agg(
            F.countDistinct("faculty_id").alias("faculty_count"),
            F.countDistinct(c.course_id).alias("course_count"),
            F.countDistinct("student_id").alias("student_count"),
            F.countDistinct("enrollment_id").alias("total_enrollments"),
            F.avg("salary").alias("avg_faculty_salary"),
            F.sum("salary").alias("total_faculty_salary_cost"),
            F.avg("gpa").alias("avg_student_gpa"),
            F.sum("credits").alias("total_credit_hours_offered"),
            F.count(F.when(F.col("position") == "Professor", 1)).alias("professor_count"),
            F.count(F.when(F.col("position") == "Associate Professor", 1)).alias(
                "associate_professor_count"
            ),
            F.count(F.when(F.col("position") == "Assistant Professor", 1)).alias(
                "assistant_professor_count"
            ),
            F.avg("difficulty_level").alias("avg_course_difficulty"),
        )
        fc = F.when(F.col("faculty_count") != 0, F.col("faculty_count"))
        sc = F.when(F.col("student_count") != 0, F.col("student_count"))
        cc = F.when(F.col("course_count") != 0, F.col("course_count"))
        ratio = F.col("student_count").cast("decimal(18,2)") / fc
        return agg.select(
            "*",
            F.round(F.col("budget") / fc, 2).alias("budget_per_faculty"),
            F.round(F.col("budget") / sc, 2).alias("budget_per_student"),
            F.round(F.col("total_faculty_salary_cost") / F.when(F.col("budget") != 0,
                                                                F.col("budget")) * 100,
                    2).alias("salary_cost_percentage"),
            F.round(ratio, 2).alias("student_faculty_ratio"),
            F.round(F.col("course_count").cast("decimal(18,2)") / fc, 2).alias(
                "courses_per_faculty"
            ),
            F.round(F.col("total_enrollments").cast("decimal(18,2)") / cc, 2).alias(
                "avg_enrollment_per_course"
            ),
            F.when(F.col("student_count") > 500, "Large Department")
            .when(F.col("student_count") > 200, "Medium Department")
            .when(F.col("student_count") > 50, "Small Department")
            .otherwise("Very Small Department")
            .alias("department_scale"),
            F.when(ratio > 30, "High Student-Faculty Ratio")
            .when(ratio > 20, "Moderate Student-Faculty Ratio")
            .when(ratio > 10, "Low Student-Faculty Ratio")
            .otherwise("Very Low Student-Faculty Ratio")
            .alias("ratio_category"),
        )

    @reg.model(
        "int_course_prerequisite_chains",
        deps=["stg_courses", "stg_departments"],
    )
    def int_course_prerequisite_chains(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_course_prerequisite_chains.sql:1-107
        # (R1): WITH RECURSIVE → driver-side frontier loop, depth cap 10,
        # path-string build and root coalesce per sql:30-32.
        courses = ctx.ref("stg_courses").select(
            "course_id", "course_code", "course_name", "prerequisite_course_id",
            "department_id", "difficulty_level", "credits",
        )
        seed = courses.filter(F.col("prerequisite_course_id").isNull()).select(
            "*",
            F.lit(0).alias("prerequisite_depth"),
            F.col("course_code").alias("prerequisite_chain"),
            F.lit(None).cast("int").alias("root_course_id"),
        )

        def step(frontier: DataFrame, depth: int) -> DataFrame:
            fr = frontier.select(
                F.col("course_id").alias("ch_course_id"),
                F.col("prerequisite_depth").alias("ch_depth"),
                F.col("prerequisite_chain").alias("ch_chain"),
                F.col("root_course_id").alias("ch_root"),
            ).filter(F.col("ch_depth") < 10)
            return courses.join(
                fr, courses.prerequisite_course_id == fr.ch_course_id
            ).select(
                "course_id", "course_code", "course_name",
                "prerequisite_course_id", "department_id", "difficulty_level",
                "credits",
                (F.col("ch_depth") + 1).alias("prerequisite_depth"),
                F.concat("ch_chain", F.lit(" -> "), "course_code").alias(
                    "prerequisite_chain"
                ),
                F.coalesce("ch_root", "ch_course_id").alias("root_course_id"),
            )

        hierarchy = recursive_loop(seed, step, max_iterations=10)

        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code")
        prereq = courses.select(
            F.col("course_id").alias("pr_id"),
            F.col("course_code").alias("prerequisite_code"),
            F.col("course_name").alias("prerequisite_name"),
            F.col("difficulty_level").alias("prerequisite_difficulty"),
        )
        depth = F.col("prerequisite_depth")
        analysis = (
            hierarchy.join(F.broadcast(d), "department_id", "left")
            .join(F.broadcast(prereq),
                  hierarchy.prerequisite_course_id == prereq.pr_id, "left")
            .drop("pr_id")
            .select(
                "*",
                F.when(depth == 0, "Entry Level")
                .when(depth == 1, "Second Level")
                .when(depth == 2, "Intermediate")
                .when(depth == 3, "Advanced")
                .when(depth >= 4, "Expert Level")
                .alias("course_level_category"),
                F.when(depth == 0, "No Prerequisites")
                .when(depth == 1, "Single Prerequisite")
                .when(depth.between(2, 3), "Multiple Prerequisites")
                .otherwise("Complex Prerequisite Chain")
                .alias("prerequisite_complexity"),
                (F.col("difficulty_level") - F.coalesce("prerequisite_difficulty",
                                                        F.lit(0))).alias(
                    "difficulty_progression"
                ),
            )
        )
        seq = (
            analysis.filter(F.col("root_course_id").isNotNull())
            .groupBy("root_course_id")
            .agg(
                F.count(F.lit(1)).alias("total_courses_in_sequence"),
                F.max("prerequisite_depth").alias("max_sequence_depth"),
                F.min("difficulty_level").alias("min_difficulty_in_sequence"),
                F.max("difficulty_level").alias("max_difficulty_in_sequence"),
                F.avg("difficulty_level").alias("avg_difficulty_in_sequence"),
                F.sum("credits").alias("total_credits_in_sequence"),
                string_agg_ordered("course_code", " -> ",
                                   order_by=F.col("prerequisite_depth")).alias(
                    "full_sequence"
                ),
            )
        )
        msd = F.col("max_sequence_depth")
        return (
            analysis.join(F.broadcast(seq), "root_course_id", "left")
            .select(
                "*",
                F.when(msd >= 4, "Long Sequence")
                .when(msd >= 2, "Moderate Sequence")
                .when(msd == 1, "Short Sequence")
                .otherwise("No Sequence")
                .alias("sequence_length_category"),
                F.when(F.col("difficulty_progression") > 2,
                       "Steep Difficulty Increase")
                .when(F.col("difficulty_progression") > 0,
                      "Moderate Difficulty Increase")
                .when(F.col("difficulty_progression") == 0, "Same Difficulty Level")
                .otherwise("Difficulty Decrease")
                .alias("difficulty_progression_category"),
            )
        )
