"""Intermediate tier, part 2: the hard shapes (J7 theta self-joins,
A9 correlations, J9 correlated-subquery rewrite, J8 sequence joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.functions.pg import pg_corr
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_intermediate2(reg: ModelRegistry) -> None:
    @reg.model(
        "int_academic_collaboration_networks",
        deps=["stg_enrollments", "stg_courses", "stg_departments", "stg_semesters",
              "stg_students", "stg_faculty", "stg_class_sessions"],
    )
    def int_academic_collaboration_networks(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_academic_collaboration_networks.sql
        # :24-28 J7 pair self-join (student_id < student_id on shared
        # course+semester); :48 corr; :57 HAVING; :172-176 correlated
        # IN-subquery join — rewritten per SURVEY §7.2: distinct
        # (student_a, department) bridge + equi-join (a pair in N
        # departments matches N department-metric rows, same
        # multiplication as the reference's IN form).
        e = ctx.ref("stg_enrollments").filter(
            F.col("enrollment_status") == "Completed"
        ).select("student_id", "course_id", "semester_id", "grade_points")
        e1 = e.alias("e1")
        e2 = e.alias("e2")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "difficulty_level", "department_id")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        s = ctx.ref("stg_students").select("student_id", "full_name", "gpa",
                                           "major_id")
        # AQE skew-join handles popular (course, semester) cohorts (J7
        # is quadratic per cohort — SURVEY §7.7).
        conn = (
            e1.join(
                e2,
                (F.col("e1.course_id") == F.col("e2.course_id"))
                & (F.col("e1.semester_id") == F.col("e2.semester_id"))
                & (F.col("e1.student_id") < F.col("e2.student_id")),
            )
            .join(F.broadcast(c), F.col("e1.course_id") == c.course_id)
            .join(F.broadcast(d), "department_id")
            .join(F.broadcast(sem), F.col("e1.semester_id") == sem.semester_id)
            .join(s.alias("s1"), F.col("e1.student_id") == F.col("s1.student_id"))
            .join(s.alias("s2"), F.col("e2.student_id") == F.col("s2.student_id"))
            .select(
                F.col("e1.student_id").alias("student_a"),
                F.col("e2.student_id").alias("student_b"),
                F.col("e1.course_id").alias("course_id"),
                F.col("e1.semester_id").alias("semester_id"),
                "course_code", "course_name", "difficulty_level",
                "department_name", "semester_name", "academic_year",
                F.col("s1.full_name").alias("student_a_name"),
                F.col("s2.full_name").alias("student_b_name"),
                F.col("s1.gpa").alias("student_a_gpa"),
                F.col("s2.gpa").alias("student_b_gpa"),
                F.col("s1.major_id").alias("student_a_major"),
                F.col("s2.major_id").alias("student_b_major"),
                F.col("e1.grade_points").alias("student_a_grade"),
                F.col("e2.grade_points").alias("student_b_grade"),
                F.abs(
                    F.col("e1.grade_points") - F.col("e2.grade_points")
                ).alias("grade_difference"),
            )
        )
        strength = (
            conn.groupBy(
                "student_a", "student_b", "student_a_name", "student_b_name",
                "student_a_major", "student_b_major", "student_a_gpa",
                "student_b_gpa",
            )
            .agg(
                F.countDistinct("course_id").alias("shared_courses"),
                F.countDistinct("semester_id").alias("shared_semesters"),
                F.countDistinct("department_name").alias("shared_departments"),
                F.avg("difficulty_level").alias("avg_shared_course_difficulty"),
                F.avg("grade_difference").alias("avg_grade_difference"),
                pg_corr("student_a_grade", "student_b_grade").alias(
                    "grade_correlation"
                ),
            )
            .filter(F.col("shared_courses") >= 2)
            .select(
                "student_a", "student_b", "student_a_name", "student_b_name",
                "shared_courses", "shared_semesters", "shared_departments",
                "avg_shared_course_difficulty", "avg_grade_difference",
                "grade_correlation",
                F.when(
                    F.col("student_a_major") == F.col("student_b_major"), 1
                ).otherwise(0).alias("same_major"),
                F.abs(F.col("student_a_gpa") - F.col("student_b_gpa")).alias(
                    "gpa_difference"
                ),
                F.least("student_a_gpa", "student_b_gpa").alias("min_gpa"),
                F.greatest("student_a_gpa", "student_b_gpa").alias("max_gpa"),
            )
        )
        sc, gc = F.col("shared_courses"), F.col("grade_correlation")
        agd, gd = F.col("avg_grade_difference"), F.col("gpa_difference")
        analysis = strength.select(
            "*",
            F.when(sc >= 6, "Very Strong Connection")
            .when(sc >= 4, "Strong Connection")
            .when(sc >= 3, "Moderate Connection")
            .otherwise("Weak Connection")
            .alias("connection_strength"),
            F.when(gc >= 0.7, "Very Similar Performance")
            .when(gc >= 0.4, "Similar Performance")
            .when(gc >= 0.1, "Somewhat Similar Performance")
            .when(gc >= -0.1, "Unrelated Performance")
            .otherwise("Opposite Performance Patterns")
            .alias("performance_similarity"),
            F.when(agd <= 0.3, "Very Close Academic Peers")
            .when(agd <= 0.7, "Close Academic Peers")
            .when(agd <= 1.2, "Moderate Academic Difference")
            .otherwise("Significant Academic Difference")
            .alias("academic_peer_level"),
            F.when((gd <= 0.2) & (F.col("same_major") == 1), "Ideal Study Partners")
            .when((gd <= 0.5) & (F.col("shared_departments") >= 2),
                  "Good Study Partners")
            .when(
                ((F.col("max_gpa") - F.col("min_gpa")) >= 1.0)
                & (F.col("same_major") == 1),
                "Mentoring Opportunity",
            )
            .otherwise("Diverse Learning Partnership")
            .alias("collaboration_type"),
        )
        dept_pairs = (
            conn.join(
                analysis.select("student_a", "student_b", "connection_strength",
                                "same_major", "collaboration_type",
                                "performance_similarity", "shared_courses"),
                ["student_a", "student_b"],
            )
        )
        dcm = dept_pairs.groupBy("department_name").agg(
            (
                F.countDistinct("student_a") + F.countDistinct("student_b")
            ).alias("unique_students_in_collaborations"),
            F.avg("shared_courses").alias("avg_shared_courses_per_pair"),
            F.count(
                F.when(
                    F.col("connection_strength").isin(
                        "Strong Connection", "Very Strong Connection"
                    ),
                    1,
                )
            ).alias("strong_collaborations"),
            F.count(F.when(F.col("same_major") == 1, 1)).alias(
                "same_major_collaborations"
            ),
            F.count(F.when(F.col("collaboration_type").like("%Mentoring%"), 1)).alias(
                "mentoring_opportunities"
            ),
            F.round(
                F.count(F.when(F.col("performance_similarity").like("%Similar%"), 1))
                * 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("performance_similarity_rate"),
        )
        # J9 rewrite: distinct (student_a, department) bridge
        bridge = conn.select("student_a", "department_name").distinct()
        cs_, ps_, ct_ = (F.col("connection_strength"),
                         F.col("performance_similarity"),
                         F.col("collaboration_type"))
        score = (
            F.when(cs_ == "Very Strong Connection", 25)
            .when(cs_ == "Strong Connection", 20)
            .when(cs_ == "Moderate Connection", 15)
            .otherwise(10)
            + F.when(ps_.like("%Very Similar%"), 20)
            .when(ps_.like("%Similar%"), 15)
            .otherwise(10)
            + F.when(ct_.like("%Ideal%"), 25)
            .when(ct_.like("%Good%"), 20)
            .when(ct_.like("%Mentoring%"), 30)
            .otherwise(15)
            + F.when(F.col("same_major") == 1, 15).otherwise(10)
            + F.when(F.col("avg_shared_course_difficulty") >= 4, 15)
            .when(F.col("avg_shared_course_difficulty") >= 3, 10)
            .otherwise(5)
        )
        return (
            analysis.join(F.broadcast(bridge), "student_a", "left")
            .join(
                F.broadcast(
                    dcm.select(
                        "department_name",
                        F.col("avg_shared_courses_per_pair").alias(
                            "dept_avg_shared_courses"
                        ),
                        F.col("performance_similarity_rate").alias(
                            "dept_similarity_rate"
                        ),
                    )
                ),
                "department_name",
                "left",
            )
            .drop("department_name")
            .select(
                "*",
                F.when(
                    sc > F.col("dept_avg_shared_courses") * 1.5,
                    "Above Average Collaboration",
                )
                .when(
                    sc < F.col("dept_avg_shared_courses") * 0.5,
                    "Below Average Collaboration",
                )
                .otherwise("Average Collaboration")
                .alias("relative_collaboration_level"),
                F.round(score, 0).alias("collaboration_value_score"),
            )
            .orderBy(F.desc("collaboration_value_score"),
                     "student_a", "student_b")
        )

    @reg.model(
        "int_faculty_teaching_load",
        deps=["stg_faculty", "stg_departments", "stg_class_sessions", "stg_courses",
              "stg_semesters", "stg_enrollments"],
    )
    def int_faculty_teaching_load(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_faculty_teaching_load.sql:1-90 —
        # faculty → sessions → courses → enrollments multiplication, then
        # per-faculty distinct-count rollup with salary-per-unit ratios.
        f = ctx.ref("stg_faculty").select(
            "faculty_id", F.col("full_name").alias("faculty_name"), "position",
            "salary", "department_id", "years_of_service", "salary_band",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code")
        cs = ctx.ref("stg_class_sessions").select(
            "faculty_id", "course_id", "semester_id", "session_date",
            "session_time", "time_block", "attendance_count",
        )
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "credits", "difficulty_level")
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        e = ctx.ref("stg_enrollments").select(
            F.col("course_id").alias("e_course"), F.col("semester_id").alias("e_sem"),
            "enrollment_id", "student_id",
        )
        joined = (
            f.join(F.broadcast(d), "department_id", "left")
            .join(cs, "faculty_id", "left")
            .join(F.broadcast(c), "course_id", "left")
            .join(F.broadcast(sem), "semester_id", "left")
            .join(
                e,
                (c.course_id == e.e_course) & (sem.semester_id == e.e_sem),
                "left",
            )
        )
        tb = F.col("time_block")
        n_courses = F.countDistinct("course_id")
        sum_credits = F.sum("credits")
        metrics = joined.groupBy(
            "faculty_id", "faculty_name", "position", "salary", "department_id",
            "years_of_service", "salary_band", "department_name", "department_code",
        ).agg(
            n_courses.alias("unique_courses_taught"),
            F.countDistinct("semester_id").alias("semesters_active"),
            F.countDistinct("session_date").alias("total_class_sessions"),
            F.countDistinct("enrollment_id").alias("total_students_taught"),
            F.avg("attendance_count").alias("avg_class_attendance"),
            sum_credits.alias("total_credit_hours_taught"),
            F.avg("difficulty_level").alias("avg_course_difficulty"),
            F.count(F.when(tb == "Morning", 1)).alias("morning_sessions"),
            F.count(F.when(tb == "Afternoon", 1)).alias("afternoon_sessions"),
            F.count(F.when(tb == "Evening", 1)).alias("evening_sessions"),
            F.round(
                F.first("salary") / F.when(n_courses != 0, n_courses), 2
            ).alias("salary_per_course"),
            F.round(
                F.first("salary") / F.when(sum_credits != 0, sum_credits), 2
            ).alias("salary_per_credit_hour"),
        )
        uc, ch = F.col("unique_courses_taught"), F.col("total_credit_hours_taught")
        return metrics.select(
            "*",
            F.when(uc >= 6, "Heavy Load")
            .when(uc >= 4, "Standard Load")
            .when(uc >= 2, "Light Load")
            .when(uc == 1, "Minimal Load")
            .otherwise("No Teaching Load")
            .alias("teaching_load_category"),
            F.when(ch >= 18, "Overloaded")
            .when(ch >= 12, "Full Load")
            .when(ch >= 6, "Part Load")
            .otherwise("Minimal Load")
            .alias("credit_hour_load_category"),
        )

    @reg.model(
        "int_assignment_performance",
        deps=["stg_assignments", "stg_courses", "stg_semesters",
              "stg_assignment_submissions", "stg_students"],
    )
    def int_assignment_performance(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_assignment_performance.sql:1-106 —
        # per-assignment submission metrics (stddev A8, conditional rates).
        a = ctx.ref("stg_assignments")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "difficulty_level")
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year")
        sub = ctx.ref("stg_assignment_submissions").select(
            "assignment_id", "submission_id", "student_id", "submission_date",
            "score", "late_submission", "grading_status", "feedback_status",
        )
        joined = (
            a.join(F.broadcast(c), "course_id", "left")
            .join(F.broadcast(sem), "semester_id", "left")
            .join(sub, "assignment_id", "left")
        )
        sc, mp = F.col("score"), F.col("max_points")
        n_sub = F.count("submission_id")
        n_late = F.count(F.when(F.col("late_submission"), 1))
        n_graded = F.count(F.when(F.col("grading_status") == "Graded", 1))
        n_scored = F.count(F.when(sc.isNotNull(), 1))
        return (
            joined.filter(F.col("assignment_id").isNotNull())
            .groupBy(
                "assignment_id", "course_id", "semester_id", "assignment_name",
                "assignment_type", "assignment_category", "due_date", "due_status",
                "max_points", "weight_percentage", "weight_category", "course_code",
                "course_name", "difficulty_level", "semester_name", "academic_year",
            )
            .agg(
                F.countDistinct("submission_id").alias("total_submissions"),
                F.countDistinct("student_id").alias("unique_students_submitted"),
                F.avg("score").alias("avg_score"),
                F.min("score").alias("min_score"),
                F.max("score").alias("max_score"),
                F.stddev("score").alias("score_standard_deviation"),
                F.avg(F.when(sc.isNotNull(), sc / mp * 100)).alias(
                    "avg_percentage_score"
                ),
                n_late.alias("late_submissions"),
                n_graded.alias("graded_submissions"),
                F.count(F.when(F.col("feedback_status") == "Has Feedback", 1)).alias(
                    "submissions_with_feedback"
                ),
                F.round(n_late * 100.0 / F.when(n_sub != 0, n_sub), 2).alias(
                    "late_submission_rate"
                ),
                F.round(n_graded * 100.0 / F.when(n_sub != 0, n_sub), 2).alias(
                    "grading_completion_rate"
                ),
                F.round(
                    F.count(F.when(sc >= mp * 0.9, 1)) * 100.0
                    / F.when(n_scored != 0, n_scored),
                    2,
                ).alias("excellent_performance_rate"),
                F.round(
                    F.count(F.when(sc < mp * 0.6, 1)) * 100.0
                    / F.when(n_scored != 0, n_scored),
                    2,
                ).alias("poor_performance_rate"),
            )
        )


def register_intermediate3(reg: ModelRegistry) -> None:
    @reg.model(
        "int_curriculum_flow_analysis",
        deps=["stg_enrollments", "stg_courses", "stg_semesters", "stg_students"],
    )
    def int_curriculum_flow_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_curriculum_flow_analysis.sql:1-180 —
        # J8 sequence-order self-join (:43-46), A10 ordered string_agg (:52),
        # W2 lag windows (:64-70). Tiebreaker course_id added to the
        # sequence window (reference orders by non-unique start_date).
        e = ctx.ref("stg_enrollments").filter(
            F.col("enrollment_status") == "Completed"
        ).select("student_id", "course_id", "semester_id", "grade_points",
                 "grade_category")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "difficulty_level",
                                          "prerequisite_course_id")
        prereq_c = c.select(F.col("course_id").alias("pc_id"),
                            F.col("course_code").alias("prerequisite_code"))
        sem = ctx.ref("stg_semesters").select("semester_id", "start_date")
        w_seq = Window.partitionBy("student_id").orderBy("start_date", "course_id")
        csd = (
            e.join(F.broadcast(c), "course_id")
            .join(F.broadcast(prereq_c),
                  F.col("prerequisite_course_id") == F.col("pc_id"), "left")
            .drop("pc_id")
            .join(F.broadcast(sem), "semester_id")
            .withColumn("sequence_order", F.row_number().over(w_seq))
        )
        taken = csd.select(
            F.col("student_id").alias("t_student"),
            F.col("course_id").alias("t_course"),
            F.col("sequence_order").alias("t_seq"),
        )
        pc = (
            csd.alias("csd")
            .join(
                taken,
                (F.col("csd.student_id") == F.col("t_student"))
                & (F.col("csd.prerequisite_course_id") == F.col("t_course"))
                & (F.col("t_seq") < F.col("csd.sequence_order")),
                "left",
            )
            .select(
                F.col("csd.student_id").alias("student_id"),
                F.col("csd.course_id").alias("course_id"),
                F.col("csd.course_code").alias("course_code"),
                F.col("csd.prerequisite_course_id").alias("prerequisite_course_id"),
                F.col("csd.sequence_order").alias("sequence_order"),
                F.when(F.col("csd.prerequisite_course_id").isNull(),
                       "No Prerequisite Required")
                .when(F.col("t_course").isNotNull(), "Prerequisite Completed")
                .otherwise("Prerequisite Not Completed")
                .alias("prerequisite_status"),
                F.when(
                    F.col("csd.prerequisite_course_id").isNotNull()
                    & F.col("t_course").isNotNull(),
                    F.col("csd.sequence_order") - F.col("t_seq"),
                ).alias("courses_between_prerequisite"),
            )
        )
        from dbt_incremental_ci_spark.functions.agg import string_agg_ordered

        csd_small = csd.select(
            F.col("student_id").alias("c_student"),
            F.col("course_id").alias("c_course"),
            F.col("course_code").alias("c_code"),
            F.col("difficulty_level").alias("c_diff"),
        )
        pathways = (
            pc.join(
                csd_small,
                (pc.student_id == F.col("c_student"))
                & (pc.course_id == F.col("c_course")),
            )
            .groupBy("student_id")
            .agg(
                string_agg_ordered(F.col("c_code"), " -> ",
                                   order_by=F.col("sequence_order")).alias(
                    "learning_pathway"
                ),
                F.count(F.lit(1)).alias("total_courses_taken"),
                F.count(
                    F.when(
                        F.col("prerequisite_status") == "Prerequisite Not Completed",
                        1,
                    )
                ).alias("prerequisite_violations"),
                F.avg(
                    F.when(F.col("prerequisite_course_id").isNotNull(),
                           F.col("courses_between_prerequisite"))
                ).alias("avg_gap_from_prerequisite"),
                F.count(F.when(F.col("c_diff") == 1, 1)).alias("beginner_courses"),
                F.count(F.when(F.col("c_diff") == 2, 1)).alias("intermediate_courses"),
                F.count(F.when(F.col("c_diff") >= 3, 1)).alias("advanced_courses"),
            )
        )
        w_lag = Window.partitionBy("student_id").orderBy("sequence_order")
        dpa = csd.select(
            "student_id",
            "difficulty_level",
            "sequence_order",
            F.lag("difficulty_level").over(w_lag).alias("prev_difficulty"),
            (F.col("difficulty_level")
             - F.lag("difficulty_level").over(w_lag)).alias("difficulty_jump"),
            "grade_points",
            (F.col("grade_points") - F.lag("grade_points").over(w_lag)).alias(
                "grade_change"
            ),
        )
        patterns = (
            dpa.filter(F.col("prev_difficulty").isNotNull())
            .groupBy("student_id")
            .agg(
                F.count(F.when(F.col("difficulty_jump") > 2, 1)).alias(
                    "large_difficulty_jumps"
                ),
                F.count(F.when(F.col("difficulty_jump") < 0, 1)).alias(
                    "difficulty_reversions"
                ),
                F.avg(
                    F.when(F.col("difficulty_jump") > 0, F.col("grade_change"))
                ).alias("avg_grade_change_on_difficulty_increase"),
                F.count(
                    F.when(
                        (F.col("difficulty_jump") > 0)
                        & (F.col("grade_change") < -0.5),
                        1,
                    )
                ).alias("struggled_with_difficulty_increase"),
                F.max("difficulty_level").alias("highest_difficulty_attempted"),
                F.count(F.when(F.col("prev_difficulty").isNotNull(), 1)).alias(
                    "total_transitions"
                ),
            )
        )
        s = ctx.ref("stg_students").select(
            "student_id", F.col("gpa").alias("final_gpa"), "academic_standing",
            "student_status",
        )
        pv = F.col("prerequisite_violations")
        ldj = F.col("large_difficulty_jumps")
        agci = F.col("avg_grade_change_on_difficulty_increase")
        hda = F.col("highest_difficulty_attempted")
        score = (
            F.when(pv == 0, 30).when(pv <= 2, 25).when(pv <= 5, 15).otherwise(5)
            + F.when(ldj == 0, 25).when(ldj <= 2, 20).when(ldj <= 4, 15).otherwise(10)
            + F.when(agci >= 0, 25).when(agci >= -0.3, 20).when(agci >= -0.7, 15)
            .otherwise(10)
            + F.when(hda >= 4, 20).when(hda >= 3, 15).when(hda >= 2, 10).otherwise(5)
        )
        ce = (
            pathways.join(patterns, "student_id", "left")
            .join(s, "student_id", "left")
            .select(
                "*",
                F.when(pv == 0, "Perfect Compliance")
                .when(pv <= 2, "Minor Violations")
                .when(pv <= 5, "Moderate Violations")
                .otherwise("Major Violations")
                .alias("prerequisite_compliance_category"),
                F.when((ldj == 0) & (F.col("difficulty_reversions") == 0),
                       "Smooth Progression")
                .when(ldj <= 2, "Minor Progression Issues")
                .when(ldj <= 5, "Moderate Progression Issues")
                .otherwise("Major Progression Issues")
                .alias("difficulty_progression_category"),
                F.when(
                    F.col("beginner_courses") > F.col("advanced_courses") * 2,
                    "Beginner Heavy",
                )
                .when(F.col("advanced_courses") > F.col("beginner_courses"),
                      "Advanced Heavy")
                .otherwise("Balanced Curriculum")
                .alias("curriculum_balance"),
                F.round(score, 0).alias("curriculum_pathway_score"),
            )
        )
        cps = F.col("curriculum_pathway_score")
        return ce.select(
            "*",
            F.when(pv > 3, "Implement stricter prerequisite enforcement")
            .when(ldj > 3, "Add intermediate difficulty courses")
            .when(
                F.col("struggled_with_difficulty_increase")
                > F.col("total_courses_taken") * 0.3,
                "Provide additional academic support",
            )
            .when(F.col("curriculum_balance") == "Beginner Heavy",
                  "Encourage more challenging coursework")
            .when(F.col("difficulty_reversions") > 2,
                  "Review course sequencing recommendations")
            .otherwise("Pathway appears appropriate")
            .alias("pathway_improvement_recommendation"),
            F.when(cps >= 80, "Optimal Pathway")
            .when(cps >= 65, "Good Pathway")
            .when(cps >= 50, "Adequate Pathway")
            .otherwise("Problematic Pathway")
            .alias("pathway_quality_assessment"),
            F.when(
                (F.col("prerequisite_compliance_category") == "Perfect Compliance")
                & (F.col("difficulty_progression_category") == "Smooth Progression")
                & (F.col("final_gpa") >= 3.0),
                "Exemplary Academic Journey",
            )
            .when(
                (pv <= 2) & (ldj <= 2) & (F.col("final_gpa") >= 2.5),
                "Successful Academic Journey",
            )
            .when(
                (pv > 5) | (ldj > 5) | (F.col("final_gpa") < 2.0),
                "Challenging Academic Journey",
            )
            .otherwise("Standard Academic Journey")
            .alias("overall_journey_assessment"),
        ).orderBy(F.desc("curriculum_pathway_score"), "student_id")

    @reg.model(
        "int_grade_inflation_analysis",
        deps=["stg_enrollments", "stg_courses", "stg_departments", "stg_semesters",
              "stg_class_sessions", "stg_faculty"],
    )
    def int_grade_inflation_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/intermediate/int_grade_inflation_analysis.sql:1-185 —
        # W2 lag / W4 first_value over yearly aggregates (:64-73), HAVING
        # thresholds (:58,:103), and the final miskeyed join
        # `course_id = faculty_id` (:149, SURVEY J13) preserved.
        e = ctx.ref("stg_enrollments").filter(
            F.col("grade").isNotNull() & (F.col("grade") != "W")
        ).select("course_id", "semester_id", "grade", "grade_points")
        c = ctx.ref("stg_courses").select("course_id", "course_code", "course_name",
                                          "department_id", "difficulty_level")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        sem = ctx.ref("stg_semesters").select("semester_id", "academic_year",
                                              "semester_type", "start_date")
        cs = ctx.ref("stg_class_sessions").select(
            F.col("course_id").alias("cs_course"),
            F.col("semester_id").alias("cs_sem"), "faculty_id",
        )
        fac = ctx.ref("stg_faculty").select("faculty_id",
                                            F.col("full_name").alias("faculty_name"),
                                            "years_of_service")
        g = F.col("grade")
        hist = (
            e.join(F.broadcast(c), "course_id")
            .join(F.broadcast(d), "department_id")
            .join(F.broadcast(sem), "semester_id")
            .join(
                F.broadcast(cs),
                (F.col("course_id") == F.col("cs_course"))
                & (F.col("semester_id") == F.col("cs_sem")),
                "left",
            )
            .join(F.broadcast(fac), "faculty_id", "left")
            .withColumn("year", F.year("start_date"))
            .withColumn(
                "grade_range",
                F.when(g.isin("A+", "A", "A-"), "A Range")
                .when(g.isin("B+", "B", "B-"), "B Range")
                .when(g.isin("C+", "C", "C-"), "C Range")
                .when(g.isin("D+", "D", "D-"), "D Range")
                .when(g == "F", "F")
                .otherwise("Other"),
            )
        )
        gr = F.col("grade_range")
        n = F.count(F.lit(1))
        ygt = (
            hist.groupBy("year", "course_id", "course_code", "course_name",
                         "department_name", "difficulty_level")
            .agg(
                n.alias("total_grades"),
                F.avg("grade_points").alias("avg_gpa"),
                F.count(F.when(gr == "A Range", 1)).alias("a_grades"),
                F.count(F.when(gr == "B Range", 1)).alias("b_grades"),
                F.count(F.when(gr == "C Range", 1)).alias("c_grades"),
                F.count(F.when(gr == "D Range", 1)).alias("d_grades"),
                F.count(F.when(gr == "F", 1)).alias("f_grades"),
                F.round(F.count(F.when(gr == "A Range", 1)) * 100.0 / n, 2).alias(
                    "a_percentage"
                ),
                F.round(F.count(F.when(gr == "B Range", 1)) * 100.0 / n, 2).alias(
                    "b_percentage"
                ),
                F.round(F.count(F.when(gr == "C Range", 1)) * 100.0 / n, 2).alias(
                    "c_percentage"
                ),
                F.round(
                    F.count(F.when(gr.isin("A Range", "B Range"), 1)) * 100.0 / n, 2
                ).alias("ab_percentage"),
            )
            .filter(F.col("total_grades") >= 10)
        )
        w = Window.partitionBy("course_id").orderBy("year")
        ia = ygt.select(
            "*",
            F.lag("avg_gpa", 1).over(w).alias("prev_year_gpa"),
            F.lag("a_percentage", 1).over(w).alias("prev_year_a_percentage"),
            F.lag("ab_percentage", 1).over(w).alias("prev_year_ab_percentage"),
            (F.col("avg_gpa") - F.lag("avg_gpa", 1).over(w)).alias("gpa_change"),
            (F.col("a_percentage") - F.lag("a_percentage", 1).over(w)).alias(
                "a_percentage_change"
            ),
            (F.col("ab_percentage") - F.lag("ab_percentage", 1).over(w)).alias(
                "ab_percentage_change"
            ),
            F.first("avg_gpa").over(w).alias("baseline_gpa"),
            F.first("a_percentage").over(w).alias("baseline_a_percentage"),
            (F.col("avg_gpa") - F.first("avg_gpa").over(w)).alias(
                "cumulative_gpa_change"
            ),
            (F.col("a_percentage") - F.first("a_percentage").over(w)).alias(
                "cumulative_a_change"
            ),
        )
        dt = ygt.groupBy("department_name", "year").agg(
            F.avg("avg_gpa").alias("dept_avg_gpa"),
            F.avg("a_percentage").alias("dept_avg_a_percentage"),
            F.avg("ab_percentage").alias("dept_avg_ab_percentage"),
            F.countDistinct("course_id").alias("courses_analyzed"),
        )
        fgp = (
            hist.filter(F.col("faculty_id").isNotNull())
            .groupBy("faculty_id", "faculty_name", "years_of_service",
                     "department_name")
            .agg(
                F.countDistinct("course_id").alias("courses_taught"),
                F.avg("grade_points").alias("faculty_avg_grade"),
                F.round(F.count(F.when(gr == "A Range", 1)) * 100.0 / n, 2).alias(
                    "faculty_a_percentage"
                ),
                F.round(F.count(F.when(gr == "F", 1)) * 100.0 / n, 2).alias(
                    "faculty_f_percentage"
                ),
                F.stddev("grade_points").alias("faculty_grade_variance"),
                n.alias("__n_grades"),
            )
            .filter(F.col("__n_grades") >= 20)
            .drop("__n_grades")
        )
        cgc, cac, gch = (F.col("cumulative_gpa_change"),
                         F.col("cumulative_a_change"), F.col("gpa_change"))
        ii = (
            # only the two dept-trend columns appear in the reference's
            # final select (sql:156-157) — don't leak the whole CTE
            ia.join(
                F.broadcast(dt.select("department_name", "year", "dept_avg_gpa",
                                      "dept_avg_a_percentage")),
                ["department_name", "year"],
                "left",
            )
            .select(
                "*",
                F.when(cgc >= 0.5, "Significant Grade Inflation")
                .when(cgc >= 0.3, "Moderate Grade Inflation")
                .when(cgc >= 0.1, "Mild Grade Inflation")
                .when(cgc >= -0.1, "Stable Grading")
                .when(cgc >= -0.3, "Mild Grade Deflation")
                .otherwise("Significant Grade Deflation")
                .alias("inflation_category"),
                F.when(cac >= 20, "High A Grade Inflation")
                .when(cac >= 10, "Moderate A Grade Inflation")
                .when(cac >= 5, "Mild A Grade Inflation")
                .when(cac >= -5, "Stable A Grading")
                .otherwise("A Grade Deflation")
                .alias("a_grade_inflation_category"),
                F.when(gch >= 0.2, "Significant Year-over-Year Increase")
                .when(gch >= 0.1, "Moderate Year-over-Year Increase")
                .when(gch >= 0.05, "Slight Year-over-Year Increase")
                .when(gch >= -0.05, "Stable Year-over-Year")
                .when(gch >= -0.1, "Slight Year-over-Year Decrease")
                .otherwise("Significant Year-over-Year Decrease")
                .alias("annual_trend_category"),
            )
        )
        fgp_j = fgp.select(
            "faculty_id", "faculty_avg_grade", "faculty_a_percentage",
            "faculty_grade_variance",
        )
        return (
            ii.join(F.broadcast(fgp_j), ii.course_id == fgp_j.faculty_id, "left")
            .drop("faculty_id")  # J13 miskey (sql:149) preserved
            .select(
                "*",
                F.when(F.col("avg_gpa") > F.col("dept_avg_gpa") * 1.1,
                       "Above Department Average")
                .when(F.col("avg_gpa") < F.col("dept_avg_gpa") * 0.9,
                      "Below Department Average")
                .otherwise("Near Department Average")
                .alias("course_vs_department_grading"),
            )
        )
