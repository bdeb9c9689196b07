"""Marts tier, part 5: graduation pathways + instructor scorecard."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def register_marts6(reg: ModelRegistry) -> None:
    @reg.model(
        "graduation_pathway_analysis",
        deps=["stg_students", "stg_departments", "int_student_enrollment_history",
              "stg_courses", "stg_semesters"],
        materialized="table",
    )
    def graduation_pathway_analysis(ctx) -> DataFrame:
        # ref: DEDP/models/marts/core/graduation_pathway_analysis.sql:1-169 —
        # W1 course-sequence row_number (:53, tiebreaker enrollment_id
        # added), degree-progress buckets, per-major pattern rollup.
        s = ctx.ref("stg_students").select(
            "student_id", "full_name", "enrollment_date", "graduation_date",
            "student_status", "gpa", "years_enrolled", "major_id",
        )
        d = ctx.ref("stg_departments").select(
            "department_id", F.col("department_name").alias("major"),
            "department_code",
        )
        eh_rollup = (
            ctx.ref("int_student_enrollment_history")
            .groupBy(F.col("student_id").alias("eh_student"))
            .agg(
                F.max("total_credits_earned").alias("total_credits_earned"),
                F.max("total_credits_attempted").alias("total_credits_attempted"),
                F.max("failed_courses_count").alias("failed_courses_count"),
                F.max("withdrawn_courses_count").alias("withdrawn_courses_count"),
            )
        )
        sdp = (
            s.join(F.broadcast(d), s.major_id == d.department_id, "left")
            .drop("major_id", "department_id")
            .join(eh_rollup, s.student_id == F.col("eh_student"), "left")
            .drop("eh_student")
            .withColumn(
                "actual_years_to_degree",
                F.when(
                    F.col("graduation_date").isNotNull(),
                    F.year("graduation_date") - F.year("enrollment_date"),
                ).otherwise(
                    F.year(F.lit(ctx.run_date)) - F.year("enrollment_date")
                ),
            )
            .withColumn(
                "has_graduated",
                F.when(F.col("graduation_date").isNotNull(), 1).otherwise(0),
            )
            .withColumn("required_credits_for_graduation", F.lit(120))
            .withColumn(
                "credits_remaining", F.lit(120) - F.col("total_credits_earned")
            )
        )
        eh = ctx.ref("int_student_enrollment_history").select(
            F.col("student_id").alias("cs_student"), "course_id", "semester_id",
            "enrollment_id", "grade_points", "grade_category",
        )
        c = ctx.ref("stg_courses").select(
            "course_id", "department_id", "course_code", "course_name",
            "difficulty_level", "prerequisite_course_id",
        )
        sem = ctx.ref("stg_semesters").select(
            F.col("semester_id").alias("sm_id"), "semester_name", "start_date"
        )
        w_seq = Window.partitionBy("cs_student").orderBy("start_date",
                                                         "enrollment_id")
        cs_rollup = (
            eh.join(F.broadcast(c), "course_id")
            .join(F.broadcast(sem), eh.semester_id == F.col("sm_id"))
            .withColumn("course_sequence_number", F.row_number().over(w_seq))
            .withColumn(
                "has_prerequisite",
                F.when(F.col("prerequisite_course_id").isNotNull(), 1).otherwise(0),
            )
            .groupBy("cs_student")
            .agg(
                F.avg("difficulty_level").alias("avg_course_difficulty"),
                F.count(F.when(F.col("has_prerequisite") == 1, 1)).alias(
                    "prerequisite_courses_taken"
                ),
                F.count(F.when(F.col("difficulty_level") >= 4, 1)).alias(
                    "advanced_courses_taken"
                ),
                F.max("course_sequence_number").alias("total_courses_in_sequence"),
            )
            .drop("total_courses_in_sequence")
        )
        hg = F.col("has_graduated")
        ayd, ye = F.col("actual_years_to_degree"), F.col("years_enrolled")
        tce = F.col("total_credits_earned")
        pe = (
            # pathway_efficiency (sql:64-110) does not carry
            # required_credits_for_graduation through — drop it here
            sdp.drop("required_credits_for_graduation")
            .join(cs_rollup, sdp.student_id == F.col("cs_student"), "left")
            .drop("cs_student")
            .withColumn(
                "credit_efficiency",
                F.round(
                    tce.cast("decimal(18,2)")
                    / F.col("total_credits_attempted") * 100,
                    2,
                ),
            )
            .withColumn(
                "degree_completion_status",
                F.when((hg == 1) & (ayd <= 4), "On-Time Graduate")
                .when((hg == 1) & ayd.between(4, 5), "Extended Graduate")
                .when((hg == 1) & (ayd > 5), "Significantly Delayed Graduate")
                .when((F.col("student_status") == "active") & (ye <= 4),
                      "On Track")
                .when(
                    (F.col("student_status") == "active") & ye.between(4, 6),
                    "Extended Timeline",
                )
                .when((F.col("student_status") == "active") & (ye > 6),
                      "Significantly Delayed")
                .otherwise("Did Not Complete"),
            )
            .withColumn(
                "academic_classification",
                F.when(tce >= 120, "Graduation Eligible")
                .when(tce >= 90, "Senior Status")
                .when(tce >= 60, "Junior Status")
                .when(tce >= 30, "Sophomore Status")
                .otherwise("Freshman Status"),
            )
            .withColumn(
                "avg_credits_per_year",
                F.round(tce.cast("decimal(18,2)") / F.greatest(ye, F.lit(1)), 2),
            )
        )
        dcs = F.col("degree_completion_status")
        dpp = pe.groupBy("major", "department_code").agg(
            F.count(F.lit(1)).alias("total_students_in_major"),
            F.count(F.when(hg == 1, 1)).alias("graduates_count"),
            F.count(F.when(F.col("student_status") == "active", 1)).alias(
                "active_students_count"
            ),
            F.round(
                F.count(F.when(hg == 1, 1)) * 100.0
                / F.when(
                    F.count(
                        F.when(
                            F.col("student_status").isin(
                                "active", "graduated", "dropped"
                            ),
                            1,
                        )
                    ) != 0,
                    F.count(
                        F.when(
                            F.col("student_status").isin(
                                "active", "graduated", "dropped"
                            ),
                            1,
                        )
                    ),
                ),
                2,
            ).alias("graduation_rate"),
            F.avg(F.when(hg == 1, ayd)).alias("avg_years_to_graduate"),
            F.avg(F.when(hg == 1, F.col("total_credits_attempted"))).alias(
                "avg_credits_attempted"
            ),
            F.avg(F.when(hg == 1, F.col("credit_efficiency"))).alias(
                "avg_graduation_efficiency"
            ),
            F.count(F.when(dcs == "On-Time Graduate", 1)).alias(
                "on_time_graduates"
            ),
            F.count(F.when(dcs.like("%Delayed%"), 1)).alias("delayed_graduates"),
            F.round(
                F.count(F.when(dcs == "On-Time Graduate", 1)) * 100.0
                / F.when(F.count(F.when(hg == 1, 1)) != 0,
                         F.count(F.when(hg == 1, 1))),
                2,
            ).alias("on_time_graduation_rate"),
        )
        dpp_j = dpp.select(
            "major",
            F.col("graduation_rate").alias("major_graduation_rate"),
            F.col("avg_years_to_graduate").alias("major_avg_years"),
            F.col("avg_graduation_efficiency").alias("major_avg_efficiency"),
            F.col("on_time_graduation_rate").alias("major_on_time_rate"),
        )
        ce, acy = F.col("credit_efficiency"), F.col("avg_credits_per_year")
        crm = F.col("credits_remaining")
        return (
            pe.join(F.broadcast(dpp_j), "major", "left")
            .select(
                "*",
                F.when(ce >= 95, "Highly Efficient")
                .when(ce >= 85, "Efficient")
                .when(ce >= 75, "Moderately Efficient")
                .otherwise("Inefficient")
                .alias("individual_efficiency_category"),
                F.when(acy >= 15, "Fast Track")
                .when(acy >= 12, "Standard Pace")
                .when(acy >= 9, "Slow Pace")
                .otherwise("Very Slow Pace")
                .alias("progression_pace"),
                F.when(
                    (hg == 0) & (crm <= 30) & (F.col("gpa") >= 2.0),
                    "Expected to Graduate Soon",
                )
                .when(
                    (hg == 0) & (crm <= 60) & (F.col("gpa") >= 2.0),
                    "On Track to Graduate",
                )
                .when((hg == 0) & (F.col("gpa") < 2.0), "At Risk")
                .when((hg == 0) & (ye > 6), "Extended Timeline Risk")
                .otherwise("Standard Progress")
                .alias("completion_risk_assessment"),
            )
            .orderBy("student_id")
        )

    @reg.model(
        "instructor_effectiveness_scorecard",
        deps=["int_faculty_teaching_load", "int_faculty_student_interactions",
              "int_assignment_performance"],
        materialized="table",
    )
    def instructor_effectiveness_scorecard(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/
        #   instructor_effectiveness_scorecard.sql:1-154 — W1/W6 peer windows
        # (:97-105, tiebreaker faculty_id added to rank windows), and the
        # miskeyed `faculty_id = ap.course_id` join (:36, SURVEY J13)
        # preserved. Joining the fsi cartesian multiplies rows exactly as
        # the reference does.
        f = ctx.ref("int_faculty_teaching_load").select(
            "faculty_id", "faculty_name", "position", "department_name",
            "years_of_service", "salary", "unique_courses_taught",
            "total_students_taught", "avg_class_attendance",
            "teaching_load_category",
        )
        fsi = ctx.ref("int_faculty_student_interactions").select(
            F.col("faculty_id").alias("fsi_id"), "student_success_rate",
            "avg_grade_given", "grade_consistency", "avg_incoming_student_gpa",
            "teaching_effectiveness_category", "student_engagement_level",
            "grading_consistency_level",
        )
        ap = (
            ctx.ref("int_assignment_performance")
            .groupBy(F.col("course_id").alias("ap_course"))
            .agg(
                F.avg("avg_percentage_score").alias("avg_assignment_performance"),
                F.avg("late_submission_rate").alias("avg_late_submission_rate"),
                F.avg("grading_completion_rate").alias(
                    "avg_grading_completion_rate"
                ),
            )
        )
        im = (
            f.join(fsi, f.faculty_id == F.col("fsi_id"), "left")
            .drop("fsi_id")
            .join(F.broadcast(ap), f.faculty_id == F.col("ap_course"), "left")
            .drop("ap_course")  # J13 miskey preserved
        )
        ssr, aca = F.col("student_success_rate"), F.col("avg_class_attendance")
        gcons, agcr = F.col("grade_consistency"), F.col("avg_grading_completion_rate")
        score = (
            F.when(ssr >= 90, 25).when(ssr >= 80, 20).when(ssr >= 70, 15)
            .when(ssr >= 60, 10).otherwise(5)
            + F.when(aca >= 95, 25).when(aca >= 85, 20).when(aca >= 75, 15)
            .when(aca >= 65, 10).otherwise(5)
            + F.when(gcons <= 0.5, 25).when(gcons <= 1.0, 20).when(gcons <= 1.5, 15)
            .when(gcons <= 2.0, 10).otherwise(5)
            + F.when(agcr >= 95, 25).when(agcr >= 85, 20).when(agcr >= 75, 15)
            .when(agcr >= 65, 10).otherwise(5)
        )
        ps = im.select(
            "*",
            F.round(score, 0).alias("effectiveness_score"),
            F.round(F.col("total_students_taught") * ssr / 100, 0).alias(
                "student_impact_score"
            ),
            F.when(F.col("years_of_service") >= 15, "Veteran")
            .when(F.col("years_of_service") >= 10, "Senior")
            .when(F.col("years_of_service") >= 5, "Experienced")
            .otherwise("Junior")
            .alias("experience_level"),
            F.round(
                ssr / F.when(F.col("unique_courses_taught") != 0,
                             F.col("unique_courses_taught")),
                2,
            ).alias("success_per_course_ratio"),
        )
        es = F.col("effectiveness_score")
        w_dept = Window.partitionBy("department_name")
        w_pos = Window.partitionBy("position")
        w_dept_rank = w_dept.orderBy(F.desc("effectiveness_score"), "faculty_id")
        w_pos_rank = w_pos.orderBy(F.desc("effectiveness_score"), "faculty_id")
        w_all = Window.orderBy(F.desc("effectiveness_score"), "faculty_id")
        pc = ps.select(
            "*",
            F.avg(es).over(w_dept).alias("dept_avg_effectiveness"),
            F.avg("student_impact_score").over(w_dept).alias("dept_avg_impact"),
            F.avg(ssr).over(w_dept).alias("dept_avg_success_rate"),
            F.avg("total_students_taught").over(w_dept).alias(
                "dept_avg_students_taught"
            ),
            F.avg(es).over(w_pos).alias("position_avg_effectiveness"),
            F.avg("student_impact_score").over(w_pos).alias(
                "position_avg_impact"
            ),
            F.row_number().over(w_dept_rank).alias("dept_effectiveness_rank"),
            F.row_number().over(w_pos_rank).alias("position_effectiveness_rank"),
            F.row_number().over(w_all).alias("overall_effectiveness_rank"),
        )
        dae = F.col("dept_avg_effectiveness")
        der = F.col("dept_effectiveness_rank")
        return pc.select(
            "*",
            F.when(es >= 90, "Outstanding")
            .when(es >= 80, "Excellent")
            .when(es >= 70, "Good")
            .when(es >= 60, "Satisfactory")
            .otherwise("Needs Improvement")
            .alias("overall_performance_rating"),
            F.when(der <= 3, "Top Performer in Department")
            .when(der <= dae * 0.25, "Above Average in Department")
            .when(der <= dae * 0.75, "Average in Department")
            .otherwise("Below Average in Department")
            .alias("departmental_standing"),
            F.when(es > dae * 1.2, "Significantly Above Department Average")
            .when(es > dae * 1.1, "Above Department Average")
            .when(es.between(dae * 0.9, dae * 1.1), "Near Department Average")
            .when(es > dae * 0.8, "Below Department Average")
            .otherwise("Significantly Below Department Average")
            .alias("performance_vs_peers"),
            F.when((es < 60) & (aca < 75),
                   "Focus on student engagement strategies")
            .when((es < 60) & (ssr < 70),
                  "Review grading standards and course difficulty")
            .when((es < 60) & (gcons > 2.0), "Work on grading consistency")
            .when(es >= 80, "Mentor other faculty members")
            .otherwise("Continue professional development")
            .alias("improvement_recommendations"),
            F.when(
                (es >= 90) & (F.col("student_impact_score") >= 150),
                "Eligible for Teaching Excellence Award",
            )
            .when(
                (es >= 85) & (F.col("years_of_service") >= 10),
                "Eligible for Veteran Educator Recognition",
            )
            .when(
                (es >= 80) & (F.col("experience_level") == "Junior"),
                "Eligible for Rising Star Award",
            )
            .otherwise("Standard Recognition")
            .alias("award_eligibility"),
        ).orderBy(F.desc("effectiveness_score"), "faculty_id")


def register_marts7(reg: ModelRegistry) -> None:
    @reg.model(
        "learning_outcome_assessment",
        deps=["stg_courses", "stg_departments", "int_course_performance_metrics",
              "int_assignment_performance", "course_success_predictors",
              "stg_students", "int_student_enrollment_history", "stg_enrollments"],
        materialized="table",
    )
    def learning_outcome_assessment(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/learning_outcome_assessment.sql:1-209
        # — per-difficulty null-skipping averages (A6), stddev consistency
        # (A8), mastery rollups. The course_outcome_effectiveness CTE
        # (:137-172) is dead code in the reference (never referenced by the
        # final select) and is not materialized.
        c = ctx.ref("stg_courses").select("course_id", "course_code",
                                          "course_name", "difficulty_level",
                                          "credits", "department_id")
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        cpm = ctx.ref("int_course_performance_metrics").select(
            F.col("course_id").alias("cpm_id"), "avg_grade_points", "pass_rate",
            "withdrawal_rate", "avg_attendance",
        )
        agp, pr = F.col("avg_grade_points"), F.col("pass_rate")
        clo = (
            c.join(F.broadcast(d), "department_id")
            .join(cpm, c.course_id == F.col("cpm_id"), "left")
            .select(
                "course_id",
                F.when(pr >= 90, "Excellent Mastery")
                .when(pr >= 80, "Good Mastery")
                .when(pr >= 70, "Acceptable Mastery")
                .when(pr >= 60, "Poor Mastery")
                .otherwise("Very Poor Mastery")
                .alias("content_mastery_level"),
            )
        )
        s = ctx.ref("stg_students").select("student_id", "full_name", "gpa",
                                           "academic_standing", "major_id")
        eh = (
            ctx.ref("int_student_enrollment_history")
            .groupBy(F.col("student_id").alias("eh_student"))
            .agg(
                F.max("total_credits_earned").alias("total_credits_earned"),
                F.max("avg_grade_points").alias("avg_grade_points"),
            )
        )
        e = ctx.ref("stg_enrollments").filter(
            F.col("enrollment_status") == "Completed"
        ).select(
            F.col("student_id").alias("e_student"),
            F.col("course_id").alias("e_course"), "grade_points",
        )
        c2 = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c2_id"),
            F.col("difficulty_level").alias("c2_diff"),
        )
        dl, gp = F.col("c2_diff"), F.col("grade_points")
        cml = F.col("content_mastery_level")
        slp = (
            s.join(F.broadcast(d), s.major_id == d.department_id)
            .withColumnRenamed("department_name", "major")
            .drop("major_id", "department_id")
            .join(eh, s.student_id == F.col("eh_student"), "left")
            .drop("eh_student")
            .join(e, s.student_id == F.col("e_student"), "left")
            .join(F.broadcast(c2), F.col("e_course") == F.col("c2_id"), "left")
            .join(F.broadcast(clo), F.col("e_course") == clo.course_id, "left")
            .groupBy(
                "student_id", "full_name", "gpa", "academic_standing", "major",
                "total_credits_earned",
                F.col("avg_grade_points").alias("avg_grade_points"),
            )
            .agg(
                F.countDistinct("e_course").alias("courses_completed"),
                F.avg(dl).alias("avg_course_difficulty"),
                F.count(
                    F.when(cml.isin("Excellent Mastery", "Good Mastery"), 1)
                ).alias("well_mastered_courses"),
                F.count(
                    F.when(cml.isin("Poor Mastery", "Very Poor Mastery"), 1)
                ).alias("poorly_mastered_courses"),
                F.avg(F.when(dl == 1, gp)).alias("avg_beginner_performance"),
                F.avg(F.when(dl == 2, gp)).alias("avg_intermediate_performance"),
                F.avg(F.when(dl >= 3, gp)).alias("avg_advanced_performance"),
                F.stddev(gp).alias("performance_consistency"),
            )
        )
        abp = F.col("avg_beginner_performance")
        aip = F.col("avg_intermediate_performance")
        aap = F.col("avg_advanced_performance")
        pc = F.col("performance_consistency")
        loa = slp.select(
            "*",
            F.when(abp.isNotNull() & aip.isNotNull(), aip - abp).alias(
                "beginner_to_intermediate_growth"
            ),
            F.when(aip.isNotNull() & aap.isNotNull(), aap - aip).alias(
                "intermediate_to_advanced_growth"
            ),
            F.when(abp.isNotNull() & aap.isNotNull(), aap - abp).alias(
                "overall_learning_growth"
            ),
            F.round(
                F.col("well_mastered_courses") * 100.0
                / F.when(F.col("courses_completed") != 0,
                         F.col("courses_completed")),
                2,
            ).alias("mastery_success_rate"),
            F.when(pc <= 0.5, "Very Consistent")
            .when(pc <= 1.0, "Consistent")
            .when(pc <= 1.5, "Moderately Consistent")
            .otherwise("Inconsistent")
            .alias("performance_consistency_level"),
            F.when(aap >= abp + 0.5, "Strong Learning Growth")
            .when(aap >= abp + 0.2, "Moderate Learning Growth")
            .when(aap >= abp - 0.2, "Stable Performance")
            .otherwise("Declining Performance")
            .alias("learning_trajectory"),
        )
        lt = F.col("learning_trajectory")
        dept_out = loa.groupBy("major").agg(
            F.count(F.lit(1)).alias("students_in_major"),
            F.avg("gpa").alias("major_avg_gpa"),
            F.avg("mastery_success_rate").alias("avg_mastery_rate"),
            F.avg("overall_learning_growth").alias("avg_learning_growth"),
            F.count(F.when(lt == "Strong Learning Growth", 1)).alias(
                "strong_learners"
            ),
            F.count(F.when(lt == "Declining Performance", 1)).alias(
                "declining_learners"
            ),
            F.round(
                F.count(F.when(lt == "Strong Learning Growth", 1)) * 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("strong_learner_percentage"),
            F.avg("avg_course_difficulty").alias("major_avg_difficulty"),
        )
        dept_j = dept_out.select(
            "major", "major_avg_gpa",
            F.col("strong_learner_percentage").alias("dept_strong_learner_rate"),
            F.col("major_avg_difficulty").alias("dept_avg_difficulty"),
        )
        olg, msr = F.col("overall_learning_growth"), F.col("mastery_success_rate")
        pcl = F.col("performance_consistency_level")
        return loa.join(F.broadcast(dept_j), "major", "left").select(
            "*",
            F.when((olg > 0.5) & (msr > 80), "Exceptional Learning Outcomes")
            .when((olg > 0.2) & (msr > 70), "Strong Learning Outcomes")
            .when((olg > 0) & (msr > 60), "Adequate Learning Outcomes")
            .when((olg <= 0) | (msr <= 50), "Poor Learning Outcomes")
            .otherwise("Mixed Learning Outcomes")
            .alias("overall_learning_outcome_assessment"),
            F.when(
                (lt == "Strong Learning Growth")
                & pcl.isin("Very Consistent", "Consistent"),
                "Ready for advanced coursework and independent study",
            )
            .when(
                (lt == "Moderate Learning Growth") & (msr >= 70),
                "Progressing well, continue current academic plan",
            )
            .when(
                (lt == "Stable Performance") & (msr >= 60),
                "Consider academic enrichment activities",
            )
            .when(
                (lt == "Declining Performance") | (msr < 50),
                "Requires academic intervention and support",
            )
            .otherwise("Monitor progress and provide targeted support")
            .alias("learning_outcome_recommendation"),
            F.when((aap >= 3.0) & (msr >= 80), "Ready for Graduate Studies")
            .when((aap >= 2.5) & (msr >= 70), "Ready for Senior Capstone")
            .when(
                (aip >= 2.5) & (F.col("total_credits_earned") >= 60),
                "Ready for Advanced Courses",
            )
            .when(
                (abp >= 2.0) & (F.col("total_credits_earned") >= 30),
                "Ready for Intermediate Courses",
            )
            .otherwise("Continue Foundation Building")
            .alias("academic_readiness_level"),
        )
