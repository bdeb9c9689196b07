"""Marts tier, part 9: budget allocation optimization (W5 percentiles
incl. desc ordering, W7 portfolio-total windows, budget adjustment
waterfall)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.plans.registry import ModelRegistry


def _int_div(num, den):
    """PG count/count integer division (truncating) preserved."""
    return (num.cast("double") / den).cast("long")


def register_marts_budget(reg: ModelRegistry) -> None:
    @reg.model(
        "budget_allocation_optimization",
        deps=["stg_departments", "stg_faculty", "stg_courses", "stg_students",
              "stg_enrollments", "stg_tuition_payments", "stg_financial_aid"],
        materialized="table",
    )
    def budget_allocation_optimization(ctx) -> DataFrame:
        # ref: DEDP/models/marts/finance/
        #   budget_allocation_optimization.sql:1-207 — W5 percent_rank
        # (:63-66, two with DESC ordering), W7 `over ()` portfolio totals
        # (:170-175, department-cardinality frame → safe), PG integer
        # division of counts (:57-58) reproduced.
        d = ctx.ref("stg_departments").select("department_id", "department_name",
                                              "department_code",
                                              F.col("budget").alias(
                                                  "allocated_budget"),
                                              "budget_millions",
                                              "department_size")
        f = ctx.ref("stg_faculty").select(
            F.col("faculty_id").alias("f_id"),
            F.col("department_id").alias("f_dep"),
            F.col("salary").alias("f_salary"),
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"),
            F.col("department_id").alias("c_dep"),
        )
        s = ctx.ref("stg_students").select(
            F.col("student_id").alias("s_id"), "major_id", "student_status"
        )
        e = ctx.ref("stg_enrollments").select(
            F.col("course_id").alias("e_course"),
            F.col("student_id").alias("e_student"), "enrollment_id",
            "grade_points", "attendance_percentage",
        )
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("student_id").alias("tp_student"),
            F.col("amount").alias("tp_amount"),
        )
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"),
            F.col("amount").alias("fa_amount"),
        )
        dfd = (
            d.join(f, d.department_id == F.col("f_dep"), "left")
            .join(c, d.department_id == F.col("c_dep"), "left")
            .join(s, d.department_id == s.major_id, "left")
            .join(
                e,
                (F.col("c_id") == F.col("e_course"))
                & (F.col("s_id") == F.col("e_student")),
                "left",
            )
            .join(tp, F.col("s_id") == F.col("tp_student"), "left")
            .join(fa, F.col("s_id") == F.col("fa_student"), "left")
            .groupBy("department_id", "department_name", "department_code",
                     "allocated_budget", "budget_millions", "department_size")
            .agg(
                F.countDistinct("f_id").alias("faculty_count"),
                F.countDistinct("s_id").alias("student_count"),
                F.countDistinct("c_id").alias("course_offerings"),
                F.sum("f_salary").alias("total_faculty_salaries"),
                F.avg("f_salary").alias("avg_faculty_salary"),
                F.sum("tp_amount").alias("total_tuition_revenue"),
                F.sum("fa_amount").alias("total_aid_disbursed"),
                F.countDistinct("enrollment_id").alias("total_enrollments"),
                F.avg("grade_points").alias("dept_avg_gpa"),
                F.count(F.when(F.col("student_status") == "graduated", 1)).alias(
                    "graduates_produced"
                ),
                F.round(F.avg("attendance_percentage"), 2).alias(
                    "dept_avg_attendance"
                ),
            )
        )
        ab = F.col("allocated_budget")
        sc_, fc_ = F.col("student_count"), F.col("faculty_count")
        gp_, te = F.col("graduates_produced"), F.col("total_enrollments")
        ttr, tad = F.col("total_tuition_revenue"), F.col("total_aid_disbursed")
        co = F.col("course_offerings")
        cba = dfd.select(
            "*",
            F.round(ab / F.when(sc_ != 0, sc_), 2).alias("cost_per_student"),
            F.round(ab / F.when(fc_ != 0, fc_), 2).alias("cost_per_faculty"),
            F.round(ab / F.when(gp_ != 0, gp_), 2).alias("cost_per_graduate"),
            F.round(ab / F.when(te != 0, te), 2).alias("cost_per_enrollment"),
            F.round(ttr / F.when(ab != 0, ab), 2).alias(
                "revenue_to_budget_ratio"
            ),
            F.round(ttr / F.when(sc_ != 0, sc_), 2).alias("revenue_per_student"),
            F.round((ttr - tad) / F.when(ab != 0, ab), 2).alias(
                "net_revenue_ratio"
            ),
            F.round(gp_ / F.when(ab != 0, ab) * 100_000, 2).alias(
                "graduates_per_100k_budget"
            ),
            F.round(
                F.col("dept_avg_gpa") * te / F.when(ab != 0, ab) * 10_000, 2
            ).alias("quality_weighted_output"),
            F.round(
                F.col("total_faculty_salaries") / F.when(ab != 0, ab) * 100, 2
            ).alias("faculty_cost_percentage"),
            F.round(
                _int_div(sc_, F.when(fc_ != 0, fc_)).cast("double"), 2
            ).alias("student_faculty_ratio"),
            F.round(
                _int_div(te, F.when(co != 0, co)).cast("double"), 2
            ).alias("avg_class_size"),
        )
        rbr = F.col("revenue_to_budget_ratio")
        cpg = F.col("cost_per_graduate")
        qwo = F.col("quality_weighted_output")
        w_all = Window.partitionBy()
        pb = cba.select(
            "*",
            # PG null placement: ASC → NULLS LAST, DESC → NULLS FIRST
            # (cost_per_graduate is null for graduate-less departments)
            F.percent_rank().over(Window.orderBy(rbr.asc_nulls_last())).alias(
                "revenue_efficiency_percentile"
            ),
            F.percent_rank().over(Window.orderBy(cpg.asc_nulls_last())).alias(
                "cost_effectiveness_percentile"
            ),
            F.percent_rank().over(Window.orderBy(qwo.desc_nulls_first())).alias(
                "quality_output_percentile"
            ),
            F.percent_rank().over(
                Window.orderBy(
                    F.col("graduates_per_100k_budget").desc_nulls_first()
                )
            ).alias("graduate_productivity_percentile"),
            F.avg("cost_per_student").over(w_all).alias(
                "institutional_avg_cost_per_student"
            ),
            F.avg(rbr).over(w_all).alias("institutional_avg_revenue_ratio"),
            F.avg("dept_avg_gpa").over(w_all).alias("institutional_avg_gpa"),
            F.avg("student_faculty_ratio").over(w_all).alias(
                "institutional_avg_ratio"
            ),
            F.when(rbr >= 1.5, "High Revenue Generator")
            .when(rbr >= 1.2, "Good Revenue Generator")
            .when(rbr >= 1.0, "Break-Even")
            .when(rbr >= 0.8, "Moderate Loss")
            .otherwise("High Loss")
            .alias("revenue_performance_category"),
            F.when(cpg <= 50_000, "Highly Cost Effective")
            .when(cpg <= 100_000, "Cost Effective")
            .when(cpg <= 200_000, "Moderately Cost Effective")
            .otherwise("Costly")
            .alias("cost_effectiveness_category"),
            F.when(qwo >= 50, "High Quality Output")
            .when(qwo >= 30, "Good Quality Output")
            .when(qwo >= 20, "Adequate Quality Output")
            .otherwise("Low Quality Output")
            .alias("quality_output_category"),
        )

        def tier(p):
            return (
                F.when(p >= 0.8, 25).when(p >= 0.6, 20).when(p >= 0.4, 15)
                .otherwise(10)
            )

        sfr = F.col("student_faculty_ratio")
        fcp = F.col("faculty_cost_percentage")
        rpc = F.col("revenue_performance_category")
        cec = F.col("cost_effectiveness_category")
        qoc = F.col("quality_output_category")
        oo = pb.select(
            "*",
            F.round(
                tier(F.col("revenue_efficiency_percentile"))
                + tier(F.col("cost_effectiveness_percentile"))
                + tier(F.col("quality_output_percentile"))
                + tier(F.col("graduate_productivity_percentile")),
                0,
            ).alias("budget_optimization_score"),
            F.when((rbr < 0.8) & (sfr < 15),
                   "Increase class sizes or reduce faculty")
            .when((rbr < 0.8) & (co > sc_ * 0.8), "Consolidate course offerings")
            .when((cpg > 150_000) & (F.col("dept_avg_gpa") < 3.0),
                  "Improve academic support for better retention")
            .when(fcp > 80, "Review faculty compensation structure")
            .when((sc_ < 100) & (ab > 1_000_000),
                  "Consider program consolidation or growth")
            .when((rbr > 1.5) & (qwo > 50),
                  "Model department - consider expansion")
            .otherwise("Minor optimizations recommended")
            .alias("primary_optimization_recommendation"),
            F.when(
                (rpc == "High Revenue Generator")
                & (cec == "Highly Cost Effective"),
                "Increase budget allocation for expansion",
            )
            .when(
                rpc.isin("Moderate Loss", "High Loss") & (cec == "Costly"),
                "Reduce budget allocation and restructure",
            )
            .when(qoc == "Low Quality Output",
                  "Reallocate funds to academic support and faculty development")
            .when(sfr > F.col("institutional_avg_ratio") * 1.5,
                  "Allocate additional faculty positions")
            .otherwise("Maintain current allocation with efficiency improvements")
            .alias("budget_reallocation_suggestion"),
        )
        bos = F.col("budget_optimization_score")
        ba = oo.select(
            "*",
            F.when(bos >= 80, F.round(ab * 1.1, 0))
            .when(bos >= 60, ab)
            .when(bos >= 40, F.round(ab * 0.95, 0))
            .otherwise(F.round(ab * 0.85, 0))
            .alias("suggested_budget_allocation"),
        )
        sba = F.col("suggested_budget_allocation")
        change_pct = (sba - ab) / F.when(ab != 0, ab) * 100
        gpk = F.col("graduates_per_100k_budget")
        return ba.select(
            "*",
            (sba - ab).alias("budget_change_amount"),
            F.round(change_pct, 2).alias("budget_change_percentage"),
            F.sum(sba).over(w_all).alias("total_suggested_budget"),
            F.sum(ab).over(w_all).alias("total_current_budget"),
            F.round(
                (F.sum(sba).over(w_all) - F.sum(ab).over(w_all))
                / F.when(F.sum(ab).over(w_all) != 0, F.sum(ab).over(w_all))
                * 100,
                2,
            ).alias("institutional_budget_change_percentage"),
            F.when(change_pct > 0, F.round(gpk * 1.1, 2))
            .when(change_pct == 0, gpk)
            .otherwise(F.round(gpk * 0.9, 2))
            .alias("projected_graduate_productivity"),
            F.when(change_pct > 0, F.round(rbr * 1.05, 2))
            .when(change_pct == 0, rbr)
            .otherwise(F.round(rbr * 1.02, 2))
            .alias("projected_revenue_ratio"),
            F.when(
                (rpc == "High Revenue Generator")
                & (qoc == "High Quality Output"),
                "Strategic Growth Investment",
            )
            .when(
                rpc.isin("Moderate Loss", "High Loss") & (cec == "Costly"),
                "Restructuring Priority",
            )
            .when((qoc == "Low Quality Output") & (sc_ > 200),
                  "Quality Improvement Priority")
            .when(
                (sc_ < 50) & (rpc != "High Revenue Generator"),
                "Viability Assessment Required",
            )
            .otherwise("Efficiency Optimization")
            .alias("strategic_priority"),
        )


def register_marts_revenue(reg: ModelRegistry) -> None:
    @reg.model(
        "institutional_revenue_optimization",
        deps=["stg_semesters", "stg_enrollments", "stg_courses", "stg_departments",
              "stg_tuition_payments", "stg_financial_aid", "stg_class_sessions",
              "stg_faculty"],
        materialized="table",
    )
    def institutional_revenue_optimization(ctx) -> DataFrame:
        # ref: DEDP/models/marts/finance/
        #   institutional_revenue_optimization.sql:1-155 — revenue-stream
        # fan-out per (semester, department), profitability waterfall.
        sem = ctx.ref("stg_semesters").select("semester_id", "semester_name",
                                              "academic_year", "semester_type")
        e = ctx.ref("stg_enrollments").select(
            "semester_id", "enrollment_id", "course_id",
            F.col("student_id").alias("e_student"),
        )
        c = ctx.ref("stg_courses").select(
            F.col("course_id").alias("c_id"), "credits",
            F.col("department_id").alias("c_dep"),
        )
        d = ctx.ref("stg_departments").select(
            "department_id", "department_name",
            F.col("budget").alias("department_budget"),
        )
        tp = ctx.ref("stg_tuition_payments").select(
            F.col("semester_id").alias("tp_sem"),
            F.col("student_id").alias("tp_student"),
            F.col("amount").alias("tp_amount"), "late_fee", "total_payment",
        )
        fa = ctx.ref("stg_financial_aid").select(
            F.col("student_id").alias("fa_student"),
            F.col("amount").alias("fa_amount"),
        )
        cs = ctx.ref("stg_class_sessions").select(
            F.col("course_id").alias("cs_course"),
            F.col("semester_id").alias("cs_sem"), "faculty_id",
        )
        f = ctx.ref("stg_faculty").select(
            F.col("faculty_id").alias("f_id"), F.col("salary").alias("f_salary")
        )
        rs = (
            sem.join(e, "semester_id", "left")
            .join(F.broadcast(c), e.course_id == F.col("c_id"), "left")
            .join(F.broadcast(d), F.col("c_dep") == d.department_id, "left")
            .join(
                tp,
                (F.col("semester_id") == F.col("tp_sem"))
                & (F.col("e_student") == F.col("tp_student")),
                "left",
            )
            .join(fa, F.col("e_student") == F.col("fa_student"), "left")
            .join(
                F.broadcast(cs),
                (F.col("c_id") == F.col("cs_course"))
                & (F.col("semester_id") == F.col("cs_sem")),
                "left",
            )
            .join(F.broadcast(f), F.col("faculty_id") == F.col("f_id"), "left")
            .groupBy("semester_id", "semester_name", "academic_year",
                     "semester_type", "department_id", "department_name",
                     "department_budget")
            .agg(
                F.countDistinct("tp_student").alias("paying_students"),
                F.countDistinct("enrollment_id").alias("total_enrollments"),
                F.sum("tp_amount").alias("tuition_revenue"),
                F.sum("late_fee").alias("late_fee_revenue"),
                F.sum("total_payment").alias("total_payment_revenue"),
                F.sum("fa_amount").alias("financial_aid_disbursed"),
                F.sum(F.col("credits") * 500).alias(
                    "potential_tuition_at_standard_rate"
                ),
                F.avg("tp_amount").alias("avg_tuition_per_student"),
                F.sum("f_salary").alias("faculty_salary_costs"),
                F.countDistinct("f_id").alias("faculty_count"),
            )
        )
        tr = F.col("tuition_revenue")
        fad = F.col("financial_aid_disbursed")
        ptr = F.col("potential_tuition_at_standard_rate")
        fsc = F.col("faculty_salary_costs")
        te, ps = F.col("total_enrollments"), F.col("paying_students")
        fc_ = F.col("faculty_count")
        db = F.col("department_budget")
        ca = rs.select(
            "*",
            (tr - fad).alias("net_tuition_revenue"),
            (ptr - tr).alias("tuition_revenue_gap"),
            F.round(tr / F.when(ptr != 0, ptr) * 100, 2).alias(
                "tuition_collection_rate"
            ),
            (fsc + db * 0.3).alias("estimated_total_costs"),
            F.round(fsc / F.when(te != 0, te), 2).alias("cost_per_enrollment"),
            F.round(tr / F.when(fsc != 0, fsc), 2).alias(
                "revenue_to_faculty_cost_ratio"
            ),
            F.round(te.cast("decimal(18,2)") / F.when(fc_ != 0, fc_), 2).alias(
                "student_faculty_ratio"
            ),
            F.round(tr / F.when(ps != 0, ps), 2).alias(
                "revenue_per_paying_student"
            ),
            F.round(te.cast("decimal(18,2)") / F.when(ps != 0, ps), 2).alias(
                "enrollment_to_payment_ratio"
            ),
            F.round(fad / F.when((tr + fad) != 0, tr + fad) * 100, 2).alias(
                "aid_percentage_of_gross_tuition"
            ),
        )
        profit = tr - (fsc + db * 0.3)
        tcr = F.col("tuition_collection_rate")
        sfr = F.col("student_faculty_ratio")
        apg = F.col("aid_percentage_of_gross_tuition")
        trg = F.col("tuition_revenue_gap")
        cpe = F.col("cost_per_enrollment")
        rfc = F.col("revenue_to_faculty_cost_ratio")
        epr = F.col("enrollment_to_payment_ratio")
        oo = ca.select(
            "*",
            profit.alias("estimated_profit_loss"),
            F.when(profit > 0, "Profitable")
            .when(profit > -50_000, "Break Even")
            .when(profit > -100_000, "Minor Loss")
            .otherwise("Major Loss")
            .alias("profitability_status"),
            F.when(tcr < 80, "High Collection Risk")
            .when(tcr < 90, "Moderate Collection Risk")
            .otherwise("Good Collection")
            .alias("collection_risk_category"),
            F.when(sfr > 25, "Potential Faculty Shortage")
            .when(sfr < 10, "Potential Over-Staffing")
            .otherwise("Optimal Staffing")
            .alias("staffing_optimization"),
            F.when(apg > 40, "High Aid Dependency")
            .when(apg > 25, "Moderate Aid Dependency")
            .otherwise("Low Aid Dependency")
            .alias("aid_dependency_level"),
            F.when(trg > 100_000, "High Revenue Opportunity")
            .when(trg > 50_000, "Moderate Revenue Opportunity")
            .when(trg > 0, "Small Revenue Opportunity")
            .otherwise("Revenue Maximized")
            .alias("revenue_opportunity_level"),
            F.when(cpe > 2000, "Review Cost Structure")
            .when(rfc < 1.5, "Faculty Cost Efficiency Concern")
            .when(sfr < 12, "Consider Course Consolidation")
            .when(epr > 1.2, "Payment Collection Issues")
            .otherwise("Cost Structure Acceptable")
            .alias("cost_optimization_recommendation"),
        )
        pst = F.col("profitability_status")
        crc = F.col("collection_risk_category")
        so_ = F.col("staffing_optimization")
        adl = F.col("aid_dependency_level")
        rol = F.col("revenue_opportunity_level")
        epl = F.col("estimated_profit_loss")
        return oo.select(
            "*",
            F.when(
                pst.isin("Minor Loss", "Major Loss") & rol.like("%High%"),
                "Focus on enrollment growth and tuition collection",
            )
            .when(
                pst.isin("Minor Loss", "Major Loss")
                & (so_ == "Potential Over-Staffing"),
                "Consider faculty optimization or course load increase",
            )
            .when(crc != "Good Collection",
                  "Implement enhanced payment collection strategies")
            .when(adl == "High Aid Dependency",
                  "Diversify revenue streams and review aid policies")
            .when(rol.like("%High%"), "Expand program capacity and marketing")
            .otherwise("Maintain current operations with minor optimizations")
            .alias("primary_strategic_recommendation"),
            F.round(
                F.when(pst == "Profitable", 30)
                .when(pst == "Break Even", 20)
                .when(pst == "Minor Loss", 10)
                .otherwise(0)
                + F.when(tcr >= 95, 25).when(tcr >= 85, 20).when(tcr >= 75, 15)
                .otherwise(10)
                + F.when(sfr.between(15, 25), 25)
                .when(sfr.between(10, 30), 20)
                .when(sfr.between(8, 35), 15).otherwise(10)
                + F.when(adl == "Low Aid Dependency", 20)
                .when(adl == "Moderate Aid Dependency", 15).otherwise(10),
                0,
            ).alias("financial_health_score"),
            F.when((epl < -100_000) & (tcr < 75), "High Risk")
            .when((epl < -50_000) | (tcr < 80), "Moderate Risk")
            .when((epl < 0) | (tcr < 90), "Low Risk")
            .otherwise("Low Risk")
            .alias("financial_risk_level"),
        )


def register_marts_calibration(reg: ModelRegistry) -> None:
    @reg.model(
        "course_difficulty_calibration",
        deps=["stg_courses", "stg_departments", "int_course_performance_metrics",
              "int_assignment_performance"],
        materialized="table",
    )
    def course_difficulty_calibration(ctx) -> DataFrame:
        # ref: DEDP/models/marts/academic/
        #   course_difficulty_calibration.sql:1-183 — tri-source difficulty
        # scoring vs assigned level, prerequisite-progression assessment,
        # department calibration rollup.
        c = ctx.ref("stg_courses").select(
            "course_id", "course_code", "course_name",
            F.col("difficulty_level").alias("assigned_difficulty"), "credits",
            "prerequisite_course_id", "department_id",
        )
        d = ctx.ref("stg_departments").select("department_id", "department_name")
        cpm = ctx.ref("int_course_performance_metrics").select(
            F.col("course_id").alias("cpm_id"), "total_enrollments",
            "avg_grade_points", "pass_rate", "withdrawal_rate", "avg_attendance",
        )
        prereq = ctx.ref("stg_courses").select(
            F.col("course_id").alias("pr_id"),
            F.col("difficulty_level").alias("prerequisite_difficulty"),
        )
        ia = (
            ctx.ref("int_assignment_performance")
            .groupBy(F.col("course_id").alias("ia_id"))
            .agg(
                F.avg("avg_percentage_score").alias("avg_assignment_score"),
                F.avg("late_submission_rate").alias("late_submission_rate"),
            )
        )
        agp, pr_ = F.col("avg_grade_points"), F.col("pass_rate")
        aa, lsr = F.col("avg_attendance"), F.col("late_submission_rate")
        wr = F.col("withdrawal_rate")
        da = (
            c.join(F.broadcast(d), "department_id", "left")
            .drop("department_id")  # not in the reference's projection (sql:4-19)
            .join(cpm, c.course_id == F.col("cpm_id"), "left")
            .drop("cpm_id")
            .join(F.broadcast(prereq),
                  c.prerequisite_course_id == F.col("pr_id"), "left")
            .drop("pr_id")
            .join(F.broadcast(ia), c.course_id == F.col("ia_id"), "left")
            .drop("ia_id")
            .filter(F.col("total_enrollments") >= 10)
            .select(
                "*",
                F.when((agp >= 3.5) & (pr_ >= 90), 1)
                .when((agp >= 3.0) & (pr_ >= 80), 2)
                .when((agp >= 2.5) & (pr_ >= 70), 3)
                .when((agp >= 2.0) & (pr_ >= 60), 4)
                .otherwise(5)
                .alias("performance_based_difficulty"),
                F.when((aa >= 95) & (lsr <= 10), 1)
                .when((aa >= 85) & (lsr <= 20), 2)
                .when((aa >= 75) & (lsr <= 30), 3)
                .when((aa >= 65) & (lsr <= 40), 4)
                .otherwise(5)
                .alias("engagement_based_difficulty"),
                F.when(wr <= 5, 1)
                .when(wr <= 10, 2)
                .when(wr <= 15, 3)
                .when(wr <= 25, 4)
                .otherwise(5)
                .alias("withdrawal_based_difficulty"),
            )
        )
        calc = F.round(
            (
                F.col("performance_based_difficulty")
                + F.col("engagement_based_difficulty")
                + F.col("withdrawal_based_difficulty")
            ) / 3.0,
            1,
        )
        ad = F.col("assigned_difficulty")
        cd_ = da.select(
            "*",
            calc.alias("calculated_difficulty"),
            F.abs(ad - calc).alias("difficulty_calibration_error"),
            F.when(
                F.col("prerequisite_course_id").isNotNull()
                & F.col("prerequisite_difficulty").isNotNull(),
                ad - F.col("prerequisite_difficulty"),
            ).alias("difficulty_progression_from_prerequisite"),
        )
        dce = F.col("difficulty_calibration_error")
        cdif = F.col("calculated_difficulty")
        dpp_ = F.col("difficulty_progression_from_prerequisite")
        ca_df = cd_.select(
            "*",
            F.when(dce <= 0.5, "Well Calibrated")
            .when(dce <= 1.0, "Moderately Calibrated")
            .when(dce <= 1.5, "Poorly Calibrated")
            .otherwise("Very Poorly Calibrated")
            .alias("calibration_status"),
            F.when(cdif > ad + 1, "Course Harder Than Expected")
            .when(cdif > ad + 0.5, "Course Somewhat Harder")
            .when(cdif < ad - 1, "Course Easier Than Expected")
            .when(cdif < ad - 0.5, "Course Somewhat Easier")
            .otherwise("Course As Expected")
            .alias("difficulty_assessment"),
            F.when(
                dpp_.isNotNull(),
                F.when(dpp_ < 0, "Easier than prerequisite")
                .when(dpp_ == 0, "Same difficulty as prerequisite")
                .when(dpp_ == 1, "Appropriate progression")
                .when(dpp_ > 1, "Large difficulty jump")
                .otherwise("Unknown progression"),
            )
            .otherwise("No prerequisite for comparison")
            .alias("prerequisite_progression_assessment"),
            F.when(
                (cdif > ad + 1) & (pr_ < 60),
                "Consider reducing course difficulty or improving support",
            )
            .when(
                (cdif < ad - 1) & (pr_ > 95),
                "Consider increasing course rigor or advancing difficulty level",
            )
            .when(wr > 20,
                  "High dropout rate suggests course may be too demanding")
            .when(aa < 70,
                  "Low engagement suggests course structure review needed")
            .when(dce > 1.5,
                  "Significant calibration error - review course design")
            .otherwise("Course difficulty appropriately calibrated")
            .alias("calibration_recommendation"),
        )
        cs_ = F.col("calibration_status")
        da_ = F.col("difficulty_assessment")
        ddp = ca_df.groupBy("department_name").agg(
            F.count(F.lit(1)).alias("total_courses"),
            F.avg(ad).alias("avg_assigned_difficulty"),
            F.avg(cdif).alias("avg_calculated_difficulty"),
            F.avg(dce).alias("avg_calibration_error"),
            F.count(F.when(cs_ == "Well Calibrated", 1)).alias(
                "well_calibrated_courses"
            ),
            F.count(F.when(da_.like("%Harder%"), 1)).alias(
                "harder_than_expected_courses"
            ),
            F.count(F.when(da_.like("%Easier%"), 1)).alias(
                "easier_than_expected_courses"
            ),
            F.round(
                F.count(F.when(cs_ == "Well Calibrated", 1)) * 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("calibration_accuracy_rate"),
        )
        ddp_j = ddp.select(
            "department_name",
            F.col("avg_assigned_difficulty").alias(
                "dept_avg_assigned_difficulty"
            ),
            F.col("avg_calculated_difficulty").alias(
                "dept_avg_calculated_difficulty"
            ),
            F.col("calibration_accuracy_rate").alias("dept_calibration_accuracy"),
        )
        dacd = F.col("dept_avg_calculated_difficulty")
        return (
            ca_df.join(F.broadcast(ddp_j), "department_name", "left")
            .select(
                "*",
                F.when(cdif > dacd + 1, "Above Department Average Difficulty")
                .when(cdif < dacd - 1, "Below Department Average Difficulty")
                .otherwise("Near Department Average Difficulty")
                .alias("relative_difficulty_in_department"),
                F.round(
                    F.when(cs_ == "Well Calibrated", 25)
                    .when(cs_ == "Moderately Calibrated", 20)
                    .when(cs_ == "Poorly Calibrated", 10)
                    .otherwise(5)
                    + F.when(pr_ >= 80, 25).when(pr_ >= 70, 20)
                    .when(pr_ >= 60, 15).otherwise(10)
                    + F.when(wr <= 10, 25).when(wr <= 15, 20)
                    .when(wr <= 20, 15).otherwise(10)
                    + F.when(aa >= 85, 25).when(aa >= 75, 20)
                    .when(aa >= 65, 15).otherwise(10),
                    0,
                ).alias("course_health_score"),
            )
            .orderBy(F.desc("difficulty_calibration_error"),
                     F.asc("course_health_score"), "course_id")
        )
