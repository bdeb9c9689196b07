"""The reference's three seeds as seed models (data re-typed from
DEDP/seeds/*.csv — FIXTURES.md §A2 'load verbatim')."""

from __future__ import annotations

from pyspark.sql import DataFrame

from dbt_incremental_ci_spark.plans.registry import ModelRegistry

_SEMESTER_CALENDAR = [
    # semester_name, academic_year, semester_type, start, end,
    # registration_deadline, withdrawal_deadline, finals_start, finals_end
    ("Fall 2023", "2023-2024", "Fall", "2023-08-28", "2023-12-15", "2023-08-25",
     "2023-10-15", "2023-12-11", "2023-12-15"),
    ("Spring 2024", "2023-2024", "Spring", "2024-01-15", "2024-05-10", "2024-01-12",
     "2024-03-15", "2024-05-06", "2024-05-10"),
    ("Summer 2024", "2023-2024", "Summer", "2024-06-03", "2024-07-26", "2024-05-31",
     "2024-06-24", "2024-07-22", "2024-07-26"),
    ("Fall 2024", "2024-2025", "Fall", "2024-08-26", "2024-12-13", "2024-08-23",
     "2024-10-14", "2024-12-09", "2024-12-13"),
    ("Spring 2025", "2024-2025", "Spring", "2025-01-13", "2025-05-08", "2025-01-10",
     "2025-03-14", "2025-05-04", "2025-05-08"),
    ("Summer 2025", "2024-2025", "Summer", "2025-06-02", "2025-07-25", "2025-05-30",
     "2025-06-23", "2025-07-21", "2025-07-25"),
]

_GRADE_SCALE = [
    ("A+", 4.0, 97, 100, "Exceptional"), ("A", 4.0, 93, 96, "Excellent"),
    ("A-", 3.7, 90, 92, "Very Good"), ("B+", 3.3, 87, 89, "Good Plus"),
    ("B", 3.0, 83, 86, "Good"), ("B-", 2.7, 80, 82, "Good Minus"),
    ("C+", 2.3, 77, 79, "Satisfactory Plus"), ("C", 2.0, 73, 76, "Satisfactory"),
    ("C-", 1.7, 70, 72, "Satisfactory Minus"), ("D+", 1.3, 67, 69, "Poor Plus"),
    ("D", 1.0, 63, 66, "Poor"), ("D-", 0.7, 60, 62, "Poor Minus"),
    ("F", 0.0, 0, 59, "Failing"), ("W", None, None, None, "Withdrawn"),
    ("I", None, None, None, "Incomplete"), ("P", None, None, None, "Pass"),
    ("NP", None, None, None, "No Pass"),
]

_HOLIDAYS = [
    ("New Years Day", "2024-01-01", "Federal Holiday", True),
    ("Martin Luther King Jr Day", "2024-01-15", "Federal Holiday", True),
    ("Presidents Day", "2024-02-19", "Federal Holiday", False),
    ("Spring Break Week", "2024-03-11", "Academic Break", True),
    ("Memorial Day", "2024-05-27", "Federal Holiday", False),
    ("Independence Day", "2024-07-04", "Federal Holiday", True),
    ("Labor Day", "2024-09-02", "Federal Holiday", False),
    ("Thanksgiving Break", "2024-11-28", "Academic Break", True),
    ("Winter Break Start", "2024-12-16", "Academic Break", True),
]


def register_seeds(reg: ModelRegistry) -> None:
    @reg.model("semester_calendar", materialized="table", resource_type="seed")
    def semester_calendar(ctx) -> DataFrame:
        df = ctx.spark.createDataFrame(
            _SEMESTER_CALENDAR,
            "semester_name string, academic_year string, semester_type string, "
            "start_date string, end_date string, registration_deadline string, "
            "withdrawal_deadline string, final_exams_start string, "
            "final_exams_end string",
        )
        for c in ("start_date", "end_date", "registration_deadline",
                  "withdrawal_deadline", "final_exams_start", "final_exams_end"):
            df = df.withColumn(c, df[c].cast("date"))
        return df

    @reg.model("grade_scale_reference", materialized="table", resource_type="seed")
    def grade_scale_reference(ctx) -> DataFrame:
        return ctx.spark.createDataFrame(
            _GRADE_SCALE,
            "grade_letter string, grade_points double, min_percentage int, "
            "max_percentage int, description string",
        )

    @reg.model("academic_calendar_holidays", materialized="table",
               resource_type="seed")
    def academic_calendar_holidays(ctx) -> DataFrame:
        df = ctx.spark.createDataFrame(
            _HOLIDAYS,
            "holiday_name string, holiday_date string, holiday_type string, "
            "affects_classes boolean",
        )
        return df.withColumn("holiday_date", df["holiday_date"].cast("date"))
