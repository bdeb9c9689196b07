"""Expression library: Postgres-compat shims + the reference's macro surface.

The reference has ZERO runtime UDFs (SURVEY §2.10) — its entire function
surface is SQL scalar functions plus four Jinja macros. We mirror that:
every function here returns a pyspark ``Column`` expression built from
``pyspark.sql.functions``, so everything stays inside whole-stage codegen
and remains pushdown/prune-friendly. No Python UDFs in this module.
"""

from dbt_incremental_ci_spark.functions.pg import (
    age_years,
    ilike,
    int_div,
    pg_dow,
    pg_round,
    safe_div,
    years_between,
)
from dbt_incremental_ci_spark.functions.agg import (
    string_agg_distinct,
    string_agg_ordered,
)
from dbt_incremental_ci_spark.functions.macros import (
    academic_year_from_date,
    calculate_gpa,
    grade_point_calculator,
)

__all__ = [
    "age_years",
    "ilike",
    "int_div",
    "pg_dow",
    "pg_round",
    "safe_div",
    "years_between",
    "string_agg_distinct",
    "string_agg_ordered",
    "academic_year_from_date",
    "calculate_gpa",
    "grade_point_calculator",
]
