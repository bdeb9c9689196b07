"""Assembly of the education project: registry + engine + fixtures.

The reference's seeds (DEDP/seeds/*.csv) are loaded as seed models from
embedded literals (same data shape; the CSVs are reference content we
re-type rather than copy verbatim).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import SparkSession

from dbt_incremental_ci_spark.edu import fixtures
from dbt_incremental_ci_spark.edu.intermediate import register_intermediate
from dbt_incremental_ci_spark.edu.intermediate2 import (
    register_intermediate2,
    register_intermediate3,
)
from dbt_incremental_ci_spark.edu.intermediate3 import (
    register_intermediate4,
    register_intermediate5,
    register_intermediate6,
)
from dbt_incremental_ci_spark.edu.marts import register_marts, register_marts_finance
from dbt_incremental_ci_spark.edu.marts2 import register_marts2
from dbt_incremental_ci_spark.edu.marts3 import register_marts3, register_marts_finance2
from dbt_incremental_ci_spark.edu.marts4 import register_marts4, register_marts5
from dbt_incremental_ci_spark.edu.marts5 import register_marts6, register_marts7
from dbt_incremental_ci_spark.edu.marts_ews import register_marts_ews
from dbt_incremental_ci_spark.edu.marts_ied import register_marts_ied
from dbt_incremental_ci_spark.edu.marts_bench import register_marts_bench
from dbt_incremental_ci_spark.edu.marts_budget import (
    register_marts_budget,
    register_marts_revenue,
    register_marts_calibration,
)
from dbt_incremental_ci_spark.edu.seeds import register_seeds
from dbt_incremental_ci_spark.edu.staging import register_staging
from dbt_incremental_ci_spark.edu.tests_models import register_tests
from dbt_incremental_ci_spark.plans.registry import ModelRegistry
from dbt_incremental_ci_spark.plans.runner import Engine


def edu_registry() -> ModelRegistry:
    reg = ModelRegistry()
    register_seeds(reg)
    register_staging(reg)
    register_intermediate(reg)
    register_intermediate2(reg)
    register_intermediate3(reg)
    register_intermediate4(reg)
    register_intermediate5(reg)
    register_intermediate6(reg)
    register_marts(reg)
    register_marts_finance(reg)
    register_marts2(reg)
    register_marts3(reg)
    register_marts_finance2(reg)
    register_marts4(reg)
    register_marts5(reg)
    register_marts6(reg)
    register_marts_ews(reg)
    register_marts7(reg)
    register_marts_ied(reg)
    register_marts_bench(reg)
    register_marts_budget(reg)
    register_marts_revenue(reg)
    register_marts_calibration(reg)
    register_tests(reg)
    return reg


def build_edu_engine(
    spark: SparkSession,
    schema: str = "edu",
    run_date: date | None = None,
    fixture_sizes: dict | None = None,
) -> Engine:
    pdfs = fixtures.generate_raw_edu(**(fixture_sizes or {}))
    sources = fixtures.to_spark(spark, pdfs)
    return Engine(
        spark,
        edu_registry(),
        schema=schema,
        sources=sources,
        run_date=run_date or fixtures.RUN_DATE,
    )
