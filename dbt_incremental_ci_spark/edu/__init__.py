"""The reference's analytics workload (DEDP — 47 models over an
education star schema), re-expressed as engine models in idiomatic
PySpark. Fixtures are generated deterministically per FIXTURES.md §A
(the reference seeds tiny samples via an on-run-start hook,
DEDP/dbt_project.yml:164-213; we generate a richer corpus with the
same schema and constraints)."""

from dbt_incremental_ci_spark.edu.project import build_edu_engine, edu_registry

__all__ = ["build_edu_engine", "edu_registry"]
