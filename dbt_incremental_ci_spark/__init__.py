"""dbt_incremental_ci_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference `ponderedw/dbt-incremental-ci` (a dbt slim-CI tool plus a
47-model analytics warehouse), re-expressed Spark-first:

- ``plans``        — model registry, DAG runner, materializations
                     (the dbt-compiler analogue; ref SRC/core.py).
- ``functions``    — Postgres-compat Column-expression shims and the
                     reference's macro surface as expression builders
                     (ref DEDP/macros/*.sql).
- ``sources``      — typed source/seed catalog over Parquet/CSV.
- ``incremental``  — watermark + unique-key MERGE materialization
                     (ref DEDP/models/marts/core/
                     student_enrollment_history_incremental.sql).
- ``ci``           — slim-CI state diff + selective table copy
                     (ref SRC/dbt_helper.py, SRC/copier.py).
- ``operators``    — scale extensions: dedup, similarity search,
                     text analysis, multimodal plumbing.
- ``streaming``    — Structured Streaming analogue of the incremental
                     pipeline.

Everything is built on the public Apache Spark DataFrame/SQL API;
Catalyst + AQE do the physical planning.
"""

__version__ = "0.1.0"
