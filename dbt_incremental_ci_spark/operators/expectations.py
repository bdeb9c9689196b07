"""Generic data-quality expectation suite — the dbt generic tests
(``not_null``, ``unique``, ``accepted_values``, ``relationships``;
ref TESTS/ usage throughout the reference project's schema.yml files)
as ONE composable operator that returns a violation count per check
instead of failing a build.

Each check compiles to a small aggregate over the checked frame:

- ``not_null``      → count of NULL rows in the column
- ``unique``        → count of rows beyond the first per duplicated
                      value (``sum(cnt - 1)`` over value groups —
                      dbt's count of "excess" rows)
- ``accepted_values`` → count of rows whose value is outside the list
                      (NULLs are not violations, matching dbt)
- ``relationships`` → count of child rows whose non-null key has no
                      parent (left-anti join; NULL keys pass, the SQL
                      standard FK semantics `quality.fk_violations`
                      also follows)

Scale: every check is one hash aggregate (or one anti-join) emitting a
single row; the suite unions O(#checks) single-row frames. No check
materializes violating ROWS — counts only — so output is bounded by
the suite size at any corpus scale.

Reference parity: SRC's CI engine runs dbt test selections as part of
`modified+` closures; this operator is the engine-side equivalent the
reference delegates to dbt core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one(spark_df: DataFrame, name: str, violations_col) -> DataFrame:
    return spark_df.agg(violations_col.alias("violations")).select(
        F.lit(name).alias("check_name"),
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return _one(
        df,
        name or f"not_null:{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    grp = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return _one(
        grp, name or f"unique:{col}", F.sum(F.col("__c") - 1)
    ).withColumn(
        "violations", F.coalesce(F.col("violations"), F.lit(0)).cast("bigint")
    ).withColumn("passed", F.col("violations") == 0)


def accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    return _one(
        df,
        name or f"accepted_values:{col}",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(values), 1
            ).otherwise(0)
        ),
    )


def relationships(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    orphans = child.filter(F.col(child_col).isNotNull()).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return _one(
        orphans,
        name or f"relationships:{child_col}",
        F.count(F.lit(1)),
    )


def suite(checks: list[DataFrame]) -> DataFrame:
    """Union the single-row check frames into the suite report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
