"""Column profiling: one-pass data-quality summary of a DataFrame
(the ANALYZE/data-audit step every ingestion pipeline runs before
training-data jobs trust a new source).

Per column: row count, null count/fraction, distinct count, min and
max — emitted as one ROW PER COLUMN so downstream checks can join
against expectation tables.

Scale shape: ONE aggregation pass computes every statistic (the
per-column expressions all fold into a single global hash aggregate
with map-side partials); the row-per-column pivot happens on the
resulting single row via ``stack`` — driver never sees the data.
``exact_distinct=False`` (the 100 TB default) uses
``approx_count_distinct`` (HLL, mergeable, single pass);
``exact_distinct=True`` is the oracle-able mode — Spark expands to
one pass per distinct-counted column, acceptable for audit jobs and
exactly what the DuckDB twin computes.

Min/max canonicalization (so value hashes compare across engines):
floating columns are cast to ``decimal(18,2)`` BEFORE min/max and the
result rendered as a fixed-two-decimal string — double-to-string
formatting differs between engines, decimal-to-string does not.
Integers, strings, and dates render via their native cast to string.

No counterpart in the reference repo; part of the data-quality
operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(c: str, dtype: str, agg) -> F.Column:
    if dtype in ("double", "float"):
        return agg(F.col(c).cast("decimal(18,2)")).cast("string")
    return agg(F.col(c)).cast("string")


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_frac, n_distinct,
    min_val, max_val) — one row per profiled column."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")
    dtypes = {c: df.schema[c].dataType.simpleString() for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            _canon(c, dtypes[c], F.min).alias(f"__min_{c}"),
            _canon(c, dtypes[c], F.max).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    stacked = row.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, dtype, n_nonnull, n_distinct, min_val, max_val)"
        ),
    )
    return stacked.select(
        "column",
        "dtype",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("n_nonnull")).alias("n_nulls"),
        F.round(
            F.when(
                F.col("__n") > 0,
                (F.col("__n") - F.col("n_nonnull")) / F.col("__n").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("null_frac"),
        "n_distinct",
        "min_val",
        "max_val",
    )
