"""Robust per-group statistics for corpus/feature auditing: exact
median + MAD (median absolute deviation), modified-z outlier flags
(Iglewicz–Hoaglin 0.6745·(x−med)/MAD > 3.5), and percentile
winsorization.

This is the exact-stats complement to the engine's mergeable-sketch
path (GK/approx_percentile in q46/q49): exact percentiles shuffle each
group's values once per pass, which is the right trade for audit-grade
numbers on grouped slices; pipelines that only need screening cutoffs
at 100 TB should use the sketch route instead. Two passes are
inherent (MAD needs the median joined back); both are plain shuffled
aggregates with map-side combine, and the per-group stats table that
joins back onto rows is GROUP-cardinality-sized — broadcastable via
AQE, never forced.

Cross-engine determinism: Spark ``percentile`` and DuckDB
``quantile_cont`` both linearly interpolate the same sorted doubles,
so medians/percentiles are bit-identical; derived thresholds are
continuous functions of them (boundary equality is measure-zero), and
reported means go through decimal casts before summation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_robust_stats(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group…, med, mad, p05, p95) exact robust location/scale."""
    v = F.col(value_col).cast("double")
    first = (
        df.groupBy(*group_cols)
        .agg(
            # ONE percentile buffer for all three points — three
            # separate percentile() aggs each collect their own copy
            # of every group value
            F.expr(
                f"percentile({value_col}, array(0.05, 0.5, 0.95))"
            ).alias("__p")
        )
        .select(
            *group_cols,
            F.col("__p")[1].alias("med"),
            F.col("__p")[0].alias("p05"),
            F.col("__p")[2].alias("p95"),
        )
    ).localCheckpoint(eager=False)
    # ^ group-cardinality rows, but its parent is an exact-percentile
    # object aggregate over every row; the deviations pass AND the
    # final stats join both reference it — truncate so the percentile
    # pass runs once (part of q121 7.0 s -> 2.3 s at sf0.1)
    devs = df.join(first, group_cols).select(
        *group_cols, F.abs(v - F.col("med")).alias("__dev")
    )
    mad = devs.groupBy(*group_cols).agg(
        F.expr("percentile(__dev, 0.5)").alias("mad")
    )
    return first.join(mad, group_cols)


def flag_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_cut: float = 3.5,
) -> DataFrame:
    """Rows + ``is_outlier`` via the modified z-score: |x − med| >
    z_cut · MAD / 0.6745. Groups with MAD = 0 flag nothing (the
    conventional degenerate-scale behavior)."""
    stats = group_robust_stats(df, group_cols, value_col).localCheckpoint(
        eager=False
    )
    v = F.col(value_col).cast("double")
    thresh = F.lit(z_cut) * F.col("mad") / F.lit(0.6745)
    return df.join(stats, group_cols).withColumn(
        "is_outlier",
        (F.col("mad") > 0) & (F.abs(v - F.col("med")) > thresh),
    )


def winsorize(value: Column, lo: Column, hi: Column) -> Column:
    """Clip to [lo, hi] — pure expression, map-only once the per-group
    percentile bounds are joined in."""
    return F.least(F.greatest(value, lo), hi)
