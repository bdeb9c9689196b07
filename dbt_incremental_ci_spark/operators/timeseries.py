"""Time-series regularization: per-key calendar spines, gap
materialization, and forward fill — the resampling step every
event-stream feature pipeline needs before windowed modeling (a
gap-free per-entity daily grid with last-observation-carried-forward).

Scale design: the spine is generated PER KEY from that key's own
[min, max] bucket range (`sequence` + explode — map-only after one
per-key min/max aggregate), so spine size is output-sized, never
|keys| × |global range|. The fill is a per-key ordered window
(`last(…, ignorenulls)` over unbounded-preceding) — per-key state
only, embarrassingly parallel across keys; at 100 TB the shuffle is
one hash partition by key, and AQE handles key-count skew. Measure
sums go through decimal casts so grouped sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NANOS_PER_DAY = 86_400_000_000_000


def day_bucket(ts_nanos: Column | str) -> Column:
    """Epoch-day bucket from the house BIGINT-nanos timestamp."""
    c = F.col(ts_nanos) if isinstance(ts_nanos, str) else ts_nanos
    return F.floor(c / F.lit(NANOS_PER_DAY)).cast("bigint")


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    ts_nanos_col: str,
    value_col: str,
    bucket_nanos: int = NANOS_PER_DAY,
) -> DataFrame:
    """(key, bucket, observed, is_gap, filled): a dense per-key bucket
    grid over each key's own observed range; ``observed`` is that
    bucket's decimal-exact value sum (NULL on gaps), ``filled`` its
    forward fill. The first bucket per key is always observed, so
    ``filled`` is never NULL."""
    c = F.col(ts_nanos_col)
    bucketed = (
        df.select(
            F.col(key_col),
            F.floor(c / F.lit(bucket_nanos)).cast("bigint").alias("bucket"),
            F.col(value_col).cast("decimal(18,2)").alias("__v"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.sum("__v").alias("__obs"))
    )
    spine = (
        bucketed.groupBy(key_col)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence("__lo", "__hi")).alias("bucket"),
        )
    )
    grid = spine.join(bucketed, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        key_col,
        "bucket",
        F.col("__obs").cast("double").alias("observed"),
        F.col("__obs").isNull().alias("is_gap"),
        F.last("__obs", ignorenulls=True).over(w).cast("double").alias(
            "filled"
        ),
    )
