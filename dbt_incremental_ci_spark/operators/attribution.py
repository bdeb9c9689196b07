"""Multi-touch marketing attribution — split each conversion's value
across the touchpoints that preceded it inside a lookback window
(linear attribution: equal shares; position/time-decay weighting sits
on the same pair frame).

Scale shape: one user-keyed equi-join between conversions and touches
(shuffle on the user key only), a range predicate map-side, a
per-conversion count (hash aggregate, conversion-keyed), and a final
channel-keyed aggregate whose output is |channels| rows. Nothing
pair-quadratic: each conversion joins only ITS user's touches, so pair
volume is sum over users of conv_u × touch_u — the per-user activity
bound, not a corpus product (the q149/q173 event-join class).

Determinism: conversion values are quantized to integer micro-units
(round-6 decimal cast) and each touch receives ``value_micro div n``
(integer floor division) — bigint sums are associative, so the
per-channel totals reproduce bit-for-bit on any partitioning/engine;
the sub-micro remainder of each conversion (< n micro-units) is
deliberately dropped rather than order-dependently assigned.

No counterpart in the reference repo; part of the event-analytics
surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    channel_col: str,
    lookback: int,
    id_col: str | None = None,
) -> DataFrame:
    """Per-channel linearly-attributed conversion value.

    ``conversions``: (user, ts, value); ``touches``: (user, ts,
    channel). A touch participates in a conversion iff it is the same
    user's and ``conv_ts - lookback <= touch_ts < conv_ts``
    (timestamps are the engine's bigint epoch-nanos contract).
    ``id_col`` disambiguates conversions sharing (user, ts) — pass an
    event id whenever the source can produce same-instant duplicates.
    Output: ``(channel, touches, conversions, attributed_micro,
    attributed)`` — ``attributed`` = micro-units / 1e6 rounded 6;
    ``conversions`` counts DISTINCT conversions the channel touched.
    """
    id_parts = [F.col(user_col), F.col(ts_col)] + (
        [F.col(id_col)] if id_col else []
    )
    c = conversions.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        (
            F.round(F.col(value_col), 6).cast("decimal(18,6)") * 1_000_000
        ).cast("bigint").alias("__vm"),
        F.concat_ws(":", *id_parts).alias("__cid"),
    )
    tch = touches.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(channel_col).alias("__ch"),
    )
    pairs = c.join(tch, "__u").filter(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.lit(lookback))
    )
    per_conv = pairs.groupBy("__cid").agg(F.count(F.lit(1)).alias("__n"))
    shared = pairs.join(per_conv, "__cid").withColumn(
        "__share", F.expr("__vm div __n")
    )
    return (
        shared.groupBy(F.col("__ch").alias(channel_col))
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.count_distinct("__cid").alias("conversions"),
            F.sum("__share").alias("attributed_micro"),
        )
        .select(
            channel_col,
            F.col("touches").cast("bigint").alias("touches"),
            F.col("conversions").cast("bigint").alias("conversions"),
            F.col("attributed_micro").cast("bigint").alias(
                "attributed_micro"
            ),
            F.round(F.col("attributed_micro") / 1_000_000.0, 6).alias(
                "attributed"
            ),
        )
    )
