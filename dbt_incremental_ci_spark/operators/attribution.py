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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _conv_touch_pairs(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    channel_col: str,
    lookback: int,
    id_col: str | None,
) -> DataFrame:
    """Shared pair frame: (conversion id, value micro-units, touch ts,
    channel) — user-keyed join + lookback range, the per-user activity
    bound all attribution models run on."""
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
    return c.join(tch, "__u").filter(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.lit(lookback))
    )


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
    pairs = _conv_touch_pairs(
        conversions, touches, user_col, ts_col, value_col, channel_col,
        lookback, id_col,
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


def _channel_rollup(shared: DataFrame, channel_col: str) -> DataFrame:
    """(channel, touches, conversions, attributed_micro, attributed)
    from a pair frame carrying integer ``__share`` micro-units."""
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


def position_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    channel_col: str,
    lookback: int,
    id_col: str | None = None,
) -> DataFrame:
    """U-shaped (position-based) attribution: first touch 40%, last
    touch 40%, the middle touches split the remaining 20% equally; a
    single touch takes 100%, exactly two touches take 50/50 (the
    standard 40/20/40 convention degenerates to equal split when there
    is no middle).

    Same pair frame and integer micro-unit exactness as
    :func:`linear_attribution`; positions come from a per-conversion
    window ordered (ts, channel) — bounded by the user's touch count,
    with a deterministic tie-break so "first"/"last" reproduce
    cross-engine. Sub-micro remainders are dropped (never
    order-dependently assigned).
    """
    pairs = _conv_touch_pairs(
        conversions, touches, user_col, ts_col, value_col, channel_col,
        lookback, id_col,
    )
    w = Window.partitionBy("__cid").orderBy(
        F.col("__tts").asc(), F.col("__ch").asc()
    )
    ranked = pairs.select(
        "*",
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(Window.partitionBy("__cid")).alias("__n"),
    )
    first_last = (F.col("__pos") == 1) | (F.col("__pos") == F.col("__n"))
    share = (
        F.when(F.col("__n") == 1, F.col("__vm"))
        .when(
            F.col("__n") == 2, F.expr("(__vm * 50) div 100")
        )
        .when(first_last, F.expr("(__vm * 40) div 100"))
        .otherwise(F.expr("((__vm * 20) div 100) div (__n - 2)"))
    )
    return _channel_rollup(ranked.withColumn("__share", share), channel_col)


def time_decay_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    channel_col: str,
    lookback: int,
    half_life: int,
    id_col: str | None = None,
) -> DataFrame:
    """Exponential time-decay attribution: touch weight halves every
    ``half_life`` time units of age (2^(−age/half_life)), shares
    proportional to weight.

    Exactness: the IEEE double weight is quantized to integer
    micro-weights (round-6 decimal) BEFORE the per-conversion
    normalization, so the weight sum is an associative bigint sum and
    every share is ``(value_micro · w_micro) div Σw_micro`` — integer
    arithmetic end to end, bit-identical on any partitioning/engine
    (the double 2^x itself reproduces: both engines evaluate the same
    pow on the same integer-ratio exponent).
    """
    pairs = _conv_touch_pairs(
        conversions, touches, user_col, ts_col, value_col, channel_col,
        lookback, id_col,
    )
    age = (F.col("__cts") - F.col("__tts")).cast("double")
    w = F.pow(F.lit(2.0), -age / F.lit(float(half_life)))
    weighted = pairs.withColumn(
        "__wm",
        (F.round(w, 6).cast("decimal(9,6)") * 1_000_000).cast("bigint"),
    )
    per_conv = weighted.groupBy("__cid").agg(F.sum("__wm").alias("__wsum"))
    shared = weighted.join(per_conv, "__cid").withColumn(
        "__share", F.expr("(__vm * __wm) div __wsum")
    )
    return _channel_rollup(shared, channel_col)
