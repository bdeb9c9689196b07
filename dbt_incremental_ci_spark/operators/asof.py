"""Time-series joins Spark lacks as built-ins: backward as-of join and
range (interval) join.

As-of join (``asof_join_backward``): for each left row, attach the
single most recent right row with the same key and ``right_ts <=
left_ts``. Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the
naive rewrite — equi-join + range filter + argmax — explodes to
O(|L| x matches-per-key) before the window prunes it. We instead use
the union-merge plan, the distributed equivalent of the sorted-merge
as-of algorithm:

  1. tag both sides and union them into one relation,
  2. one shuffle on the join key,
  3. within each key partition sort by (ts, side, tiebreak) and carry
     the right payload forward with ``last(ignorenulls)`` over a
     running window,
  4. keep only the left rows.

Cost is one shuffle of |L| + |R| rows and a per-key sort — no
intermediate blowup, no skew amplification beyond the key histogram
itself (AQE skew-split applies as usual). This is the plan that
survives 100 TB: the quadratic rewrite does not.

Range join (``range_join``): match right rows with ``right_ts`` in
``[left_ts + lower, left_ts + upper]``.

  - With an equi key: plain equi-join with the range residual —
    Catalyst shuffles on the key; the residual prunes inside each
    partition. Fine at scale.
  - WITHOUT an equi key Spark would plan a cartesian
    (BroadcastNestedLoopJoin), which is O(|L| x |R|). We bucket the
    time axis into bins of the window span, explode each left row to
    the <= 2 bins its window covers, and equi-join on the bin; each
    matching pair meets in exactly one bin, so no dedup pass is
    needed. This is the standard interval-bucketing plan (same idea
    Flink/KDB use for window joins).

Reference parity: the reference engine has no time-series joins; these
are part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward", "range_join"]

_SIDE = "__asof_side"
_TS = "__asof_ts"
_TB = "__asof_tb"
_PAYLOAD = "__asof_payload"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """For each left row, the most recent right row per key with
    ``right_ts <= left_ts``.

    Ties on ``right_ts`` resolve to the largest ``tiebreak`` value
    (deterministic output requires one whenever (key, right_ts) can
    repeat). ``how="inner"`` drops left rows with no match; ``"left"``
    keeps them with null payload. Payload columns must not collide
    with left column names.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(f"payload collides with left columns: {sorted(collisions)}")

    lt, rt = left.schema[left_ts].dataType, right.schema[right_ts].dataType
    if lt != rt:
        raise TypeError(f"ts dtype mismatch: left {lt} vs right {rt}")

    payload = F.struct(*[F.col(c) for c in right_payload])
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias(_TB),
        payload.alias(_PAYLOAD),
    )
    payload_type = r_tagged.schema[_PAYLOAD].dataType
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TB),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        # left payload rides along; right rows carry nulls for these
        *[c for c in left.columns if c not in on],
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Backward as-of: at equal ts the right row must precede the left
    # row (right side=0 < left side=1); among right ties the largest
    # tiebreak wins because last() takes the final non-null in order.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = carried.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col(_PAYLOAD).isNotNull())
    keep = [c for c in left.columns if c in out.columns]
    return out.select(
        *keep, *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_payload]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: int | float,
    upper: int | float,
    on: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right_ts`` in ``[left_ts + lower,
    left_ts + upper]`` (numeric ts axis, e.g. epoch nanos).

    With ``on`` keys: equi-join + residual. Without: time-bucketed
    equi-join on bins of width ``upper - lower`` so Catalyst never
    plans a cartesian; each qualifying pair meets in exactly one bin.
    Output columns: all left columns + all right columns (caller
    ensures no collisions).
    """
    if upper <= lower:
        raise ValueError("upper must exceed lower")
    collisions = set(right.columns) & set(left.columns) - set(on or [])
    if collisions:
        raise ValueError(f"column collision: {sorted(collisions)}")
    residual = (F.col(right_ts) >= F.col(left_ts) + F.lit(lower)) & (
        F.col(right_ts) <= F.col(left_ts) + F.lit(upper)
    )
    if on:
        return left.join(right, on=on, how="inner").filter(residual)

    # Bin width must be >= the window span or a window can straddle
    # more than two bins. ceil() guarantees that for float spans too
    # (a truncating int() silently dropped middle-bin pairs for
    # fractional spans, and gave width 0 for spans < 1). Exploding the
    # full sequence [lo_bin, hi_bin] keeps correctness independent of
    # the width choice; with width >= span that sequence has <= 2
    # elements, so the explosion factor is unchanged.
    width = max(1, math.ceil(upper - lower))
    lo_bin = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    hi_bin = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(width))
    l_binned = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    r_binned = right.withColumn("__bin", F.floor(F.col(right_ts) / F.lit(width)))
    return (
        l_binned.join(r_binned, on="__bin", how="inner")
        .filter(residual)
        .drop("__bin")
    )
