"""Event sequence-pattern matching — the MATCH_RECOGNIZE-lite
primitive ("A followed by B within T, with no C in between") that
funnels (q79), sessionization (q30), and as-of attribution (q47)
don't cover: those aggregate per user, this one emits the MATCHED
EVENT PAIRS themselves, one row per (A-event, first qualifying
B-event).

Semantics (deterministic, engine-portable):

- for every A-event, the candidate match is the FIRST B-event of the
  same key with ``ts_a < ts_b <= ts_a + within`` (ties on ts broken by
  event id — a unique total order, so "first" is well-defined);
- the match survives only if no C-event (the ``veto`` type) of the
  same key lies STRICTLY between ``ts_a`` and the matched ``ts_b``.

This is the `A (NOT C)* B` regex over per-key event streams — the
shape behind conversion tracing ("view then purchase within an hour,
uninterrupted by an error"), retry detection, and SLA breach pairing.

Scale design: everything is keyed by the stream key — one hash
shuffle class, AQE-skew-handled. The A×B candidate join is bounded by
the time window (``within``) per key, the same bound the as-of
operator's range join relies on; the first-match reduction is a
per-A-event min-struct aggregate (map-side combined); the veto is a
LEFT ANTI join, Spark's native NOT EXISTS — no correlated subquery,
no per-row Python, no window over an unbounded frame. At 100 TB, hot
keys fan out at most |A_key| × |B_key ∩ window| — for pathological
single-key streams, pre-split by coarse time bucket first (the
``asof.py`` binning pattern).

No counterpart in the reference repo; part of the training-data /
event-analytics surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_match_pattern(
    events: DataFrame,
    a_type: str,
    b_type: str,
    within: int,
    veto: str | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Matched (A, first-B) event pairs per key.

    Output: ``(key, a_id, a_ts, b_id, b_ts, gap)`` with
    ``gap = b_ts - a_ts`` in ``ts_col`` units (house contract: BIGINT
    nanoseconds), one row per A-event that found a surviving match.
    """
    if within <= 0:
        raise ValueError(f"within must be positive, got {within}")
    a = events.filter(F.col(type_col) == a_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
    )
    b = events.filter(F.col(type_col) == b_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
    )
    cand = a.join(b, "key").filter(
        (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.lit(within))
    )
    first = (
        cand.groupBy("key", "a_id", "a_ts")
        .agg(F.min(F.struct("b_ts", "b_id")).alias("__m"))
        .select(
            "key",
            "a_id",
            "a_ts",
            F.col("__m.b_id").alias("b_id"),
            F.col("__m.b_ts").alias("b_ts"),
        )
    )
    if veto is not None:
        c = events.filter(F.col(type_col) == veto).select(
            F.col(key_col).alias("key"), F.col(ts_col).alias("c_ts")
        )
        first = first.join(
            c,
            on=[
                first["key"] == c["key"],
                c["c_ts"] > first["a_ts"],
                c["c_ts"] < first["b_ts"],
            ],
            how="left_anti",
        )
    return first.select(
        F.col("key").alias(key_col),
        "a_id",
        "a_ts",
        "b_id",
        "b_ts",
        (F.col("b_ts") - F.col("a_ts")).alias("gap"),
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Sequential funnel: how many users reach step i, where reaching
    step i means an event of type ``steps[i]`` STRICTLY AFTER the
    user's step-(i-1) time (first qualifying occurrence counts). The
    product-analytics staple (view -> click -> purchase).

    Shape: one filtered min-aggregate per step plus a user-keyed
    equi-join per subsequent step — each join's right side is the
    (shrinking) set of users still in the funnel, so total cost is
    O(len(steps)) linear passes with key-hash shuffles only; the
    conversion-rate pass runs on a len(steps)-row frame. Output:
    ``(step_idx, step, users, conv_from_prev, conv_from_first)`` —
    rates rounded to 6, NULL on the first step.
    """
    if len(steps) < 2:
        raise ValueError("need >= 2 steps")
    u, ts, et = F.col(user_col), F.col(ts_col), F.col(type_col)
    spark = df.sparkSession
    per_step = []
    cur = None
    for i, s in enumerate(steps):
        ev = df.filter(et == s).select(u.alias("__u"), ts.alias("__ts"))
        if cur is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(cur.select("__u", F.col("__t").alias("__pt")), "__u")
                .filter(F.col("__ts") > F.col("__pt"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        # Each `cur` feeds TWO plan branches (its own count aggregate
        # below and the next step's join); without lineage truncation
        # the chained plan rescans the events input O(steps^2) times
        # (round-4 ADVICE; same pathology fixed in robust.py/packing.py
        # — docs/SCALE.md 6l).
        cur = cur.localCheckpoint(eager=False)
        per_step.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col("users").cast("bigint").alias("users"),
            )
        )
    allsteps = per_step[0]
    for frame in per_step[1:]:
        allsteps = allsteps.unionByName(frame)
    w = Window.orderBy("step_idx").rowsBetween(-1, -1)
    # len(steps)-row frame — the deliberate tiny single-task window
    first = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.sum("users").over(w)
    fst = F.first("users").over(first)
    return allsteps.select(
        "step_idx",
        "step",
        "users",
        F.when(prev > 0, F.round(F.col("users") / prev, 6)).alias(
            "conv_from_prev"
        ),
        F.when(
            (F.col("step_idx") > 0) & (fst > 0),
            F.round(F.col("users") / fst, 6),
        ).alias("conv_from_first"),
    )
