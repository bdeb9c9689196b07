"""Interval union (gaps-and-islands): merge overlapping [start, end]
spans per key into maximal disjoint islands.

The classic warehouse op the reference's workload gestures at with
sessionization (SURVEY.md §2 window family) but never closes:
sessionize groups POINT events by inactivity timeout; this merges
SPANS by actual overlap — coverage windows, on-call shifts, document
span bookkeeping (`ngrams.remove_boilerplate_spans` flags spans;
this unions them), GPU-reservation accounting.

Algorithm — the cummax sweep (standard gaps-and-islands, e.g. Itzik
Ben-Gan's interval-packing formulation): per key, order intervals by
(start, end); an interval starts a NEW island iff its start exceeds
the running max end of all earlier intervals; island id = running
count of new-island flags; then one hash agg per island.

Scale design (the 100 TB story):

- One shuffle on the key; both window passes share the single sort
  (same window spec), and the final groupBy is a hash agg on
  (key, island). Window state is O(1) per row (running max / running
  sum), never buffered-partition-sized.
- Per-key window width is that key's interval count — the same skew
  contract as every sessionize/window op here; a single global key
  would need pre-splitting (q50's salting) first.
- Integer/timestamp arithmetic only — no floats, exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximal disjoint islands of the union of ``[start, end]``
    intervals per key (touching intervals — next start == current
    end — merge, matching closed-interval semantics).

    Output: ``<key>, island_start, island_end, n_spans`` one row per
    island. Rows with end < start are rejected loudly rather than
    silently producing negative spans.
    """
    s, e = F.col(start_col), F.col(end_col)
    checked = df.withColumn(
        "__e",
        F.when(e >= s, e).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("merge_intervals: end < start for key="),
                    F.col(key_col).cast("string"),
                )
            )
        ),
    )
    w = Window.partitionBy(key_col).orderBy(start_col, "__e")
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = checked.withColumn(
        "__island",
        F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max("__e").alias("island_end"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .drop("__island")
    )


def covered_total(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Total covered span length per key (sum of island extents) plus
    island count — overlap-free by construction."""
    islands = merge_intervals(df, key_col, start_col, end_col)
    return islands.groupBy(key_col).agg(
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
    )


def max_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak concurrent intervals per key (capacity planning: max
    simultaneous sessions/connections/jobs) — the sweep line: each
    interval contributes (+1 at start, −1 at end), the running sum in
    time order is the live concurrency, its max the answer. Ends sort
    BEFORE starts at the same instant (half-open [start, end)
    semantics).

    Per-key ordered windows only — state bounded by a key's event
    count, never corpus-sized; the output is one row per key with the
    peak and the EARLIEST instant it is reached (deterministic argmax
    via min-ts-at-max). Exact integer arithmetic throughout.
    """
    pts = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).alias("__t"),
        F.lit(1).alias("__d"),
    ).unionByName(
        df.select(
            F.col(key_col).alias("__k"),
            F.col(end_col).alias("__t"),
            F.lit(-1).alias("__d"),
        )
    )
    w = Window.partitionBy("__k").orderBy(
        F.col("__t").asc(), F.col("__d").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    live = pts.withColumn("__live", F.sum("__d").over(w))
    return (
        live.groupBy("__k")
        .agg(
            F.max("__live").alias("peak"),
            F.min_by(F.struct("__t", "__live"), F.struct((-F.col("__live")).alias("n"), F.col("__t"))).alias("__arg"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("peak").cast("bigint").alias("peak"),
            F.col("__arg.__t").alias("peak_ts"),
        )
    )


def max_concurrency_sql(
    table_expr: str, key_col: str, start_col: str, end_col: str
) -> str:
    """DuckDB twin of :func:`max_concurrency`."""
    return f"""
    WITH pts AS (
      SELECT {key_col} AS k, {start_col} AS t, 1 AS d FROM {table_expr}
      UNION ALL
      SELECT {key_col} AS k, {end_col} AS t, -1 AS d FROM {table_expr}
    ),
    live AS (
      SELECT k, t,
             sum(d) OVER (PARTITION BY k ORDER BY t ASC, d ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS live
      FROM pts
    ),
    sel AS (
      SELECT k, t, live, max(live) OVER (PARTITION BY k) AS mx FROM live
    )
    SELECT k AS {key_col},
           CAST(mx AS BIGINT) AS peak,
           min(t) AS peak_ts
    FROM sel WHERE live = mx
    GROUP BY k, mx
    """


def overlap_pairs(
    intervals: DataFrame,
    id_col: str = "iv_id",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval-overlap RANGE JOIN — where :func:`merge_intervals` /
    :func:`max_concurrency` reduce overlaps per key, this PRODUCES the
    overlapping pairs themselves, the range-join shape Spark lacks as
    a built-in, expressed the scalable way: bucket each interval by
    fixed-width buckets (``F.sequence`` explode, fan-out
    ceil(len/bucket_width)+1 — pick ``bucket_width`` near the typical
    interval length so it stays O(1)), equi-join on the bucket, verify
    the exact predicate, and count each pair exactly once at the
    bucket of the LATER start (every overlapping pair shares that
    bucket by construction, so no distinct is needed — the standard
    dedup trick for bucketed spatial/range joins).

    All pairs of HALF-OPEN intervals [start, end) with
    ``a.start < b.end AND b.start < a.end``, each once with
    ``id_a < id_b``. Inputs: one row per interval, ``id_col`` unique,
    start/end integer (any unit; ``bucket_width`` the same unit).
    Extra columns survive prefixed ``a_``/``b_``.

    Scale shape: the only shuffle is the bucket equi-join; no
    all-pairs product ever reaches the planner. Skewed buckets (a hot
    hour) are AQE's skew-join case; a broadcast never applies — both
    sides are data-sized.

    Output: ``id_a, id_b, ov_start, ov_end, overlap`` (> 0).
    """
    base_cols = [id_col, start_col, end_col]
    extra = [c for c in intervals.columns if c not in base_cols]

    # Degenerate/empty intervals (end <= start) violate the half-open
    # contract: a start on a bucket boundary makes the F.sequence below
    # DESCEND (floor((e-1)/W) < floor(s/W)), and empty intervals could
    # emit pairs with overlap == 0 against the docstring's "> 0"
    # (round-8 ADVICE item 2). Drop them up front — an empty [s, s)
    # interval overlaps nothing under the strict predicate anyway.
    intervals = intervals.where(
        F.col(end_col).cast("bigint") > F.col(start_col).cast("bigint")
    )

    def side(tag: str) -> DataFrame:
        d = intervals.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(start_col).cast("bigint").alias(f"{tag}_s"),
            F.col(end_col).cast("bigint").alias(f"{tag}_e"),
            *[F.col(c).alias(f"{tag}_{c}") for c in extra],
        )
        return d.withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{tag}_s") / bucket_width),
                    F.floor((F.col(f"{tag}_e") - 1) / bucket_width),
                )
            ),
        )

    a, b = side("a"), side("b")
    joined = a.join(b, "__bkt").where(
        (F.col("a_id") < F.col("b_id"))
        & (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e"))
    )
    later_start = F.greatest(F.col("a_s"), F.col("b_s"))
    once = joined.where(
        F.col("__bkt") == F.floor(later_start / bucket_width)
    )
    return once.select(
        F.col("a_id").alias("id_a"),
        F.col("b_id").alias("id_b"),
        later_start.alias("ov_start"),
        F.least(F.col("a_e"), F.col("b_e")).alias("ov_end"),
        (
            F.least(F.col("a_e"), F.col("b_e")) - later_start
        ).alias("overlap"),
        *[F.col(f"a_{c}") for c in extra],
        *[F.col(f"b_{c}") for c in extra],
    )
