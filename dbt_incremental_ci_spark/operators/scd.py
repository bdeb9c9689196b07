"""Slowly-changing-dimension (SCD Type 2) history build.

The reference is a dbt CI tool (ref: SRC/core.py — it classifies
``snapshot`` materializations alongside incrementals for CI copying);
dbt's snapshot materialization is the canonical SCD2 producer. This
module implements the two halves Spark-first:

- :func:`scd2_from_events` — compact an append-only change/event log
  into SCD2 validity intervals (one row per *distinct consecutive
  value* of the tracked columns per key, with ``valid_from`` /
  ``valid_to`` / ``is_current``). This is the "timestamp strategy"
  replay: given the full history you can rebuild the snapshot table
  from scratch, which is how a backfill or CI rebuild runs.
- :func:`scd2_merge_snapshot` — the incremental "check strategy"
  step: given the current SCD2 table and a new source snapshot,
  close out changed rows and append the new versions (dbt snapshot's
  per-run behavior), implemented as a union of three disjoint
  row-sets so it stays a pure DataFrame plan.

Scale: both are one shuffle on the natural key. The window in
``scd2_from_events`` partitions by key (millions of small partitions,
never data-sized frames); the merge is key-equi-join shaped, so AQE
handles skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    df: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Compact an event log into SCD2 validity intervals.

    Consecutive rows (per ``key_col``, ordered by ``ts_col`` then
    ``tiebreak_col``) with identical ``tracked_cols`` collapse into one
    interval; a change opens a new interval at its timestamp. The last
    interval per key has ``valid_to`` NULL and ``is_current`` true.

    Null-safe change detection (``eqNullSafe``) so NULL→value and
    value→NULL transitions are real changes, matching dbt's
    ``check`` strategy column comparison.

    With ``op_col`` set, rows whose op equals ``delete_op`` are CDC
    tombstones: a delete at t closes the open interval (valid_to = t)
    and emits no row of its own; a later upsert re-opens the key.
    Consecutive deletes collapse (no empty intervals). The delete
    state participates in change detection explicitly, so a delete
    followed by re-insert of the SAME values still opens a fresh
    interval (the key was genuinely absent in between).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    is_del = (
        F.col(op_col).eqNullSafe(delete_op) if op_col else F.lit(False)
    )
    df = df.withColumn("__del", is_del)
    changed = ~F.col("__del").eqNullSafe(F.lag("__del").over(w))
    value_changed = F.lit(False)
    for c in tracked_cols:
        value_changed = value_changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    changed = changed | (~F.col("__del") & value_changed)
    # first row per key: every lag is NULL -> eqNullSafe false unless
    # the column itself is NULL; force-open the first interval
    first = F.row_number().over(w) == 1

    opens = df.withColumn("__open", first | changed).filter(F.col("__open"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    out = (
        opens.select(
            key_col,
            *tracked_cols,
            "__del",
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        # tombstone "intervals" only exist to close their predecessor
        .filter(~F.col("__del"))
        .drop("__del")
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out


def scd2_apply_log(
    scd: DataFrame,
    events: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Apply one CDC changelog batch to an existing SCD2 table,
    replay-equivalently: streaming batches through this function yields
    EXACTLY the table :func:`scd2_from_events` builds from the full
    concatenated log (provided batches arrive in event-time order —
    the property the streaming test asserts).

    Mechanism: affected keys' OPEN rows are turned back into synthetic
    events at their ``valid_from`` and re-compacted together with the
    batch's events through :func:`scd2_from_events`; closed history
    rows and untouched keys pass through untouched. Per-batch cost is
    bounded by the batch's key set — one semi/anti join against the
    current slice plus a window over (batch + one synthetic row per
    affected key); the history is never re-sorted (the q156/SCD scale
    contract).
    """
    keys = events.select(F.col(key_col)).distinct()
    cur = scd.filter(F.col("is_current"))
    affected_cur = cur.join(keys, key_col, "left_semi")
    untouched = scd.filter(~F.col("is_current")).unionByName(
        cur.join(keys, key_col, "left_anti")
    )
    synth = affected_cur.select(
        key_col,
        *tracked_cols,
        F.col("valid_from").alias(ts_col),
    )
    if op_col:
        synth = synth.withColumn(
            op_col, F.lit(None).cast(events.schema[op_col].dataType)
        )
    if tiebreak_col:
        # synthetic rows sort before any real event at the same ts
        synth = synth.withColumn(
            tiebreak_col,
            F.lit(None).cast(events.schema[tiebreak_col].dataType),
        )
    cols = [key_col, *tracked_cols, ts_col]
    if op_col:
        cols.append(op_col)
    if tiebreak_col:
        cols.append(tiebreak_col)
    mini_log = synth.select(*cols).unionByName(events.select(*cols))
    rebuilt = scd2_from_events(
        mini_log, key_col, tracked_cols, ts_col, tiebreak_col, op_col, delete_op
    )
    out_cols = [key_col, *tracked_cols, "valid_from", "valid_to", "is_current"]
    return untouched.select(*out_cols).unionByName(rebuilt.select(*out_cols))


def scd2_merge_snapshot(
    scd: DataFrame,
    snapshot: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    as_of,
) -> DataFrame:
    """One incremental snapshot run (dbt snapshot ``check`` strategy).

    ``scd`` is the existing SCD2 table (``valid_from``/``valid_to``/
    ``is_current`` columns); ``snapshot`` is the new full source state;
    ``as_of`` is the run timestamp literal. Emits the next SCD2 state:

    - closed rows: current rows whose key's tracked values changed or
      whose key vanished from the snapshot → ``valid_to = as_of``;
    - untouched rows: history rows and unchanged current rows;
    - new rows: changed keys' new values and brand-new keys →
      ``valid_from = as_of``, open-ended.

    Pure joins/unions on the key — one shuffle, no windows, so a
    100 TB history table never re-sorts; only the (bounded) current
    slice joins the snapshot.
    """
    cur = scd.filter(F.col("is_current"))
    hist = scd.filter(~F.col("is_current"))

    # rename the snapshot side so the full-outer join never has
    # ambiguous attributes; presence is tested on the KEY (tracked
    # columns may legitimately be NULL)
    snap = snapshot.select(
        F.col(key_col).alias("__snap_key"),
        *[F.col(c).alias(f"__snap_{c}") for c in tracked_cols],
    )
    in_cur = F.col(key_col).isNotNull()
    in_snap = F.col("__snap_key").isNotNull()
    same = F.lit(True)
    for c in tracked_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__snap_{c}"))

    j = cur.join(snap, F.col(key_col) == F.col("__snap_key"), "full_outer")
    cols = [key_col, *tracked_cols, "valid_from", "valid_to", "is_current"]
    # key present in both and unchanged -> keep current row as-is
    unchanged = j.filter(in_cur & in_snap & same).select(cols)
    # present in both but changed, or vanished -> close out
    closed = (
        j.filter(in_cur & (~in_snap | ~same))
        .select(cols)
        .withColumn("valid_to", F.lit(as_of))
        .withColumn("is_current", F.lit(False))
    )
    # changed or brand-new -> open new version
    opened = (
        j.filter(in_snap & (~in_cur | ~same))
        .select(
            F.col("__snap_key").alias(key_col),
            *[F.col(f"__snap_{c}").alias(c) for c in tracked_cols],
        )
        .withColumn("valid_from", F.lit(as_of))
        .withColumn("valid_to", F.lit(None).cast(hist.schema["valid_to"].dataType))
        .withColumn("is_current", F.lit(True))
    )
    return (
        hist.select(cols)
        .unionByName(unchanged.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(opened.select(cols))
    )


def scd2_as_of(scd: DataFrame, as_of) -> DataFrame:
    """Point-in-time reconstruction from an SCD2 table: the row version
    of every key valid at ``as_of`` (``valid_from <= t < valid_to``,
    open intervals unbounded). A pure filter — with the SCD2 table
    partitioned/z-ordered on validity bounds this prunes to the
    files overlapping t; no joins, no windows. Keys deleted before t
    (or born after) simply have no row."""
    return scd.filter(
        (F.col("valid_from") <= F.lit(as_of))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(as_of)))
    ).drop("valid_to", "is_current")
