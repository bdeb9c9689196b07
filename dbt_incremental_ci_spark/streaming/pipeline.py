"""Structured Streaming analogue of the incremental pipeline.

The reference's incremental machinery (watermark filter + unique-key
upsert, SURVEY §2.11 I1-I3) is the batch expression of exactly what
Structured Streaming gives natively:

- watermark filter               → ``withWatermark`` (bounded lateness)
- ``unique_key`` dedupe          → ``dropDuplicates([key])`` with state
- delete+insert materialization  → ``foreachBatch`` running the same
  :func:`incremental_upsert` MERGE used by the batch engine — one code
  path for both (the Kappa-architecture shape).

At scale: the foreachBatch MERGE inherits the partition-scoped rewrite
from the batch layer, so a day-partitioned 100 TB target merges only
the partitions each micro-batch touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def incremental_stream(
    stream_df: DataFrame,
    target_table: str,
    unique_key: str,
    event_time_col: str,
    lateness: str = "1 hour",
    checkpoint_dir: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "upsert",
) -> DataStreamWriter:
    """Streaming MERGE into a table, one of two key semantics:

    - ``upsert`` (default, the reference's ``unique_key`` behavior):
      later micro-batches *replace* rows by key — so cross-batch
      duplicates must flow through to the MERGE; only in-batch dupes
      are dropped (inside ``incremental_upsert``).
    - ``dedupe``: exactly-once event ingestion — stateful
      ``dropDuplicates`` over the watermark window swallows re-deliveries
      of the same key across batches (first write wins).

    Returns the configured ``DataStreamWriter`` (caller ``.start()``s
    it — tests use ``trigger(availableNow=True)`` for bounded runs).
    """
    from dbt_incremental_ci_spark.incremental.merge import incremental_upsert

    deduped = stream_df.withWatermark(event_time_col, lateness)
    if mode == "dedupe":
        # dropDuplicates([key]) alone keeps per-key state forever —
        # watermark eviction only applies when the event-time column is
        # among the dedup keys. dropDuplicatesWithinWatermark (3.5+)
        # evicts a key's state once its last-seen event time falls
        # behind the watermark, so state is truly bounded by
        # ``lateness`` while still swallowing re-deliveries inside it.
        deduped = deduped.dropDuplicatesWithinWatermark([unique_key])
    elif mode != "upsert":
        raise ValueError(f"unknown mode: {mode}")
    # foreachBatch executes in a *cloned* session; the defining session
    # keeps its own relation cache, which a parquet-table rewrite makes
    # stale — refresh it after each merge so readers see the new files.
    defining_session = stream_df.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_upsert(
            batch_df.sparkSession,
            target_table,
            batch_df,
            unique_key=unique_key,
            partition_by=partition_by,
        )
        try:
            defining_session.catalog.refreshTable(target_table)
        except Exception:  # noqa: BLE001 — refresh is best-effort
            pass

    writer = deduped.writeStream.foreachBatch(merge_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stateful_running_stats(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum, last-seen) maintained across micro-batches in
    Arrow-typed state — the escape hatch for aggregations the built-in
    windowed/dedup operators can't express (running ratios, model
    feature state, per-entity counters).

    State is one tiny tuple per key, partitioned by the groupBy key —
    memory scales with |keys|, not events; each micro-batch touches
    only the keys it contains. Emits one updated row per key per batch
    (``update`` mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, total double, last_ts timestamp"
    state_schema = "n long, total double, last_us long"

    def fn(key, pdfs, state):
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf[ts_col].max().value // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "total": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def running_stats_tws(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """:func:`stateful_running_stats` on the Spark 4
    ``transformWithStateInPandas`` API (the successor to
    ``applyInPandasWithState``: typed state variables, timers, TTL,
    RocksDB-backed state store). Same contract — per-key running
    (count, sum) maintained across micro-batches, one updated row per
    key per batch — so the equivalence test pins the two APIs to each
    other. Requires
    ``spark.sql.streaming.stateStore.providerClass =
    …RocksDBStateStoreProvider`` (the v2 state API's store) and a
    working ``google.protobuf`` (the state protocol's wire format;
    absent in this build container, so the test import-skips)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._agg.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._agg.update((n, total))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [total]})

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        RunningAgg(),
        outputStructType=f"{key_col} long, n_events long, total double",
        outputMode="Update",
        timeMode="None",
    )


def session_event_counts(
    stream_df: DataFrame,
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    lateness: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Native session-window aggregation (``F.session_window``): events
    within ``gap`` of each other merge into one session; state for a
    session closes once the watermark passes its end, so streaming
    state is bounded by ``lateness`` + the longest open session. Works
    identically on batch DataFrames (the q45 twin — oracle-verified
    against a gap-and-islands SQL formulation)."""
    groups = [F.session_window(F.col(event_time_col), gap)] + [
        F.col(c) for c in (group_cols or [])
    ]
    src = stream_df
    if stream_df.isStreaming:
        src = stream_df.withWatermark(event_time_col, lateness)
    return (
        src.groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_events",
        )
    )


def windowed_event_counts(
    stream_df: DataFrame,
    event_time_col: str = "ts",
    window_duration: str = "10 minutes",
    lateness: str = "30 minutes",
    group_cols: list[str] | None = None,
    slide_duration: str | None = None,
) -> DataFrame:
    """Watermarked windowed aggregation — the streaming twin of the
    batch sessionization/trend queries (tumbling) and of q65's hopping
    windows when ``slide_duration`` is given (each event counts into
    window/slide overlapping windows). Late rows beyond the watermark
    are dropped; state is bounded by ``lateness`` × windows-per-event."""
    win = (
        F.window(F.col(event_time_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(event_time_col), window_duration)
    )
    groups = [win] + [F.col(c) for c in (group_cols or [])]
    return (
        stream_df.withWatermark(event_time_col, lateness)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_events",
            "total_value",
        )
    )


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcast-hinted) dimension snapshot. Stateless — unlike a
    stream-stream join there is nothing to buffer or evict, so this is
    the right shape whenever the right side is a slowly-changing
    reference table rather than a stream. The static side is re-read
    every micro-batch (picks up dim updates); cache the dim DataFrame
    to pin one snapshot instead."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "15 minutes",
    lateness: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (the streaming twin of the batch
    ``operators.asof.range_join``): pair each left event with right
    events on the same key arriving within ``[left_ts, left_ts +
    upper]``.

    Both sides carry a watermark and the join condition bounds the
    time skew, which is what lets Spark EVICT join state: a buffered
    left row can be dropped once the right watermark passes
    ``left_ts + upper``, so state is O(events inside the watermark
    window), not O(stream). Without the range condition a
    stream-stream join buffers both sides forever — the unbounded
    variant is rejected by Spark for exactly that reason.

    ``how``: "inner" or "leftOuter" (outer results emit only after the
    watermark closes the window — availableNow runs flush them).
    Key/ts column names must differ between the two sides (rename
    before calling) so the joined schema is unambiguous.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    dupes = set(left.columns) & set(right.columns)
    if dupes:
        raise ValueError(f"rename before joining; ambiguous columns: {sorted(dupes)}")
    l = left.withWatermark(left_ts, lateness)
    r = right.withWatermark(right_ts, lateness)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def stream_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    lateness: str = "30 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup``: emit only the first record seen
    per key.

    The 100 TB state story is the whole point: plain
    ``dropDuplicates`` on a stream keeps EVERY key ever seen in state
    forever — unbounded on an infinite stream. With an event-time
    column, ``dropDuplicatesWithinWatermark`` bounds state to keys
    seen inside the watermark horizon: a key's state is evicted once
    the watermark passes its event time + ``lateness``, which is the
    correct semantics when duplicates arrive close together (retries,
    at-least-once sources) rather than arbitrarily far apart.

    ``within_watermark=False`` (or no ``event_time_col``) falls back
    to global ``dropDuplicates`` — exact forever-dedup, for bounded
    backfills where state growth is acceptable.
    """
    if event_time_col is None or not within_watermark:
        return stream_df.dropDuplicates(key_cols)
    return stream_df.withWatermark(
        event_time_col, lateness
    ).dropDuplicatesWithinWatermark(key_cols)
