"""End-to-end streaming warehouse ingestion: CDC changelog → SCD2
history → incrementally-maintained HLL registers, one ``foreachBatch``
pipeline (round-4 verdict item 6 — composing `operators/cdc.py`,
`operators/scd.py` and `operators/hll.py` into the ingestion story the
reference's incremental models sit on top of; ref: SRC/core.py
classifies ``snapshot`` + ``incremental`` materializations, which are
exactly the two artifacts this stream maintains).

Per micro-batch:

1. the raw changelog rows (key, seq, op, payload) are applied to the
   stored SCD2 table with :func:`~..operators.scd.scd2_apply_log` —
   replay-equivalent to rebuilding from the full concatenated log, so
   the batch-rebuild oracle holds (the I5/Kappa contract
   ``streaming/pipeline.py`` already proves for sessionization);
2. the batch's HLL registers are merged (``max`` per bucket) into the
   stored register table — the mergeability q174's oracle proves
   register-exact, now exercised as streaming state: per batch the
   update touches m rows, never the history.

Scale: per-batch work is bounded by the batch — scd2_apply_log joins
only the CURRENT slice of affected keys (history untouched), and the
register table is m rows. Both tables go through the two-phase
overwrite used by the batch merge layer (read-modify-write safety on
parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from dbt_incremental_ci_spark.incremental.merge import _two_phase_overwrite
from dbt_incremental_ci_spark.operators.hll import hll_merge, hll_registers
from dbt_incremental_ci_spark.operators.scd import scd2_apply_log


def _empty_scd(spark, events: DataFrame, key_col, tracked_cols, ts_col):
    fields = {f.name: f.dataType for f in events.schema.fields}
    ts_t = fields[ts_col].simpleString()
    cols = ", ".join(
        [f"{key_col} {fields[key_col].simpleString()}"]
        + [f"{c} {fields[c].simpleString()}" for c in tracked_cols]
        + [f"valid_from {ts_t}", f"valid_to {ts_t}", "is_current boolean"]
    )
    return spark.createDataFrame([], cols)


def cdc_scd2_hll_stream(
    stream_df: DataFrame,
    scd_table: str,
    hll_table: str,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str,
    op_col: str,
    delete_op: str = "D",
    tiebreak_col: str | None = None,
    hll_m: int = 128,
    hll_salt: str = "hll",
    checkpoint_dir: str | None = None,
) -> DataStreamWriter:
    """Wire a CDC changelog stream into (SCD2 table, HLL register
    table). Returns the configured writer; callers ``.start()`` it
    (tests use ``trigger(availableNow=True)`` for bounded replays).

    Oracle (test_streaming.py): after streaming N key-overlapping
    batches, ``scd_table`` equals ``scd2_from_events`` over the full
    concatenated log and ``hll_table`` equals ``hll_registers`` over
    the full key set — stream-apply ≡ batch rebuild.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # SCD2: apply the batch as an ordered mini-log
        if spark.catalog.tableExists(scd_table):
            scd = spark.table(scd_table)
        else:
            scd = _empty_scd(spark, batch_df, key_col, tracked_cols, ts_col)
        next_scd = scd2_apply_log(
            scd,
            batch_df,
            key_col,
            tracked_cols,
            ts_col,
            tiebreak_col=tiebreak_col,
            op_col=op_col,
            delete_op=delete_op,
        )
        _two_phase_overwrite(spark, scd_table, next_scd, None)

        # HLL: merge the batch's registers into the stored sketch.
        # Distinct keys EVER SEEN (deletes still count as observed) —
        # the usual ingest-cardinality monitor semantics.
        regs_new = hll_registers(batch_df, key_col, m=hll_m, salt=hll_salt)
        if spark.catalog.tableExists(hll_table):
            regs_new = hll_merge(spark.table(hll_table), regs_new)
        _two_phase_overwrite(spark, hll_table, regs_new, None)

    writer = stream_df.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def minhash_register_stream(
    stream_df: DataFrame,
    register_table: str,
    set_col: str,
    token_col: str,
    m: int = 32,
    salt: str = "mmh",
    checkpoint_dir: str | None = None,
) -> DataStreamWriter:
    """Incrementally-maintained MinHash signatures: each micro-batch's
    tokens sketch to (set, perm, h) registers and fold into the stored
    table by elementwise ``min`` — the set-similarity twin of the HLL
    branch above (``mhsketch.py`` proves merge losslessness in q220;
    this exercises it as streaming state). Per-batch work is bounded
    by the batch plus the m-per-set register table; token history is
    never rescanned.

    Oracle (test_streaming.py): after streaming N batches,
    ``register_table`` equals ``minhash_md5_registers`` over the full
    concatenated input — stream-apply ≡ batch rebuild.
    """
    from dbt_incremental_ci_spark.operators.mhsketch import (
        minhash_md5_registers,
        minhash_merge,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        regs_new = minhash_md5_registers(
            batch_df, set_col, token_col, m=m, salt=salt
        )
        if spark.catalog.tableExists(register_table):
            regs_new = minhash_merge(
                spark.table(register_table).unionByName(regs_new),
                set_col,
            )
        _two_phase_overwrite(spark, register_table, regs_new, None)

    writer = stream_df.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def countmin_cell_stream(
    stream_df: DataFrame,
    sketch_table: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    checkpoint_dir: str | None = None,
) -> DataStreamWriter:
    """Incrementally-maintained count-min sketch: each micro-batch
    sketches to (r, b, cnt) cells and folds into the stored table by
    cell-wise ADDITION — counters are the simplest mergeable state of
    all (plain commutative sums), so stream-apply ≡ batch rebuild
    exactly, with per-batch work bounded by the batch plus the d·w
    cell table. The frequency/heavy-hitter monitor for an ingest
    firehose: no key history is ever rescanned, and the point-query
    side (``countmin.countmin_estimate``) reads the same table the
    stream maintains.

    Oracle (test_streaming.py): after streaming N batches,
    ``sketch_table`` equals ``countmin_build`` over the concatenated
    input.
    """
    from dbt_incremental_ci_spark.operators.countmin import countmin_build

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cells_new = countmin_build(
            batch_df, key_col, depth=depth, width=width, salt=salt
        )
        if spark.catalog.tableExists(sketch_table):
            cells_new = (
                spark.table(sketch_table)
                .unionByName(cells_new)
                .groupBy("r", "b")
                .agg(F.sum("cnt").alias("cnt"))
            )
        _two_phase_overwrite(spark, sketch_table, cells_new, None)

    writer = stream_df.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
