"""CDC (change-data-capture) changelog application: reduce an ordered
stream of upsert/delete operations to the latest table state.

The reference's incremental models consume already-deduplicated
sources; real warehouse ingestion sits one step earlier — a Debezium/
binlog-style changelog of (key, seq, op, payload) rows where the same
key appears many times and the LAST operation wins (and a delete
removes the key). This operator is that compaction, Spark-first:

    argmax-by-(seq, tiebreak) per key via a max(struct) aggregate
    — ONE hash aggregate with map-side partial combine, not a
    row_number window (a window must sort every key group; max_by
    keeps only the current winner per key per partition, so shuffled
    bytes scale with |keys|, not |changelog|).

Then drop keys whose winning op is a delete. ``incremental/merge.py``
applies batches to a stored table; this produces the canonical state
of one batch (or a full-history replay) — composing the two gives
at-least-once CDC ingestion with idempotent re-application.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_latest_state(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Latest surviving row per key: max-(seq[, tiebreak]) wins; keys
    whose winning operation equals ``delete_op`` are dropped.

    The winner is selected with ``max(struct(seq[, tiebreak], cols…))``
    — struct comparison is lexicographic, so this is argmax with a
    deterministic tiebreak, entirely inside one aggregate.
    """
    payload = [c for c in df.columns if c not in key_cols]
    ordering = [F.col(seq_col)]
    if tiebreak_col:
        ordering.append(F.col(tiebreak_col))
    winner = F.max(
        F.struct(*ordering, *[F.col(c).alias(f"__p_{c}") for c in payload])
    ).alias("__w")
    out = df.groupBy(*key_cols).agg(winner)
    # eqNullSafe negation: a winning row with a NULL op is a malformed
    # changelog entry, not a delete — `!= delete_op` would silently drop
    # it (NULL comparison is never true). Keep it so the caller sees it.
    keep = out.filter(~F.col(f"__w.__p_{op_col}").eqNullSafe(delete_op))
    return keep.select(
        *key_cols,
        *[F.col(f"__w.__p_{c}").alias(c) for c in payload],
    )


def cdc_op_census(
    df: DataFrame, key_cols: list[str], seq_col: str, op_col: str
) -> DataFrame:
    """Per-key changelog shape: number of versions, first/last seq,
    whether the key currently survives — the audit view next to
    :func:`cdc_latest_state`."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.min(seq_col).alias("first_seq"),
        F.max(seq_col).alias("last_seq"),
        F.max_by(F.col(op_col), F.col(seq_col)).alias("last_op"),
    )
