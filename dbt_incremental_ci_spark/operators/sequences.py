"""Event-sequence mining: first-order Markov transition matrices.

Given a keyed event stream, estimate ``P(next_state | state)`` from
observed consecutive pairs — the standard model behind next-event
prediction, funnel leak analysis, and session-flow dashboards (the
sequential complement of q79's funnel and q30's sessionization).

Scale design: one window shuffle by key to form consecutive pairs
(``lead`` over a per-key unique total order — per-row state only),
then a hash aggregate on (state, next_state) whose cardinality is
|states|², tiny regardless of data size. The per-source normalizer is
a second aggregate over that tiny relation, broadcast back by AQE.
No collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """(from_state, to_state, n, p): counts and row-normalized
    probabilities of consecutive state pairs within each key, ordered
    by ``order_cols`` (must be a unique total order per key —
    otherwise pair formation is nondeterministic). The final sequence
    element of each key has no successor and contributes no pair.

    ``p`` divides two exact counts and is rounded to 6 places so the
    value is engine-portable.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return pairs.join(totals, "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("p"),
    )
