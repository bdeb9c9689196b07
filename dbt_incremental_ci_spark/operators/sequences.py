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


def markov_top1_accuracy(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """Grade the first-order Markov model ON its own transition
    stream: predict each next state as the argmax transition from the
    current state, report per-state top-1 accuracy — the sanity
    baseline every sequence model must beat.

    Same pair substrate as :func:`transition_matrix` (keyed window,
    no global sort); prediction is a per-from-state argmax
    (count-desc, state-asc tiebreak) joined back to the
    |states|²-sized pair-count frame — NOT re-joined to the event
    stream, so the eval is one aggregate over the bounded state
    matrix.

    Output per from_state: ``(from_state, predicted, n_pairs,
    n_correct, accuracy)`` — accuracy rounded 6.
    """
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = pairs.localCheckpoint(eager=False)
    # ^ three plan branches (best/per/correct) reference this frame;
    # truncation also sidesteps Spark's ambiguous-self-join analyzer
    # trap on the derived joins
    w_best = Window.partitionBy("from_state").orderBy(
        F.desc("n"), F.asc("to_state")
    )
    best = (
        pairs.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("from_state").alias("__bfs"),
            F.col("to_state").alias("predicted"),
        )
    )
    per = pairs.groupBy("from_state").agg(
        F.sum("n").cast("bigint").alias("n_pairs")
    )
    correct = pairs.join(
        best,
        (F.col("from_state") == F.col("__bfs"))
        & (F.col("to_state") == F.col("predicted")),
    ).select(
        "from_state",
        "predicted",
        F.col("n").cast("bigint").alias("n_correct"),
    )
    return per.join(correct, "from_state").select(
        "from_state",
        "predicted",
        "n_pairs",
        "n_correct",
        F.round(
            F.col("n_correct").cast("double") / F.col("n_pairs"), 6
        ).alias("accuracy"),
    )


def markov_top1_accuracy_sql(
    rows: str, key_col: str, order_cols: list[str], state_col: str
) -> str:
    """DuckDB twin of :func:`markov_top1_accuracy`."""
    order = ", ".join(order_cols)
    return f"""
    WITH pairs AS (
      SELECT from_state, to_state, count(*) AS n FROM (
        SELECT {state_col} AS from_state,
               lead({state_col}) OVER (PARTITION BY {key_col}
                 ORDER BY {order}) AS to_state
        FROM {rows}
      ) WHERE to_state IS NOT NULL
      GROUP BY 1, 2
    ),
    best AS (
      SELECT from_state, to_state AS predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY from_state
                    ORDER BY n DESC, to_state) AS rn
        FROM pairs
      ) WHERE rn = 1
    ),
    per AS (
      SELECT from_state, CAST(SUM(n) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY from_state
    ),
    correct AS (
      SELECT p.from_state, b.predicted, CAST(p.n AS BIGINT) AS n_correct
      FROM pairs p JOIN best b
        ON p.from_state = b.from_state AND p.to_state = b.predicted
    )
    SELECT per.from_state, c.predicted, per.n_pairs, c.n_correct,
           ROUND(CAST(c.n_correct AS DOUBLE) / per.n_pairs, 6)
             AS accuracy
    FROM per JOIN correct c ON per.from_state = c.from_state
    """
