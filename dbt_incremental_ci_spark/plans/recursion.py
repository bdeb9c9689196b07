"""Recursive-query support: native ``WITH RECURSIVE`` (Spark 4+) with
an iterative fixpoint loop as the portable fallback.

Spark 4.0 added recursive CTEs to the SQL dialect; on such sessions
:func:`supports_recursive_cte` probes once and SQL-text recursion runs
natively (single query, loop unrolled inside the engine — no per-step
driver round trips). For DataFrame-built step functions (the edu
prerequisite chains) and for Spark ≤3.5, the substitute is a
driver-side loop over a *frontier* DataFrame (SURVEY §2.8 R1; the
reference's one site is the course-prerequisite chain walk,
int_course_prerequisite_chains.sql:3-36, depth-capped at 10):

    seed → step(frontier) → union — until the frontier is empty or the
    depth cap hits.

Each frontier is ``localCheckpoint``-ed: this truncates the lineage so
the plan doesn't grow exponentially with depth, and materializes the
(small) frontier for the emptiness probe. At 100 TB the frontiers of a
hierarchy walk are tiny relative to the fact tables — the pattern
scales because each step is one distributed join, not a collect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_NATIVE_RECURSION: bool | None = None


def supports_recursive_cte(spark: SparkSession) -> bool:
    """One-time probe for native ``WITH RECURSIVE`` (Spark 4+). A
    feature probe, not a version sniff — forks/backports stay honest."""
    global _NATIVE_RECURSION
    if _NATIVE_RECURSION is None:
        try:
            spark.sql(
                "WITH RECURSIVE __probe(n) AS ("
                "SELECT 1 UNION ALL SELECT n + 1 FROM __probe WHERE n < 2"
                ") SELECT count(*) FROM __probe"
            # driver-bound: 1 scalar row — WITH RECURSIVE capability probe, data-free
            ).collect()
            _NATIVE_RECURSION = True
        except Exception:
            _NATIVE_RECURSION = False
    return _NATIVE_RECURSION


def recursive_loop(
    seed: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int = 10,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Union of seed + all step results, dbt/PG ``WITH RECURSIVE … UNION ALL``
    semantics (each iteration sees only the previous frontier).

    ``step(frontier, depth)`` returns the next frontier (may be empty).

    ``checkpoint_interval``: steps between lineage checkpoints. Each
    checkpoint costs a fixed job round-trip (~0.25 s in local mode);
    chaining a few cheap broadcast joins between checkpoints amortizes
    it, at the cost of re-executing ≤ interval-1 joins when the
    accumulated union is evaluated, and of detecting frontier
    exhaustion only at checkpoint boundaries (steps on an empty
    frontier are empty — semantics unchanged).
    """
    from pyspark.sql import functions as F

    frontier = seed.localCheckpoint(eager=True)
    acc = frontier
    depth = 0
    while depth < max_iterations:
        for _ in range(min(checkpoint_interval, max_iterations - depth)):
            depth += 1
            # The frontier is small relative to the edge relation —
            # broadcast it so each step is a broadcast hash join.
            frontier = step(F.broadcast(frontier), depth)
            acc = acc.unionByName(frontier)
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return acc
