"""Iterative fixpoint loop — the ``WITH RECURSIVE`` substitute.

Spark ≤3.5 has no recursive CTE (SURVEY §2.8 R1; the reference's one
site is the course-prerequisite chain walk,
int_course_prerequisite_chains.sql:3-36, depth-capped at 10). The
Spark-native shape is a driver-side loop over a *frontier* DataFrame:

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

from pyspark.sql import DataFrame


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
