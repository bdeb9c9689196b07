"""Breadth-first search over a distributed edge relation: shortest
hop-count from a set of source nodes to every reachable node — the
graph primitive behind dependency-depth queries (how far is each dbt
model from its sources?), influence radii, and k-hop neighborhood
materialization. Complements `operators/components.py` (reachability
without distance) and `operators/pagerank.py` (stationary mass).

Algorithm: frontier expansion. `visited` holds (node, level); each
round joins the current frontier to the edge list and anti-joins the
result against `visited`, so every node is settled exactly once at
its minimum level — the textbook parallel BFS (Pregel's SSSP with
unit weights, expressed as DataFrame joins).

Scale design:
  - One shuffle-join per level; rounds = eccentricity of the source
    set, not |V|. The frontier starts small and the anti-join keeps
    it to NEW nodes only, so total work across all rounds is O(|E|).
  - Each level's settled frame is `localCheckpoint`ed ONCE when it is
    produced; `visited` is their lazy union — reading persisted
    blocks, never re-materialized (round-10: the old per-round
    re-checkpoint of the whole union rewrote O(|V|) rows every level,
    one extra job per round for pure bookkeeping).
  - The emptiness probe is a count() on the just-persisted frontier —
    a block-scan scalar read, the same deliberate pattern as the
    recursion loop's probe.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_levels"]


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = False,
    max_iter: int = 50,
) -> DataFrame:
    """(node, level): minimum hop count from any row of ``sources``
    (level 0) through ``edges``. Unreachable nodes are absent from the
    output. Raises after ``max_iter`` rounds — a radius that large on
    a dedup/lineage graph means the input is malformed; fail loudly.

    ``directed=False`` (default) treats each edge as bidirectional.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    e = e.distinct().localCheckpoint(eager=True)

    level0 = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0))
        .localCheckpoint(eager=True)
    )
    levels = [level0]
    frontier = level0
    lvl = 0
    # Two levels per driver round (round-10): the per-round scheduler
    # latency — not the edge work — dominates a deep frontier walk
    # (the q146 tree has eccentricity ~15), so each round settles
    # level L+1 AND level L+2 in one materialization: n1 = N(frontier)
    # minus seen, n2 = N(n1) minus seen minus n1 (exact — every L+2
    # node has an L+1 neighbor by definition). Same O(|E|) total join
    # work, half the driver-synchronized rounds; the level split of a
    # round is read back from ONE 2-row groupBy collect on the
    # persisted frame.
    rounds = 0
    while lvl < max_iter:
        seen = reduce(
            lambda x, y: x.unionByName(y),
            [f.select("node") for f in levels],
        )
        n1 = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .withColumn("level", F.lit(lvl + 1))
            .localCheckpoint(eager=False)
        )
        if lvl + 2 <= max_iter:
            n2 = (
                n1.join(e, n1["node"] == e["u"])
                .select(F.col("v").alias("node"))
                .distinct()
                .join(seen, "node", "left_anti")
                .join(n1.select("node"), "node", "left_anti")
                .withColumn("level", F.lit(lvl + 2))
            )
            both = n1.unionByName(n2).localCheckpoint(eager=True)
        else:
            # the max_iter level contract: never settle past it, even
            # when the 2-step round lands on the boundary
            both = n1.localCheckpoint(eager=True)
        # driver-bound: <= 2 rows (count per settled level this round)
        cnts = {
            r["level"]: r["n"]
            for r in both.groupBy("level").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if not cnts:
            return reduce(lambda x, y: x.unionByName(y), levels)
        levels.append(both)
        if cnts.get(lvl + 2, 0) > 0:
            frontier = both.where(F.col("level") == lvl + 2)
            lvl += 2
        else:
            frontier = both
            lvl += 1
        rounds += 1
        if rounds > max_iter:
            break
    raise RuntimeError(f"bfs did not terminate in {max_iter} levels")
