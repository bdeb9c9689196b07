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
  - `visited` is |V|-sized and `localCheckpoint`ed per round to
    truncate lineage (round N's plan must not replay rounds 1..N-1).
  - The emptiness probe is a count() on the frontier — a scalar read,
    the same deliberate pattern as the recursion loop's probe.
"""

from __future__ import annotations

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

    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for lvl in range(1, max_iter + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"bfs did not terminate in {max_iter} rounds")
