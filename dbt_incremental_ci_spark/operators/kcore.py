"""k-core decomposition: the maximal subgraph in which every node has
degree >= k — the standard graph-density primitive behind community
seeding, spam/bot subgraph mining, and "shared-context" filtering of
entity graphs (complements `components.py` reachability,
`pagerank.py` centrality, `triangles.py` local clustering).

Algorithm: synchronous parallel peeling (the textbook distributed
k-core, e.g. Montresor et al., "Distributed k-core decomposition",
IEEE TPDS 2013 — the batch-peeling special case): each round computes
all degrees, deletes EVERY node of degree < k at once, repeats until
no deletion. The fixpoint is exactly the k-core regardless of peel
order (deleting a node never raises another's degree).

Scale design:
  - per round: one groupBy-count over the live edge frame (map-side
    combined) + two anti-joins (Spark's native NOT IN) — all |E|-sized
    distributed ops, no driver data;
  - the live edge frame shrinks monotonically and is
    ``localCheckpoint``ed per round so round N never replays rounds
    1..N-1 (the bfs/components lineage rule);
  - rounds = the graph's "peeling complexity" — small for real graphs
    (degrees collapse geometrically); the pathological O(|V|)-round
    case (long chains at k=2) hits ``max_iter`` and fails loudly,
    same contract as ``bfs_levels``;
  - the convergence probe is an ``isEmpty()`` on the weak-node frame —
    a scalar read, the recursion-loop probe class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kcore"]


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, degree): every node of the k-core of the undirected
    simple graph induced by ``edges`` (self-loops dropped, duplicate
    edges collapsed), with its degree WITHIN the core. Empty output if
    the core is empty. Raises after ``max_iter`` peel rounds."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")).where(
                F.col("u") != F.col("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
        weak = deg.where(F.col("degree") < k).select("u")
        if weak.isEmpty():
            return deg.select(F.col("u").alias("node"), "degree")
        e = (
            e.join(weak, "u", "left_anti")
            .join(weak.select(F.col("u").alias("v")), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k-core peeling did not converge in {max_iter} rounds")
