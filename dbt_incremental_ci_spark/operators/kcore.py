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
    step: int = 3,
) -> DataFrame:
    """(node, degree): every node of the k-core of the undirected
    simple graph induced by ``edges`` (self-loops dropped, duplicate
    edges collapsed), with its degree WITHIN the core. Empty output if
    the core is empty. Raises after ``max_iter`` peel rounds.

    ``step`` = peel rounds settled per driver-synchronized probe (a
    pure scheduling knob, never visible in the result — regression-
    tested across step parities)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")).where(
                F.col("u") != F.col("v")
            )
        )
        # hash by u BEFORE the dedup: HashPartitioning(u) satisfies the
        # distinct's ClusteredDistribution(u, v), so the dedup adds no
        # second exchange — and every later peel round's groupBy("u")
        # and anti-join on u then reuse this one partitioning for the
        # whole run (guide §2.4: one exchange shared across rounds).
        .repartition("u")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Size-gated broadcast hint (round-12, the bfs.py pattern): every
    # weak-node frame is a subset of the node set, so one exact node
    # count — a scalar the first degree pass pays for anyway — proves
    # all of them fit broadcast for the whole run. Hinting them keeps
    # the anti-joins build-side-broadcast (the v-side anti-join would
    # otherwise re-hash the live edge frame by v every round) and
    # skips AQE's per-stage stats detour. Past the cap no hint is
    # emitted and rounds plan exactly as before.
    n_nodes = e.select("u").distinct().count()
    _BCAST_CAP = 4_000_000

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_nodes <= _BCAST_CAP else df

    # step peel rounds settle per driver-synchronized probe (round-12,
    # the bfs.py k-step pattern): deleting every degree<k node at once
    # is idempotent AT the fixpoint (a round that deletes nothing
    # re-derives the same degrees), so unrolling a few rounds blind and
    # probing only the LAST round's weak frame returns the identical
    # fixpoint — rounds past convergence are no-ops by construction.
    # Each sub-round is a lazy localCheckpoint persisted by the probe
    # job, so the next batch never replays this one; the probe is the
    # batch's ONE driver sync instead of two jobs (eager checkpoint +
    # isEmpty) per round.
    rounds = 0
    while rounds < max_iter:
        j = min(step, max_iter - rounds)
        deg = None
        for _ in range(j):
            deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
            weak = (
                deg.where(F.col("degree") < k)
                .select("u")
                .localCheckpoint(eager=False)
            )
            e = (
                e.join(_hint(weak), "u", "left_anti")
                .join(_hint(weak.select(F.col("u").alias("v"))), "v", "left_anti")
                .localCheckpoint(eager=False)
            )
        rounds += j
        if weak.isEmpty():
            # the LAST unrolled round deleted nothing, so its input was
            # already the fixpoint and its deg is the core's degrees
            return deg.select(F.col("u").alias("node"), "degree")
    raise RuntimeError(f"k-core peeling did not converge in {max_iter} rounds")
