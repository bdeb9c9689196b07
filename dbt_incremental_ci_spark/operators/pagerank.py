"""Fixed-point PageRank over an edge list — link-graph quality scores
for web-corpus curation.

Web-scale training-data pipelines weight documents by link-graph
centrality (Common-Crawl-derived corpora rank hosts by a PageRank-like
score before sampling). This is the classic iterative Spark job, with
one twist that makes it ORACLE-GRADE deterministic: ranks are kept in
64-bit integer fixed point (units of 1/SCALE), so every per-iteration
sum is an integer sum — associative, partitioning-independent, and
bit-identical in any engine. Floating-point PageRank sums doubles in
shuffle order; this variant has exactly one well-defined answer.

Update rule (all integer ops, ``//`` = floor division):

    init        r0[v]   = SCALE // N
    base        b       = (15 * (SCALE // N)) // 100
    contrib     c(u->v) = r[u] // outdeg(u)            per edge
    dangling    g       = (sum of r[u] with outdeg 0) // N
    iterate     r'[v]   = b + (85 * (sum_u c(u->v) + g)) // 100

(the damping factor 0.85 as the published default; truncation leaks
O(E) * 1/SCALE of mass per iteration — at SCALE=1e12 that is noise,
and the SEMANTICS are exact by definition.)

Scale shape: each iteration is one edge-to-rank hash join (rank table
is node-sized — AQE broadcasts it when small) plus one groupBy(dst)
with map-side partial aggregation, the textbook distributed PageRank
round. Round-10 job-count rebuild (the q344 pattern): the
per-iteration dangling-mass scalar is no longer ``collect()``ed — it
is a 1-row aggregate cross-joined (broadcast) into the rank update,
the static out-degree table is pre-joined into the edge list ONCE,
and the per-iteration ``localCheckpoint`` is lazy — so the whole
iteration chain executes as ONE distributed job (plus its broadcast
sub-jobs) instead of 2 driver-synchronized jobs per iteration
(measured 8.0 s → see docs/SCALE.md; semantics bit-identical, same
integer fixed point). The only driver-side value left is N.

No counterpart in the reference repo; part of the corpus-curation
operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # fixed-point denominator (1e12)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank_fp, rank) for every node appearing in the edge
    list. ``rank_fp`` is the exact BIGINT fixed-point rank (the
    deterministic value an oracle replays); ``rank`` is the derived
    double ``rank_fp / SCALE``. Duplicate edges count once.

    ``damping_pct`` is the damping factor in percent (integer, so the
    damping multiply stays in exact integer arithmetic)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * (SCALE // n) // 100
    init = SCALE // n

    # Size-gated broadcast hint (round-12, the bfs.py `_hint` pattern):
    # every per-iteration frame except the pre-joined edge list is
    # node-sized, and N is already a known driver scalar — so while the
    # graph is provably under the broadcast ceiling, hint every
    # node-sized join side explicitly. That turns each iteration into
    # broadcast joins + one partition-local aggregate (zero exchanges,
    # see below) and skips AQE's per-stage stats detour. Past the
    # ceiling the hint is withheld and the joins plan exactly as
    # before — a billion-node rank table is never forced onto the
    # driver.
    _BCAST_CAP = 4_000_000  # rows of (bigint, bigint) ≈ 64 MB

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n <= _BCAST_CAP else df

    # Static per-iteration inputs, materialized ONCE: the out-degree
    # pre-joined into the edge list (removes a join from every round)
    # and the dangling-node set (nodes with no out-edges — membership
    # never changes, only their rank sum does). Partitioning is chosen
    # from the same gate (guide §2.4 — share one exchange across all
    # iterations): under the cap the rank side broadcasts, so the
    # contribs join preserves the edge frame's partitioning and
    # pre-hashing it by dst makes every iteration's groupBy(dst)
    # exchange-free; over the cap the join is shuffle-based on
    # src/node, so pre-hashing by src saves the edge side of that
    # exchange every iteration instead.
    e2 = (
        e.join(outdeg, "src")
        .repartition("dst" if n <= _BCAST_CAP else "src")
        .localCheckpoint(eager=False)
    )
    # Dangling membership never changes, so it rides the rank frame as
    # a boolean computed ONCE (round-12): the per-iteration dangling
    # mass becomes a grouping-free aggregate over the persisted rank
    # frame — no join, no re-broadcast of the dangling set every round
    # (the old shape paid one node-sized broadcast build per iteration
    # for a static set).
    nodes2 = nodes.join(
        outdeg.select(F.col("src").alias("node"), F.lit(True).alias("__od")),
        "node",
        "left",
    ).select(
        "node", F.col("__od").isNull().alias("__dang")
    ).localCheckpoint(eager=False)

    ranks = nodes2.withColumn("rank_fp", F.lit(init).cast("bigint"))
    for _ in range(iterations):
        # dangling mass as a 1-row aggregate, cross-joined (broadcast)
        # into the update — never collected to the driver
        dm = ranks.where(F.col("__dang")).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("__dm")
        )
        contribs = (
            e2.join(_hint(ranks), ranks["node"] == e2["src"])
            .select(F.expr("rank_fp DIV outdeg").alias("c"), "dst")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes2.join(
                _hint(contribs), nodes2["node"] == contribs["dst"], "left"
            )
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                "__dang",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * (coalesce(s, 0)"
                        f" + __dm DIV {n}) DIV 100"
                    )
                ).cast("bigint").alias("rank_fp"),
            )
            # lazy: the whole iteration chain runs in ONE job at the
            # final action; each round's RDD persists as it computes,
            # so the two readers of round i (round i+1's dm broadcast
            # and its contribs join) never replay rounds 1..i-1
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", "rank_fp", (F.col("rank_fp") / F.lit(float(SCALE))).alias("rank")
    )


def pagerank_replica(
    edge_pairs: list[tuple[int, int]],
    iterations: int = 8,
    damping_pct: int = 85,
) -> dict[int, int]:
    """Driver-side Python replica of :func:`pagerank` (exact integer
    semantics) — the independent implementation workload oracles inline
    as VALUES. Returns {node: rank_fp}."""
    edges = sorted(set(edge_pairs))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    if n == 0:
        return {}
    out: dict[int, int] = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    base = (100 - damping_pct) * (SCALE // n) // 100
    r = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        dangling = sum(rv for v, rv in r.items() if v not in out)
        g = dangling // n
        sums = dict.fromkeys(nodes, 0)
        for u, v in edges:
            sums[v] += r[u] // out[u]
        r = {
            v: base + damping_pct * (sums[v] + g) // 100 for v in nodes
        }
    return r
