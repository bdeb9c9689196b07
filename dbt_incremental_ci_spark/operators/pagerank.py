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
round. The rank frame is localCheckpoint'ed per iteration (the
components.py lineage pattern); the only driver-side values are the
per-iteration dangling-mass scalar and N (two scalar reads, the
accepted watermark-read pattern).

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

    ranks = nodes.withColumn("rank_fp", F.lit(init).cast("bigint"))
    for _ in range(iterations):
        ranked = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left")
        # dangling mass: nodes with no out-edges redistribute uniformly
        dangling = (
            ranked.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("m"))
            # driver-bound: 1 scalar row — dangling mass per iteration
            .collect()[0]["m"]
        )
        g = dangling // n
        contribs = (
            ranked.filter(F.col("outdeg").isNotNull())
            .select("node", F.expr("rank_fp DIV outdeg").alias("c"))
            .join(e, F.col("node") == e["src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * (coalesce(s, 0) + {g}) DIV 100"
                    )
                ).cast("bigint").alias("rank_fp"),
            )
            .localCheckpoint()
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
