"""HITS hub/authority scoring (Kleinberg, JACM'99) over a directed
edge list — the link-analysis complement to PageRank
(``pagerank.py``): hubs point at good authorities, authorities are
pointed at by good hubs. In a pipeline context this ranks
source-pages vs content-pages in a crawl graph, or buyers vs
suppliers in a transaction graph.

Determinism across engines for a value oracle needs care the
textbook L2 form doesn't give: each iteration here normalizes by the
MAX score (scale-free like L2, same ranking) and ROUNDS every score
to 9 dp before the next iteration — both engines then iterate over
identical numbers, so a fixed iteration count produces bit-identical
outputs (the ``pagerank_replica`` precedent, but SQL-expressible:
the DuckDB twin unrolls the iterations as CTEs).

Scale: per iteration, two edge-keyed aggregate-joins (hub→auth,
auth→hub) — shuffles are edge/node-sized with map-side combine; the
max-normalizer is a 1-row reduce broadcast back. The score frame is
localCheckpoint'ed per iteration (multi-branch reuse rule,
SCALE.md §6l). Iterations are FIXED (default 3) — at 100 TB you run
few power iterations and read relative scores, not a convergence
loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_scores(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Hub scores for src nodes and authority scores for dst nodes
    after ``iterations`` rounds, starting from all-ones. Output:
    ``(node, role, score)`` with role in ('hub', 'authority'),
    score max-normalized and rounded to 9 dp.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct().localCheckpoint(eager=False)
    # Round-12 iteration shape (guide §2.4 — share one exchange across
    # all rounds): the per-round joins key the SAME edge frame by src
    # (auth round) and by dst (hub round), and each round's groupBy
    # re-keys it again. Two pre-hashed copies of the edge frame — one
    # per key — are materialized ONCE; with the node-sized score frame
    # broadcast (size-gated below), every round's join preserves the
    # edge frame's partitioning and its groupBy aggregates in place:
    # zero per-round exchanges instead of two. The node/edge counts
    # come from one aggregate pass over the already-checkpointed edge
    # frame; past the broadcast cap the hint is withheld and the round
    # plans exactly as before (AQE picks the join), so a billion-node
    # score table is never forced onto the driver.
    cnt = e.agg(
        F.countDistinct("src").alias("ns"),
        F.countDistinct("dst").alias("nd"),
        # driver-bound: 1 row, 2 scalars (node counts for the gate)
    ).first()
    _BCAST_CAP = 4_000_000  # (string, double) score rows ≈ tens of MB
    n_max = max(int(cnt["ns"] or 0), int(cnt["nd"] or 0))

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_max <= _BCAST_CAP else df

    e_dst = e.repartition("dst").localCheckpoint(eager=False)
    e_src = e.repartition("src").localCheckpoint(eager=False)
    hubs = e_src.select("src").distinct().select(
        "src", F.lit(1.0).alias("h")
    )
    for _ in range(iterations):
        # authority = sum of pointing hubs' scores, max-normalized
        # decimal fold: scores are round-9 doubles in [0,1]; a raw
        # double sum folds in task order (the SCALE.md 6q flake class)
        auth = (
            e_dst.join(_hint(hubs), "src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("h").cast("decimal(28,9)")).alias("__a")
            )
        )
        amax = auth.agg(F.max("__a").alias("__am"))
        auth = (
            auth.crossJoin(F.broadcast(amax))
            .select(
                "dst",
                F.round(
                    F.col("__a").cast("double")
                    / F.col("__am").cast("double"),
                    9,
                ).alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        # hub = sum of pointed authorities' scores, max-normalized
        hub = (
            e_src.join(_hint(auth), "dst")
            .groupBy("src")
            .agg(
                F.sum(F.col("a").cast("decimal(28,9)")).alias("__h")
            )
        )
        hmax = hub.agg(F.max("__h").alias("__hm"))
        hubs = (
            hub.crossJoin(F.broadcast(hmax))
            .select(
                "src",
                F.round(
                    F.col("__h").cast("double")
                    / F.col("__hm").cast("double"),
                    9,
                ).alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return hubs.select(
        F.col("src").alias("node"),
        F.lit("hub").alias("role"),
        F.col("h").alias("score"),
    ).unionByName(
        auth.select(
            F.col("dst").alias("node"),
            F.lit("authority").alias("role"),
            F.col("a").alias("score"),
        )
    )


def hits_scores_sql(
    rows: str, src_col: str, dst_col: str, iterations: int = 3
) -> str:
    """DuckDB twin of :func:`hits_scores`: the fixed iteration count
    unrolls into CTE pairs, each reproducing the same
    round-9-then-iterate numbers."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    parts = [
        f"""e AS (
      SELECT DISTINCT CAST({src_col} AS VARCHAR) AS src,
             CAST({dst_col} AS VARCHAR) AS dst
      FROM {rows}
    ),
    h0 AS (SELECT DISTINCT src, CAST(1.0 AS DOUBLE) AS h FROM e)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""a{i}_raw AS (
      SELECT dst, sum(CAST(h AS DECIMAL(28,9))) AS a
      FROM e JOIN h{i - 1} USING (src)
      GROUP BY dst
    ),
    a{i} AS (
      SELECT dst,
             ROUND(CAST(a AS DOUBLE)
               / (SELECT CAST(max(a) AS DOUBLE) FROM a{i}_raw), 9) AS a
      FROM a{i}_raw
    ),
    h{i}_raw AS (
      SELECT src, sum(CAST(a AS DECIMAL(28,9))) AS h
      FROM e JOIN a{i} USING (dst)
      GROUP BY src
    ),
    h{i} AS (
      SELECT src,
             ROUND(CAST(h AS DOUBLE)
               / (SELECT CAST(max(h) AS DOUBLE) FROM h{i}_raw), 9) AS h
      FROM h{i}_raw
    )"""
        )
    n = iterations
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT src AS node, 'hub' AS role, h AS score FROM h{n}
    UNION ALL
    SELECT dst AS node, 'authority' AS role, a AS score FROM a{n}
    """
    )
