"""Triangle counting and local clustering coefficients on an
undirected graph (the near-dup pair graph, collaboration graphs, …).

The reference has no graph surface (its "collaboration network" model
is pairwise self-joins — SURVEY.md §1.1); this extends the engine's
graph stack (connected components `operators/components.py`, PageRank
`operators/pagerank.py`) with the standard corpus-audit metric: how
clique-y is the duplicate graph? A near-dup cluster that is one dense
clique is one template; a sparse star is a hub page quoted everywhere —
triangle density tells them apart before you pick dedup survivors.

Algorithm — degree-ordered edge orientation (public literature: Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW 2011; Schank & Wagner 2005):

1. Canonicalize edges to undirected distinct pairs.
2. Compute degrees; define the total order rank(v) = (deg(v), v).
3. Orient every edge from the lower-rank to the higher-rank endpoint.
   Each triangle {u, v, w} (ranks u < v < w) now appears EXACTLY once
   as the wedge u→v, u→w closed by v→w.
4. Wedges = oriented ⋈ oriented on the source; close each wedge with a
   semi-probe into the oriented edge set.

Scale design (the 100 TB story):

- The orientation bounds every node's out-degree by O(sqrt(|E|))
  (heavy hitters point only at heavier nodes), so the wedge join's
  fan-out per node is sqrt-bounded — the "curse of the last reducer"
  (a celebrity node with 10^7 neighbors generating 10^14 wedges) is
  structurally impossible. That is the whole point of step 3.
- Everything is equi-joins and hash aggregates on node ids — AQE
  handles residual skew; no collect, no Python, no cartesian.
- Per-node counts come from exploding each triangle's 3 corners — the
  triangle set is output-sized, far smaller than the wedge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_edges(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Distinct undirected edges as (u < v), self-loops dropped."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from canonical edges."""
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))


def _oriented(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Edges oriented low-rank → high-rank, rank = (deg, node)."""
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("deg_u")).otherwise(F.col("deg_v")).alias("deg_lo"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_hi"),
    )


def triangles(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """All triangles, one row each: (a, b, c) with a < b < c by node id.

    Input can be any (possibly duplicated / arbitrarily directed) edge
    list; it is canonicalized first.
    """
    # The oriented edge relation is referenced THREE times below (both
    # wedge sides + the closing probe), and canon twice more via the
    # degree join — without truncating lineage each reference would
    # re-execute the caller's whole upstream plan (measured on the
    # near-dup graph: the 43 s set-similarity join ran 3×, 137 s
    # total). localCheckpoint materializes each once; edge tables are
    # orders of magnitude smaller than the corpora that produce them.
    canon = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = degrees(canon)
    o = _oriented(canon, deg).localCheckpoint(eager=False)
    # wedge: x→y, x→z with rank(y) < rank(z); close with y→z
    left = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"),
                    F.col("deg_hi").alias("dy"))
    right = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"),
                     F.col("deg_hi").alias("dz"))
    wedges = left.join(right, "x").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closed = wedges.join(
        o.select(F.col("lo").alias("y"), F.col("hi").alias("z")), ["y", "z"]
    )
    corners = F.array_sort(F.array("x", "y", "z"))
    return closed.select(
        corners[0].alias("a"), corners[1].alias("b"), corners[2].alias("c")
    )


def node_triangle_stats(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-node degree, triangle count, and local clustering
    coefficient 2·tri / (deg·(deg−1)) (0 when deg < 2), over ALL nodes
    in ``nodes`` (isolated nodes get deg 0, tri 0, lcc 0).

    Output: ``node, deg, tri, lcc`` (lcc rounded to 6 dp).
    """
    # checkpoint once here: degrees, the triangle pipeline, and the
    # left joins below all branch from this relation (see triangles()).
    canon = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = degrees(canon)
    tri = triangles(canon, "u", "v")
    corner_counts = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    base = nodes.select(F.col(node_col).alias("node")).distinct()
    out = (
        base.join(deg, "node", "left")
        .join(corner_counts, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
        )
    )
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(
            F.lit(2.0) * F.col("tri")
            / (F.col("deg") * (F.col("deg") - F.lit(1))).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("lcc", lcc)


def degree_assortativity(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over edges — positive means hubs
    link to hubs (social nets), negative means hub-spoke (web,
    near-dup star clusters). The one-number structure check before
    trusting component/PageRank outputs.

    Shape: degrees from one hash aggregate; each undirected edge
    contributes BOTH orientations (the standard symmetric estimator);
    all five correlation sums are EXACT integer bigint folds (degrees
    are ints) with one final double expression — bit-identical on any
    partitioning/engine. Output ONE row: ``(n_nodes, n_edges,
    assortativity)`` (6 dp; NULL when degenerate variance).
    """
    canon = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = degrees(canon)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
    oriented = canon.select("u", "v").unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    pairs = oriented.join(du, "u").join(dv, "v")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__du").alias("__sx"),
        F.sum("__dv").alias("__sy"),
        F.sum(F.col("__du") * F.col("__dv")).alias("__sxy"),
        F.sum(F.col("__du") * F.col("__du")).alias("__sxx"),
        F.sum(F.col("__dv") * F.col("__dv")).alias("__syy"),
    )
    n_nodes = deg.count()  # driver-bound: 1 scalar (node count)

    # n·Σxy − Σx·Σy overflows BIGINT at sf1 (Σx·Σy ~ 1e20 > 2^63 —
    # caught by the 10x gate under ANSI mode); compute the exact
    # products in DECIMAL(38,0) (DuckDB promotes to HUGEINT, same
    # exact-then-widen path) and widen to double only at the end.
    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    cov = (
        dec(F.col("__n")) * dec(F.col("__sxy"))
        - dec(F.col("__sx")) * dec(F.col("__sy"))
    ).cast("double")
    vx = (
        dec(F.col("__n")) * dec(F.col("__sxx"))
        - dec(F.col("__sx")) * dec(F.col("__sx"))
    ).cast("double")
    vy = (
        dec(F.col("__n")) * dec(F.col("__syy"))
        - dec(F.col("__sy")) * dec(F.col("__sy"))
    ).cast("double")
    return agg.select(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        (F.col("__n") / 2).cast("bigint").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(cov / F.sqrt(vx * vy), 6),
        ).alias("assortativity"),
    )


def degree_assortativity_sql(
    edges_rows: str, src: str = "id_a", dst: str = "id_b"
) -> str:
    """DuckDB twin of :func:`degree_assortativity`. ``edges_rows`` is
    a FROM-able relation of (possibly unordered/duplicated) edges."""
    return f"""
    WITH raw AS (
      SELECT LEAST({src}, {dst}) AS u, GREATEST({src}, {dst}) AS v
      FROM {edges_rows} WHERE {src} <> {dst}
    ),
    canon AS (SELECT DISTINCT u, v FROM raw),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM canon
        UNION ALL SELECT v AS node FROM canon
      ) GROUP BY node
    ),
    oriented AS (
      SELECT u, v FROM canon UNION ALL SELECT v AS u, u AS v FROM canon
    ),
    pairs AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM oriented o
      JOIN deg du ON du.node = o.u
      JOIN deg dv ON dv.node = o.v
    ),
    agg AS (
      -- HUGEINT sums/products: exact, mirroring Spark's DECIMAL(38,0)
      -- path (plain BIGINT products overflow at 10x scale)
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(dx) AS HUGEINT) AS sx,
             CAST(sum(dy) AS HUGEINT) AS sy,
             CAST(sum(dx * dy) AS HUGEINT) AS sxy,
             CAST(sum(dx * dx) AS HUGEINT) AS sxx,
             CAST(sum(dy * dy) AS HUGEINT) AS syy
      FROM pairs
    ),
    nn AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           CAST(agg.n / 2 AS BIGINT) AS n_edges,
           CASE WHEN (agg.n * agg.sxx - agg.sx * agg.sx) > 0
                 AND (agg.n * agg.syy - agg.sy * agg.sy) > 0
                THEN ROUND(CAST(agg.n * agg.sxy - agg.sx * agg.sy
                           AS DOUBLE)
                  / sqrt(CAST(agg.n * agg.sxx - agg.sx * agg.sx
                         AS DOUBLE)
                         * CAST(agg.n * agg.syy - agg.sy * agg.sy
                           AS DOUBLE)), 6)
           END AS assortativity
    FROM agg CROSS JOIN nn
    """
