"""Link prediction on an undirected graph (common-neighbor family:
resource-allocation and Adamic-Adar indices) and bipartite projection
with cosine-normalized co-occurrence — the graph-feature side of
recommendation and entity-resolution pipelines.

The reference has no graph surface (SURVEY.md §1.1 — its
"collaboration network" is pairwise SQL self-joins); this extends the
engine's graph stack (components, PageRank, HITS, k-core, triangles,
two-hop q253) with the standard "which non-edges are likely edges"
scores (Liben-Nowell & Kleinberg 2003; Zhou/Lü/Zhang 2009 resource
allocation; Adamic & Adar 2003) and the user-item → item-item
projection every co-purchase recommender starts from.

Scale design (the 100 TB story):

- Wedge volume is Σ_z deg(z)² over MIDDLE nodes z — the celebrity-hub
  blow-up. Both operators take a ``max_degree`` cap and drop hub
  middles BEFORE the self-join (the q253 part-degree-cap rule: a node
  connected to everyone contributes ~0 discrimination and deg² pairs;
  the oracle applies the identical cap so it is an operator semantic,
  not an approximation knob).
- Everything is equi-joins + hash aggregates on node ids; no
  cartesian, no collect, no Python.
- Determinism: common-neighbor counts are exact integers;
  resource-allocation terms 1/deg are IEEE-exact divisions summed
  after ROUND-9 into DECIMAL (the srm_check term rule); Adamic-Adar's
  1/ln(deg) terms use the same ROUND-9-then-exact-sum path (ln is not
  IEEE-pinned, but both engines' libm agree far beyond 9 dp on small
  integer arguments); cosine = c/sqrt(n_i·n_j) is one IEEE expression
  over exact integers, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbt_incremental_ci_spark.operators.triangles import (
    canonical_edges,
    degrees,
)


def neighbor_overlap_scores(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_degree: int = 64,
    top_k: int = 50,
) -> DataFrame:
    """Common-neighbor / resource-allocation / Adamic-Adar scores for
    the top candidate NON-edges of an undirected graph.

    Wedges u—z—v (u < v) enumerate once per common neighbor z via a
    self-join of the (middle-capped) adjacency on z; known edges are
    removed with a left-anti join; ties break on (u, v).

    Output: ``(node_u, node_v, n_common, ra_score, aa_score)`` — the
    ``top_k`` candidate pairs by (ra_score desc, node_u, node_v).
    """
    canon = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = degrees(canon)
    adj = canon.select(
        F.col("u").alias("z"), F.col("v").alias("n")
    ).unionAll(canon.select(F.col("v").alias("z"), F.col("u").alias("n")))
    # cap the WEDGE MIDDLE degree: Σ deg(z)² is the pair volume
    # deg ≥ 2: a degree-1 middle can't close a wedge, and its
    # 1/ln(1) = ∞ would blow the ANSI decimal cast at materialization
    mid = (
        adj.join(deg.withColumnRenamed("node", "z"), "z")
        .filter((F.col("deg") <= max_degree) & (F.col("deg") >= 2))
        .select(
            "z",
            "n",
            F.round(1.0 / F.col("deg").cast("double"), 9)
            .cast("decimal(18,9)")
            .alias("__ra"),
            F.round(
                1.0 / F.log(F.col("deg").cast("double")), 9
            )
            .cast("decimal(18,9)")
            .alias("__aa"),
        )
        .localCheckpoint(eager=False)
    )
    a = mid.select("z", F.col("n").alias("node_u"), "__ra", "__aa")
    b = mid.select("z", F.col("n").alias("node_v"))
    wedges = a.join(b, "z").filter(F.col("node_u") < F.col("node_v"))
    scored = wedges.groupBy("node_u", "node_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.sum("__ra").alias("__ras"),
        F.sum("__aa").alias("__aas"),
    )
    non_edges = scored.join(
        canon,
        (scored["node_u"] == canon["u"]) & (scored["node_v"] == canon["v"]),
        "left_anti",
    )
    return (
        non_edges.select(
            "node_u",
            "node_v",
            "n_common",
            F.round(F.col("__ras").cast("double"), 6).alias("ra_score"),
            F.round(F.col("__aas").cast("double"), 6).alias("aa_score"),
        )
        .orderBy(F.desc("ra_score"), "node_u", "node_v")
        .limit(top_k)
    )


def neighbor_overlap_scores_sql(
    edges_rows: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_degree: int = 64,
    top_k: int = 50,
) -> str:
    """DuckDB twin of :func:`neighbor_overlap_scores`. ``edges_rows``
    is a FROM-able relation of raw (possibly duplicated) edges."""
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
    adj AS (
      SELECT u AS z, v AS n FROM canon
      UNION ALL SELECT v AS z, u AS n FROM canon
    ),
    mid AS (
      SELECT adj.z, adj.n,
             CAST(ROUND(1.0 / deg.d, 9) AS DECIMAL(18,9)) AS ra,
             CAST(ROUND(1.0 / ln(CAST(deg.d AS DOUBLE)), 9)
                  AS DECIMAL(18,9)) AS aa
      FROM adj JOIN deg ON adj.z = deg.node
      WHERE deg.d <= {max_degree} AND deg.d >= 2
    ),
    wedges AS (
      SELECT a.n AS node_u, b.n AS node_v, a.ra, a.aa
      FROM mid a JOIN mid b ON a.z = b.z AND a.n < b.n
    ),
    scored AS (
      SELECT node_u, node_v, CAST(count(*) AS BIGINT) AS n_common,
             SUM(ra) AS ras, SUM(aa) AS aas
      FROM wedges GROUP BY 1, 2
    ),
    non_edges AS (
      SELECT s.* FROM scored s
      ANTI JOIN canon c ON s.node_u = c.u AND s.node_v = c.v
    )
    SELECT node_u, node_v, n_common,
           ROUND(CAST(ras AS DOUBLE), 6) AS ra_score,
           ROUND(CAST(aas AS DOUBLE), 6) AS aa_score
    FROM non_edges
    ORDER BY ra_score DESC, node_u, node_v
    LIMIT {top_k}
    """


def item_cooccurrence_cosine(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int = 128,
    min_support: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Bipartite projection: item-item cosine similarity from basket
    co-occurrence — cos(i,j) = c_ij / sqrt(n_i·n_j) over distinct
    (basket, item) incidences. The first model of every co-purchase /
    co-view recommender (Linden et al. 2003, item-item CF).

    Pair volume is Σ C(|basket|,2); baskets larger than
    ``max_basket_items`` are DROPPED (cap is an operator semantic,
    applied identically by the oracle — the association.py rule, but
    filtering rather than raising because a degenerate mega-basket is
    expected noise in clickstreams, not a data bug).

    Output: top ``top_k`` pairs by (cosine desc, item_a, item_b) with
    ``c_ij ≥ min_support``; cosine is one IEEE expression over exact
    integers, rounded 6.
    """
    # Round-11 measured NEGATIVE result (kept as the self-join on
    # purpose): rewriting this prefix in the q253 shape — window-count
    # size cap + sorted per-basket item set + in-partition canonical
    # pair explosion via nested array transforms — measured 3.4×
    # SLOWER here (paired A/B at sf0.1: explosion 10.2 s median vs
    # join 2.97 s). The explosion wins only when the per-group sets
    # are tiny (q253's co-supplier sets: median degree ~4, cap 40);
    # at basket sizes near this cap (128) the O(|basket|²) struct
    # array built per basket costs far more than the join's streamed
    # pair generation. Do not re-try blind.
    # Round-12 prefix alignment (guide §2.4, the WINNING half of the
    # q253 rework — the pair explosion stays reverted per the note
    # above): hash the incidence frame by basket ONCE, then the
    # distinct (ClusteredDistribution(__b,__i) is satisfied by
    # HashPartitioning(__b)), the size cap (a partition-local window
    # count instead of a groupBy + join back), and BOTH sides of the
    # pair self-join all reuse that single exchange. A degenerate
    # mega-basket streams through the sort-based window and is dropped
    # by the cap — never collected per-group.
    from pyspark.sql import Window

    inc = (
        baskets.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .repartition("__b")
        .dropDuplicates(["__b", "__i"])
    )
    kept = (
        inc.withColumn(
            "__sz", F.count(F.lit(1)).over(Window.partitionBy("__b"))
        )
        .filter(F.col("__sz") <= max_basket_items)
        .select("__b", "__i")
        .localCheckpoint(eager=False)  # pairs + margins both read it
    )
    n_i = kept.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    a = kept.select("__b", F.col("__i").alias("item_a"))
    b = kept.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ij"))
        .filter(F.col("c_ij") >= min_support)
    )
    na = n_i.select(F.col("__i").alias("item_a"), F.col("__n").alias("__na"))
    nb = n_i.select(F.col("__i").alias("item_b"), F.col("__n").alias("__nb"))
    out = (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            "c_ij",
            F.col("__na").cast("bigint").alias("n_a"),
            F.col("__nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("c_ij").cast("double")
                / F.sqrt(
                    (F.col("__na") * F.col("__nb")).cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return out.orderBy(F.desc("cosine"), "item_a", "item_b").limit(top_k)


def item_cooccurrence_cosine_sql(
    baskets_rows: str,
    basket_col: str,
    item_col: str,
    max_basket_items: int = 128,
    min_support: int = 2,
    top_k: int = 100,
) -> str:
    """DuckDB twin of :func:`item_cooccurrence_cosine`."""
    return f"""
    WITH inc AS (
      SELECT DISTINCT {basket_col} AS b, {item_col} AS i
      FROM {baskets_rows}
    ),
    sizes AS (SELECT b, count(*) AS sz FROM inc GROUP BY b),
    kept AS (
      SELECT inc.b, inc.i FROM inc JOIN sizes USING (b)
      WHERE sizes.sz <= {max_basket_items}
    ),
    n_i AS (SELECT i, count(*) AS n FROM kept GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b,
             CAST(count(*) AS BIGINT) AS c_ij
      FROM kept a JOIN kept b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2
      HAVING count(*) >= {min_support}
    )
    SELECT item_a, item_b, c_ij,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           ROUND(CAST(c_ij AS DOUBLE)
                 / sqrt(CAST(na.n * nb.n AS DOUBLE)), 6) AS cosine
    FROM pairs
    JOIN n_i na ON pairs.item_a = na.i
    JOIN n_i nb ON pairs.item_b = nb.i
    ORDER BY cosine DESC, item_a, item_b
    LIMIT {top_k}
    """
