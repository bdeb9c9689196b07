"""Round-6 graph/timeseries/ranking operators: assortativity, Fano
burstiness, rank agreement."""

import pytest
from pyspark.sql import functions as F


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: hub deg n links only
    to deg-1 leaves → r = -1."""
    from dbt_incremental_ci_spark.operators.triangles import (
        degree_assortativity,
    )

    edges = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    out = degree_assortativity(df).collect()[0]
    assert out["n_nodes"] == 8 and out["n_edges"] == 7
    assert out["assortativity"] == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_regular_graph_degenerate(spark):
    """A cycle (all degrees 2) has zero degree variance → NULL."""
    from dbt_incremental_ci_spark.operators.triangles import (
        degree_assortativity,
    )

    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    out = degree_assortativity(df).collect()[0]
    assert out["assortativity"] is None


def test_fano_poisson_like_vs_bursty(spark):
    """Uniform one-event-per-bucket stream: var 0 → fano 0. All
    events in one bucket of a long span → fano >> 1."""
    from dbt_incremental_ci_spark.operators.timeseries import (
        fano_burstiness,
    )

    bucket = 10
    uniform = [("calm", i * bucket) for i in range(50)]
    bursty = [("burst", 0)] * 50 + [("burst", 49 * bucket)]
    df = spark.createDataFrame(uniform + bursty, "k string, tsn long")
    out = {r["key"]: r for r in
           fano_burstiness(df, "k", "tsn", bucket_ns=bucket).collect()}
    assert out["calm"]["fano"] == 0.0 and not out["calm"]["bursty"]
    assert out["burst"]["fano"] > 10 and out["burst"]["bursty"]
    assert out["burst"]["n_buckets"] == 50  # empty buckets included


def test_rank_agreement_identical_and_disjoint(spark):
    from dbt_incremental_ci_spark.operators.retrieval import rank_agreement

    k = 5
    la = spark.createDataFrame(
        [("q", i + 100, i + 1) for i in range(k)],
        "query_id string, doc_id int, rnk int",
    )
    same = rank_agreement(la, la, k=k).collect()[0]
    assert same["overlap_at_k"] == k
    assert same["jaccard_at_k"] == 1.0
    # identical lists: RBO = (1-p)*sum p^(d-1) = 1 - p^k
    assert same["rbo"] == pytest.approx(1 - 0.9 ** k, abs=1e-5)

    lb = spark.createDataFrame(
        [("q", i + 900, i + 1) for i in range(k)],
        "query_id string, doc_id int, rnk int",
    )
    diff = rank_agreement(la, lb, k=k).collect()
    # disjoint lists never join — acceptable contract: no output row
    # (the workload query's lists always share the corpus)
    assert diff == [] or diff[0]["overlap_at_k"] == 0


def test_rank_agreement_top_weighted(spark):
    """Agreement at the TOP is worth more: lists sharing ranks 1-2
    score higher RBO than lists sharing ranks 4-5."""
    from dbt_incremental_ci_spark.operators.retrieval import rank_agreement

    base = [("q", i, i + 1) for i in range(5)]
    la = spark.createDataFrame(base, "query_id string, doc_id int, rnk int")
    top_match = spark.createDataFrame(
        [("q", 0, 1), ("q", 1, 2), ("q", 90, 3), ("q", 91, 4), ("q", 92, 5)],
        "query_id string, doc_id int, rnk int",
    )
    tail_match = spark.createDataFrame(
        [("q", 90, 1), ("q", 91, 2), ("q", 92, 3), ("q", 3, 4), ("q", 4, 5)],
        "query_id string, doc_id int, rnk int",
    )
    r_top = rank_agreement(la, top_match, k=5).collect()[0]["rbo"]
    r_tail = rank_agreement(la, tail_match, k=5).collect()[0]["rbo"]
    assert r_top > r_tail
