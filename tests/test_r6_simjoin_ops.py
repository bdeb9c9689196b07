"""Round-6 similarity/sequence operators: TF-IDF cosine join,
Jaccard threshold curve, Markov top-1 accuracy."""

import math

import pytest
from pyspark.sql import functions as F


def test_tfidf_cosine_identical_docs_score_one(spark):
    from dbt_incremental_ci_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "delta epsilon zeta eta"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(df, min_cosine=0.0, df_cap=None).collect()}
    assert out[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert (1, 3) not in out and (2, 3) not in out  # disjoint vocab


def test_tfidf_df_cap_drops_hot_tokens(spark):
    """A token present in every doc is dropped by df_cap=2, removing
    the only overlap between docs 1 and 3."""
    from dbt_incremental_ci_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    docs = [
        (1, "common alpha"),
        (2, "common alpha"),
        (3, "common beta"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    capped = {(r["id_a"], r["id_b"])
              for r in tfidf_cosine_pairs(df, min_cosine=0.0, df_cap=2).collect()}
    assert capped == {(1, 2)}


def test_jaccard_curve_monotone_and_catches_known_dup(spark):
    from dbt_incremental_ci_spark.operators.dedup import (
        jaccard_threshold_curve,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = [
        (1, base),
        (2, base),                       # exact dup: jaccard 1.0
        (3, base + "totally new tail"),  # near dup
        (4, "completely different content with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["threshold"]: r["n_pairs_over"]
           for r in jaccard_threshold_curve(df, "doc_id", "text").collect()}
    # monotone non-increasing in threshold
    ts = sorted(out)
    assert all(out[ts[i]] >= out[ts[i + 1]] for i in range(len(ts) - 1))
    assert out[0.9] >= 1          # the exact dup survives 0.9
    assert out[0.5] >= out[0.9]


def test_markov_top1_accuracy_deterministic_chain(spark):
    """Chain a->b->a->b...: from 'a' always predicts 'b' (accuracy 1),
    same for 'b'."""
    from dbt_incremental_ci_spark.operators.sequences import (
        markov_top1_accuracy,
    )

    rows = [(1, i, "a" if i % 2 == 0 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, "k int, o int, s string")
    out = {r["from_state"]: r for r in
           markov_top1_accuracy(df, "k", ["o"], "s").collect()}
    assert out["a"]["predicted"] == "b" and out["a"]["accuracy"] == 1.0
    assert out["b"]["predicted"] == "a" and out["b"]["accuracy"] == 1.0


def test_markov_top1_accuracy_mixed(spark):
    """From 'a': 3x to 'b', 1x to 'c' → predict 'b', accuracy 0.75."""
    from dbt_incremental_ci_spark.operators.sequences import (
        markov_top1_accuracy,
    )

    seq = ["a", "b", "a", "b", "a", "b", "a", "c"]
    rows = [(1, i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "k int, o int, s string")
    out = {r["from_state"]: r for r in
           markov_top1_accuracy(df, "k", ["o"], "s").collect()}
    assert out["a"]["predicted"] == "b"
    assert out["a"]["n_pairs"] == 4 and out["a"]["n_correct"] == 3
    assert out["a"]["accuracy"] == 0.75
