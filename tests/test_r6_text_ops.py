"""Round-6 graph/text operators: Apriori L3 triples, skip-gram PMI,
RAKE keywords."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- Apriori L3
def test_frequent_triples_hand_computed(spark):
    """Baskets: {a,b,c} x3, {a,b,d} x1 → triple (a,b,c) count 3;
    support 3/4; conf (a,b)->c = 3/4 (pair ab in all 4); lift =
    (3/4) / (3/4 baskets contain c) = 1."""
    from dbt_incremental_ci_spark.operators.association import (
        frequent_triples,
    )

    rows = []
    for b in range(3):
        rows += [(b, "a"), (b, "b"), (b, "c")]
    rows += [(3, "a"), (3, "b"), (3, "d")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = frequent_triples(df, "basket", "item", min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["item_c"]) == ("a", "b", "c")
    assert r["triple_count"] == 3
    assert r["support"] == 0.75
    assert r["conf_ab_to_c"] == 0.75
    assert r["lift_ab_to_c"] == 1.0


def test_frequent_triples_basket_guard_raises(spark):
    from dbt_incremental_ci_spark.operators.association import (
        frequent_triples,
    )

    rows = [(1, f"i{j}") for j in range(30)]
    df = spark.createDataFrame(rows, "basket int, item string")
    with pytest.raises(Exception, match="max_basket_items"):
        frequent_triples(
            df, "basket", "item", min_count=1, max_basket_items=10
        ).collect()


# ---------------------------------------------------- skip-gram PMI
def test_skipgram_pmi_window_and_canonicalization(spark):
    """Doc 'x y z': window=2 pairs = (x,y),(x,z),(y,z); window=1
    drops (x,z). Reversed doc 'z y x' must accumulate into the SAME
    canonical rows."""
    from dbt_incremental_ci_spark.operators.collocations import (
        skipgram_pmi,
    )

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "z y x")], "doc_id int, text string"
    )
    out = {
        (r["w1"], r["w2"]): r["n_pair"]
        for r in skipgram_pmi(
            df, "doc_id", "text", window=2, min_pair_count=1, top_k=None
        ).collect()
    }
    assert out == {("x", "y"): 2, ("x", "z"): 2, ("y", "z"): 2}

    out1 = {
        (r["w1"], r["w2"]): r["n_pair"]
        for r in skipgram_pmi(
            df, "doc_id", "text", window=1, min_pair_count=1, top_k=None
        ).collect()
    }
    assert ("x", "z") not in out1
    assert out1[("x", "y")] == 2 and out1[("y", "z")] == 2


def test_skipgram_pmi_value(spark):
    """Single doc 'a b a b': window=1 pairs: (a,b) x3. T=3, n_a=2,
    n_b=2, n_tok=4 → pmi = ln((3/3)/((2/4)*(2/4))) = ln(4)."""
    from dbt_incremental_ci_spark.operators.collocations import (
        skipgram_pmi,
    )

    df = spark.createDataFrame([(1, "a b a b")], "doc_id int, text string")
    rows = skipgram_pmi(
        df, "doc_id", "text", window=1, min_pair_count=1, top_k=None
    ).collect()
    assert len(rows) == 1
    assert rows[0]["pmi"] == pytest.approx(math.log(4), abs=1e-6)


# ------------------------------------------------------------- RAKE
def test_rake_segments_on_stopwords_and_scores(spark):
    """'deep learning of deep learning' → phrases 'deep learning' x2
    ('of' delimits). deg(deep)=4, freq=2 → 2; same for learning;
    phrase score = 4."""
    from dbt_incremental_ci_spark.operators.keywords import rake_keywords

    df = spark.createDataFrame(
        [(1, "deep learning of deep learning")],
        "doc_id int, text string",
    )
    out = rake_keywords(df, "doc_id", "text", min_freq=2, top_k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["phrase"] == "deep learning"
    assert r["n_words"] == 2 and r["freq"] == 2
    assert r["score"] == pytest.approx(4.0, abs=1e-6)


def test_rake_punctuation_stripped_and_lowercased(spark):
    from dbt_incremental_ci_spark.operators.keywords import rake_keywords

    df = spark.createDataFrame(
        [(1, "Neural Networks! and neural networks?")],
        "doc_id int, text string",
    )
    out = rake_keywords(df, "doc_id", "text", min_freq=2, top_k=5).collect()
    assert [r["phrase"] for r in out] == ["neural networks"]
