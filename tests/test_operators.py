"""Unit tests for the scale operators: dedup, similarity, text, recursion."""

import math

from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators import dedup, similarity, text
from dbt_incremental_ci_spark.plans.recursion import recursive_loop

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3, "completely unrelated text about spark query engines and columnar io paths"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    df = docs_df(spark)
    groups = dedup.exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0]["ids"] == [1, 4]
    survivors = dedup.exact_dedup(df, "doc_id", "text")
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 2, 3]


def test_minhash_finds_near_dups(spark):
    df = docs_df(spark)
    pairs = dedup.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.7)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_jaccard_values(spark):
    df = docs_df(spark)
    pairs = spark.createDataFrame([(1, 4), (1, 3)], ["id_a", "id_b"])
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_verify(df, pairs, "doc_id", "text", 0.0).collect()
    }
    assert out[(1, 4)] == 1.0  # identical docs
    assert out[(1, 3)] < 0.2


def test_simhash_hamming(spark):
    df = docs_df(spark)
    sigs = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", dedup.simhash("text").alias("sh")).collect()
    }
    assert sigs[1] == sigs[4]  # identical docs → identical signature
    ham = lambda a, b: bin(a ^ b).count("1")
    # one-token edit is much closer than an unrelated doc
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    pairs = dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=0)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got == {(1, 4): 0}


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(20, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    out = similarity.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    sims[0] = -1
    expected = list(np.argsort(-np.round(sims, 6), kind="stable")[:3])
    assert got == [int(x) for x in expected]


def test_brute_force_topk_guardrail(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    # 20 x 20 = 400 pairs > max_pairs=100 -> refuse the quadratic plan
    with pytest.raises(ValueError, match="lsh_topk or ivf_topk"):
        similarity.brute_force_topk(df, df, k=3, max_pairs=100)
    # explicit opt-out accepts it
    assert similarity.brute_force_topk(df, df, k=1, max_pairs=None).count() > 0


def test_lsh_topk_subset_of_bucket(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.rand(50, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        ["vec_id", "embedding"],
    )
    out = similarity.lsh_topk(
        df, df.filter(F.col("vec_id") < 3), k=5, dim=16, n_planes=2
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["rank"] <= 5 for r in rows)


def test_cosine_expression(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"])
    got = [r[0] for r in df.select(similarity.cosine(F.col("a"), F.col("b"))).collect()]
    assert abs(got[0]) < 1e-12 and abs(got[1] - 1.0) < 1e-12


def test_text_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! the the end.")], ["doc_id", "text"])
    row = text.with_text_stats(df).collect()[0]
    assert row["n_tokens"] == 5
    assert row["n_chars_computed"] == 26
    assert row["punct_ratio"] > 0
    assert 0 <= row["quality_score"] <= 1
    assert row["lang_pred"] == "en"  # 'the' ×2


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [
            (1, "el perro y el gato en la casa"),
            (2, "der hund und die katze ist das"),
            (3, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r[1] for r in df.select("doc_id", text.lang_id("text")).collect()}
    assert got == {1: "es", 2: "de", 3: "und"}


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma BETA alpha alpha")], ["doc_id", "text"]
    )
    fps = [r[0] for r in df.select(text.fingerprint("text")).collect()]
    assert fps[0] == fps[1]


def test_recursive_loop_chain(spark):
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (5, 4)], ["child", "parent"]
    )
    seed = spark.createDataFrame([(1, 0)], ["node", "depth"])

    def step(frontier, depth):
        return edges.join(
            frontier.select(F.col("node").alias("p"), "depth"),
            edges.parent == F.col("p"),
        ).select(F.col("child").alias("node"), (F.col("depth") + 1).alias("depth"))

    out = {r["node"]: r["depth"] for r in recursive_loop(seed, step).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_recursive_loop_depth_cap(spark):
    edges = spark.createDataFrame([(i + 1, i) for i in range(1, 30)], ["child", "parent"])
    seed = spark.createDataFrame([(1, 0)], ["node", "depth"])

    def step(frontier, depth):
        return edges.join(
            frontier.select(F.col("node").alias("p"), "depth"),
            edges.parent == F.col("p"),
        ).select(F.col("child").alias("node"), (F.col("depth") + 1).alias("depth"))

    out = recursive_loop(seed, step, max_iterations=10)
    assert out.count() == 11  # seed + 10 iterations, cap respected


def test_jaccard_verify_prune_no_forced_broadcast(spark):
    """The candidate-id semi-join prune must follow AQE's choice, not a
    forced broadcast: on a dup-heavy corpus the candidate set is itself
    data-sized (round-2 scale fix). threshold -1 emulates AQE declining;
    the executed plan must then contain no BroadcastExchange at all."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body text number "), F.col("id")).alias("text"),
        )
        pairs = spark.range(0, 1000).select(
            F.col("id").alias("id_a"), (F.col("id") + 1000).alias("id_b")
        )
        out = dedup.jaccard_verify(df, pairs, "doc_id", "text", 0.0)
        assert len(out.collect()) == 1000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_edit_distance_pairs_exact_neighborhood(spark):
    """Deletion-neighborhood blocking is EXACT for lev<=1: identity,
    substitution, insertion/deletion pairs all found; lev=2 pairs and
    cross-block pairs excluded."""
    from dbt_incremental_ci_spark.operators import fuzzy

    df = spark.createDataFrame(
        [
            (1, 1, "smith"),
            (2, 1, "smith"),   # identical        -> dist 0
            (3, 1, "smyth"),   # substitution     -> dist 1 vs 1,2
            (4, 1, "smiths"),  # insertion        -> dist 1 vs 1,2
            (5, 1, "smythe"),  # dist 1 vs 3 (insertion); dist 2 vs 1,4 (excluded)
            (6, 1, "jones"),   # unrelated
            (7, 2, "smith"),   # other block: no cross-block pairs
        ],
        ["id", "blk", "name"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy.edit_distance_pairs(
            df, "id", "name", block_cols=["blk"]
        ).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1, (1, 4): 1, (2, 4): 1,
                   (3, 5): 1}

    # exhaustive agreement with the quadratic plan on a generated corpus
    words = [(i, 0, w) for i, w in enumerate(
        ["abcde", "abde", "abcdee", "xbcde", "abcdx", "abcd", "zzzzz"])]
    df2 = spark.createDataFrame(words, ["id", "blk", "name"])
    fast = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy.edit_distance_pairs(df2, "id", "name").collect()
    }
    a, b = df2.alias("a"), df2.alias("b")
    brute = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr("levenshtein(a.name, b.name, 1)").cast("int").alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 1))
        .collect()
    }
    assert fast == brute


def test_edit_distance_pairs_rejects_unsupported_radius(spark):
    from dbt_incremental_ci_spark.operators import fuzzy

    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_dist=1"):
        fuzzy.edit_distance_pairs(df, "id", "name", max_dist=2)


def test_adaptive_n_planes_growth():
    from dbt_incremental_ci_spark.operators.dedup import adaptive_n_planes

    assert adaptive_n_planes(0) == 6
    assert adaptive_n_planes(2_100) == 6        # every correctness SF -> floor
    assert adaptive_n_planes(20_050) == 9       # sf1 replica
    assert adaptive_n_planes(64 * 2**16) == 16  # clamped at hi
    # expected bucket size stays ~target as n grows 10x
    assert adaptive_n_planes(200_000) - adaptive_n_planes(20_000) in (3, 4)


def test_banded_lsh_superset_of_single_band(spark):
    """Banding only ever ADDS recall: band 0 replays the single-band
    blocking (same seed), so after the exact-cosine verify the banded
    result is a superset of the single-band result."""
    from dbt_incremental_ci_spark.operators import dedup, similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = emb.withColumn(
        "bucket", similarity.hyperplane_bucket("embedding", dim=64, n_planes=6)
    )
    base = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            single, "vec_id", "embedding", threshold=0.5, block_col="bucket"
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs_banded(
            emb, "vec_id", "embedding", dim=64, threshold=0.5,
            bands=4, planes_per_band=6,
        ).collect()
    }
    assert base <= banded


def test_decontamination_flags_planted_and_cleans(spark):
    """Planted near-copies of eval docs are flagged; decontaminate()
    drops exactly the flagged ids; sub-n-token docs shingle to empty."""
    from dbt_incremental_ci_spark.operators import decontam

    evals = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # near-copy: shares interior 5-grams despite the prefix
            (10, "copied alpha beta gamma delta epsilon zeta eta theta"),
            # unrelated
            (11, "one two three four five six seven eight nine"),
            # too short for any 5-gram
            (12, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    flagged = {
        r["doc_id"]: r["overlap_ngrams"]
        for r in decontam.contaminated(
            corpus, evals, n=5, min_overlap=3
        ).collect()
    }
    assert set(flagged) == {10}
    assert flagged[10] == 4  # 8-token eval doc has 4 distinct 5-grams
    clean = {
        r["doc_id"]
        for r in decontam.decontaminate(corpus, evals, n=5, min_overlap=3)
        .select("doc_id")
        .collect()
    }
    assert clean == {11, 12}


def test_word_ngrams_edges(spark):
    from dbt_incremental_ci_spark.operators.decontam import word_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a b c",), ("  padded   spaces  here now  ",), ("",)], ["t"]
    )
    rows = df.select(word_ngrams("t", 2).alias("ng")).collect()
    assert rows[0]["ng"] == ["a b", "b c"]
    assert rows[1]["ng"] == ["padded spaces", "spaces here", "here now"]
    assert rows[2]["ng"] == []


def test_gopher_quality_rules(spark):
    """Each rule flags its planted pathological doc; a clean doc passes."""
    from dbt_incremental_ci_spark.operators import text as T

    clean = (
        "the quick brown fox jumps over a lazy dog while seven wise "
        "owls watch from tall oak trees near running water and sing "
        "gentle evening songs about distant mountain villages"
    )
    docs = spark.createDataFrame(
        [
            (1, clean),                                   # passes all rules
            (2, "spam ham " * 30),                        # dup words + top bigram
            (3, "word " + "### #### ##### " * 10),        # symbols
            (4, "too short"),                             # min tokens
            (5, "aa " * 25),                              # mean word len < 3
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in T.gopher_quality(docs).collect()}
    assert out[1]["gopher_keep"] is True
    assert out[2]["gopher_keep"] is False
    assert out[2]["dup_word_frac"] > 0.9
    # "spam ham"×30 alternates two bigrams: top one holds 30 of 59
    assert out[2]["top_bigram_frac"] > 0.5
    assert out[3]["gopher_keep"] is False
    assert out[3]["symbol_to_word"] > 0.1
    assert out[4]["gopher_keep"] is False
    assert out[5]["gopher_keep"] is False
    assert out[5]["mean_word_len"] == 2.0


def test_pq_encode_and_adc(spark):
    """Codes are in range, deterministic, and ADC ranks the exact
    nearest neighbor first on well-separated clusters."""
    from pyspark.sql import functions as F
    from dbt_incremental_ci_spark.operators import similarity as S

    # two tight clusters far apart: PQ must keep them separated
    base_a = [0.2] * 64
    base_b = [-0.2] * 64
    rows = []
    for i in range(6):
        eps = 0.001 * i
        rows.append((i, [x + eps for x in base_a]))
        rows.append((100 + i, [x - eps for x in base_b]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    codes = emb.select(
        "vec_id", S.pq_encode("embedding", dim=64, m=8, ks=8).alias("code")
    ).collect()
    for r in codes:
        assert len(r["code"]) == 8
        assert all(0 <= c < 8 for c in r["code"])
    by_id = {r["vec_id"]: tuple(r["code"]) for r in codes}
    # same-cluster vectors encode identically; clusters differ
    assert by_id[0] == by_id[5]
    assert by_id[100] == by_id[105]

    out = S.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=5, dim=64, m=8, ks=8
    ).collect()
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # all five same-cluster neighbors outrank every cross-cluster vector
    assert set(got) == {1, 2, 3, 4, 5}


def test_train_pq_codebooks_beats_hash_on_clusters(spark):
    """Trained codebooks reconstruct clustered data with far lower
    quantization error than the hash-derived defaults."""
    import numpy as np
    from dbt_incremental_ci_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    centers = rng.uniform(-0.4, 0.4, size=(4, 64))
    X = np.vstack([c + rng.normal(0, 0.01, size=(30, 64)) for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )
    trained = S.train_pq_codebooks(emb, dim=64, m=8, ks=8, iters=5)
    assert len(trained) == 8 and all(len(cb) == 8 for cb in trained)

    def quant_err(cbs):
        err = 0.0
        for j in range(8):
            sub = X[:, j * 8 : (j + 1) * 8]
            cw = np.asarray(cbs[j])
            d = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            err += d.min(axis=1).sum()
        return err

    hash_err = quant_err(S.pq_codebooks(64, 8, 8))
    trained_err = quant_err(trained)
    assert trained_err < 0.5 * hash_err


def test_mixture_rates_math():
    import pytest
    from dbt_incremental_ci_spark.operators.sampling import mixture_rates

    counts = {"en": 200, "de": 50, "fr": 50}
    rates = mixture_rates(counts, {"en": 0.5, "de": 0.25, "fr": 0.25})
    # de/fr are binding (50/0.25=200 < en 200/0.5=400): they keep 1.0
    assert rates["de"] == 1.0 and rates["fr"] == 1.0
    assert abs(rates["en"] - 0.5) < 1e-12  # 0.5*200/200
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_rates(counts, {"en": 0.5})
    with pytest.raises(ValueError, match="no rows"):
        mixture_rates(counts, {"en": 0.5, "ja": 0.5})


def test_mixture_resample_hits_target(spark):
    from pyspark.sql import functions as F
    from dbt_incremental_ci_spark.operators.sampling import mixture_resample

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("rare").alias("lang"),
    )
    out = mixture_resample(
        df, "doc_id", "lang", {"en": 0.5, "rare": 0.5}, salt="t"
    )
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # rare (800 rows) binds at rate 1.0; en downsamples to ~800
    assert got["rare"] == 800
    assert abs(got["en"] - 800) < 120  # binomial tolerance ~4 sigma
    # determinism: same call → identical survivor set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in mixture_resample(
        df, "doc_id", "lang", {"en": 0.5, "rare": 0.5}, salt="t").collect()}
    assert a == b


def test_cross_corpus_dedup_and_survivors(spark):
    from pyspark.sql import functions as F
    from dbt_incremental_ci_spark.operators import dedup as D

    corpus = docs_df(spark)  # ids 1-4; 1==4 exact, 2 near
    batch = spark.createDataFrame(
        [
            # near-copy of corpus doc 1
            (101, "the quick brown fox jumps over the lazy dog near the river bank today ok"),
            # genuinely new
            (102, "entirely novel content that matches nothing in the existing corpus at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = D.cross_corpus_dedup_pairs(
        corpus, batch, "doc_id", "text", threshold=0.7
    ).collect()
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs}
    # 101 matches 1 and its exact twin 4 (and near-dup 2); never 3
    assert (101, 1) in got and (101, 4) in got
    assert not any(b == 102 for b, _ in got)
    assert all(r["jaccard"] >= 0.7 for r in pairs)

    survivors = D.incremental_dedup(
        corpus, batch, "doc_id", "text", threshold=0.7
    )
    assert [r["doc_id"] for r in survivors.select("doc_id").collect()] == [102]


def test_per_category_cap(spark):
    from pyspark.sql import functions as F
    from dbt_incremental_ci_spark.operators.sampling import per_category_cap

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("dom")
    )
    out = per_category_cap(df, "doc_id", "dom", cap=10, salt="x")
    sizes = {r["dom"]: r["n"] for r in
             out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"0": 10, "1": 10, "2": 10}
    # deterministic: same kept set on re-run
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in per_category_cap(df, "doc_id", "dom", 10, "x").collect()}
    assert a == b
    # under-cap categories keep everything
    small = spark.createDataFrame([(1, "z"), (2, "z")], ["doc_id", "dom"])
    assert per_category_cap(small, "doc_id", "dom", 10).count() == 2


def test_epoch_shuffle_rank(spark):
    from pyspark.sql import functions as F
    from dbt_incremental_ci_spark.operators.sampling import (
        epoch_shuffle_rank,
        hash_uniform,
    )

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    e1 = epoch_shuffle_rank(df, "doc_id", epoch=1)
    ranks = [r["shuffle_rank"] for r in e1.collect()]
    assert sorted(ranks) == list(range(1, 501))  # dense total order
    # rank order == variate order (two-phase == naive single-task)
    naive = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            df.withColumn("u", hash_uniform("doc_id", "shuffle:1"))
            .orderBy("u", "doc_id")
            .collect()
        )
    }
    got = {r["doc_id"]: r["shuffle_rank"] for r in e1.collect()}
    assert got == naive
    # different epochs give different orders
    e2 = {r["doc_id"]: r["shuffle_rank"]
          for r in epoch_shuffle_rank(df, "doc_id", epoch=2).collect()}
    assert e2 != got


def test_unigram_logprob(spark):
    import math
    from dbt_incremental_ci_spark.operators import text as T

    # corpus: 'a' x3, 'b' x1 → p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in T.unigram_logprob(df).collect()}
    assert got[1]["n_tokens"] == 2 and got[2]["n_tokens"] == 2
    assert abs(got[1]["avg_logprob"] - math.log(0.75)) < 1e-9
    expected2 = (math.log(0.75) + math.log(0.25)) / 2
    assert abs(got[2]["avg_logprob"] - expected2) < 1e-9
    # rare-token doc scores strictly lower
    assert got[2]["avg_logprob"] < got[1]["avg_logprob"]
