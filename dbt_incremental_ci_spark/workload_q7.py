"""q228+: round-6 additions — survival analysis (Kaplan-Meier),
multiple-testing control (Benjamini-Hochberg FDR over slice
experiments), doubly-robust off-policy evaluation, leakage-free
group k-fold splits, Simpson's-paradox audits, and the round's
graph / text / embedding batches.

Split-module registration contract: see ``workload`` (the hub) and
``workload_base`` (registries + determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    d,
    dec,
    events_table,
    q,
    t,
)

# =====================================================================
# Kaplan-Meier survival (q228): time-to-first-purchase per user with
# right-censoring at the user's last observed event. One user-keyed
# aggregate → integer day durations → the KM life table (bounded by
# the observation window in days). survival.py for the estimator.
# =====================================================================
from dbt_incremental_ci_spark.operators.survival import (  # noqa: E402
    kaplan_meier,
    kaplan_meier_sql,
)

_KM_SUBJECTS = """(
  WITH per_user AS (
    SELECT user_id,
           min(epoch_us(ts)) AS t0,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS tp,
           max(epoch_us(ts)) AS tl
    FROM events GROUP BY 1
  )
  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
              ELSE (tl - t0) // 86400000000 END AS duration,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
)"""


@q("q228_kaplan_meier", kaplan_meier_sql(_KM_SUBJECTS, "duration", "event"))
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts: bigint nanoseconds (contract)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
        F.max("ts").alias("tl"),
    )
    end = F.coalesce(F.col("tp"), F.col("tl"))
    subjects = per_user.select(
        F.expr(
            "CAST((coalesce(tp, tl) - t0) DIV 86400000000000 AS BIGINT)"
        ).alias("duration"),
        F.col("tp").isNotNull().cast("int").alias("event"),
    )
    _ = end  # documented: ns → whole elapsed days by exact integer DIV
    return kaplan_meier(subjects, "duration", "event")


# =====================================================================
# BH-FDR slice experiment readout (q229): per-nation two-proportion
# z-tests (variant = orderkey parity, conversion = high-priority
# order) with Benjamini-Hochberg step-up control across the 25
# slices. evalmetrics.slice_ztest_bh for the estimator.
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    doubly_robust_eval,
    doubly_robust_eval_sql,
    slice_ztest_bh,
    slice_ztest_bh_sql,
)

_BH_UNITS = """(
  SELECT n.n_name AS slice_nation,
         CASE WHEN o.o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS converted
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)"""


@q(
    "q229_bh_fdr_slices",
    slice_ztest_bh_sql(
        _BH_UNITS, "slice_nation", "variant", "converted", alpha=0.2
    ),
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    units = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .select(
            F.col("n_name").alias("slice_nation"),
            F.when(F.col("o_orderkey") % 2 == 0, "A")
            .otherwise("B")
            .alias("variant"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .alias("converted"),
        )
    )
    return slice_ztest_bh(
        units, "slice_nation", "variant", "converted", alpha=0.2
    )


# =====================================================================
# Doubly-robust OPE (q230): grade the "best empirical event type per
# user segment" policy from the event logs — IPS, DR, and effective
# sample size in one row. evalmetrics.doubly_robust_eval.
# =====================================================================
_DR_LOGS = """(
  SELECT CAST(user_id % 4 AS INT) AS segment,
         event_type, value
  FROM events
)"""


@q(
    "q230_doubly_robust_ope",
    doubly_robust_eval_sql(_DR_LOGS, "segment", "event_type", "value"),
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).cast("int").alias("segment"),
        "event_type",
        "value",
    )
    return doubly_robust_eval(ev, "segment", "event_type", "value")


# =====================================================================
# Group k-fold (q231): leakage-free user-level 5-fold split with
# snake balancing over the events table. sampling.group_snake_kfold.
# =====================================================================
from dbt_incremental_ci_spark.operators.sampling import (  # noqa: E402
    group_snake_kfold,
    group_snake_kfold_sql,
)


@q("q231_group_kfold", group_snake_kfold_sql("events", "user_id", k=5))
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return group_snake_kfold(ev, "user_id", k=5)


# =====================================================================
# Simpson's-paradox audit (q232): per-nation mean order value by
# variant vs the pooled contrast — flags strata whose direction
# disagrees with the pooled direction (the aggregation-reversal
# trap; Simpson 1951). Pure two-level aggregate + broadcast of the
# 1-row pooled frame.
# =====================================================================
@q(
    "q232_simpson_audit",
    """
    WITH units AS (
      SELECT n.n_name AS nation,
             CASE WHEN o.o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END
               AS variant,
             o.o_totalprice AS val
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    strat AS (
      SELECT nation,
        CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        ROUND(CAST(SUM(CASE WHEN variant = 'A'
                 THEN CAST(ROUND(val, 2) AS DECIMAL(18,2)) END)
               AS DOUBLE)
              / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END), 6)
          AS mean_a,
        ROUND(CAST(SUM(CASE WHEN variant = 'B'
                 THEN CAST(ROUND(val, 2) AS DECIMAL(18,2)) END)
               AS DOUBLE)
              / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END), 6)
          AS mean_b
      FROM units GROUP BY nation
    ),
    pooled AS (
      SELECT ROUND(
        CAST(SUM(CASE WHEN variant = 'A'
               THEN CAST(ROUND(val, 2) AS DECIMAL(18,2)) END) AS DOUBLE)
          / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
        - CAST(SUM(CASE WHEN variant = 'B'
               THEN CAST(ROUND(val, 2) AS DECIMAL(18,2)) END) AS DOUBLE)
          / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END), 6)
        AS pooled_diff
      FROM units
    )
    SELECT nation, n_a, n_b, mean_a, mean_b,
           ROUND(mean_a - mean_b, 6) AS stratum_diff,
           pooled_diff,
           (mean_a - mean_b) * pooled_diff < 0 AS simpson_flip
    FROM strat CROSS JOIN pooled
    """,
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    units = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.when(F.col("o_orderkey") % 2 == 0, "A")
            .otherwise("B")
            .alias("variant"),
            F.col("o_totalprice").alias("val"),
        )
    )
    is_a = F.col("variant") == "A"
    is_b = F.col("variant") == "B"
    vdec = F.round(F.col("val"), 2).cast("decimal(18,2)")

    def mean_of(flag: F.Column) -> F.Column:
        return F.round(
            F.sum(F.when(flag, vdec)).cast("double")
            / F.sum(F.when(flag, 1).otherwise(0)),
            6,
        )

    strat = units.groupBy("nation").agg(
        F.sum(is_a.cast("int")).cast("bigint").alias("n_a"),
        F.sum(is_b.cast("int")).cast("bigint").alias("n_b"),
        mean_of(is_a).alias("mean_a"),
        mean_of(is_b).alias("mean_b"),
    )
    pooled = units.agg(
        F.round(mean_of(is_a) - mean_of(is_b), 6).alias("pooled_diff")
    )
    return strat.join(F.broadcast(pooled)).select(
        "nation",
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("stratum_diff"),
        "pooled_diff",
        (
            (F.col("mean_a") - F.col("mean_b")) * F.col("pooled_diff") < 0
        ).alias("simpson_flip"),
    )


# =====================================================================
# Apriori L3 (q233): frequent category triples over order baskets
# with (a,b)->c confidence/lift — downward-closure-pruned 3-way
# basket join (operators/association.frequent_triples).
# =====================================================================
from dbt_incremental_ci_spark.operators.association import (  # noqa: E402
    frequent_triples,
    frequent_triples_sql,
)

_L3_ROWS = (
    "(SELECT l_orderkey AS basket, l_partkey % 50 AS item FROM lineitem)"
)


@q(
    "q233_frequent_triples",
    frequent_triples_sql(_L3_ROWS, "basket", "item", min_count=5),
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 50).alias("item"),
    )
    return frequent_triples(li, "basket", "item", min_count=5)


# =====================================================================
# Skip-gram windowed PMI (q234): word-association mining within a
# ±3-token window — the word2vec/GloVe co-occurrence counting step
# (operators/collocations.skipgram_pmi).
# =====================================================================
from dbt_incremental_ci_spark.operators.collocations import (  # noqa: E402
    skipgram_pmi,
    skipgram_pmi_sql,
)


@q(
    "q234_skipgram_pmi",
    skipgram_pmi_sql(
        "documents", "doc_id", "text", window=3, min_pair_count=20, top_k=50
    ),
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return skipgram_pmi(
        docs, "doc_id", "text", window=3, min_pair_count=20, top_k=50
    )


# =====================================================================
# RAKE keyword extraction (q235): stopword-delimited candidate
# phrases scored deg/freq — corpus top-20 (operators/keywords).
# =====================================================================
from dbt_incremental_ci_spark.operators.keywords import (  # noqa: E402
    rake_keywords,
    rake_keywords_sql,
)


@q(
    "q235_rake_keywords",
    rake_keywords_sql("documents", "doc_id", "text", min_freq=2, top_k=20),
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return rake_keywords(docs, "doc_id", "text", min_freq=2, top_k=20)


# =====================================================================
# JL random-projection ANN (q236): project 64-dim embeddings to 8
# dims with a deterministic ±1 Achlioptas matrix (map-only, no
# shuffle), take exact top-5 cosine in the PROJECTED space, and
# report recall against original-space top-5 — the quality gate for
# trading vector bytes for candidate quality at 100 TB.
# =====================================================================
from dbt_incremental_ci_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    jl_project,
    jl_sign_vector,
)


def _q236_oracle() -> str:
    import math

    scale = 1.0 / math.sqrt(8)

    def arr(row: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in row) + "]"

    proj = (
        "["
        + ", ".join(
            f"list_dot_product(embedding::DOUBLE[], {arr(jl_sign_vector(64, j))})"
            f" * {scale!r}"
            for j in range(8)
        )
        + "]"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS ov, {proj} AS pv
      FROM embeddings
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 ROUND(list_dot_product(q.ov, c.ov)
                   / NULLIF(sqrt(list_dot_product(q.ov, q.ov))
                            * sqrt(list_dot_product(c.ov, c.ov)), 0), 6)
                 DESC, c.vec_id) AS rnk
        FROM base q JOIN base c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rnk <= 5
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 ROUND(list_dot_product(q.pv, c.pv)
                   / NULLIF(sqrt(list_dot_product(q.pv, q.pv))
                            * sqrt(list_dot_product(c.pv, c.pv)), 0), 6)
                 DESC, c.vec_id) AS rnk
        FROM base q JOIN base c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rnk <= 5
    )
    SELECT b.query_id,
           CAST(5 AS INT) AS k,
           CAST(count(a.neighbor_id) AS BIGINT) AS hits,
           ROUND(count(a.neighbor_id) / 5.0, 6) AS recall_at_k
    FROM brute b
    LEFT JOIN approx a ON a.query_id = b.query_id
                      AND a.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """


@q("q236_jl_projection_recall", _q236_oracle())
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(emb, probes, k=5).select(
        "query_id", F.col("neighbor_id").alias("__bn")
    )
    projected = jl_project(emb, "embedding", dim=64, out_dim=8).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    pprobes = projected.filter(F.col("vec_id") < 10)
    approx = brute_force_topk(projected, pprobes, k=5).select(
        "query_id", F.col("neighbor_id").alias("__an")
    )
    joined = brute.join(
        approx,
        (brute["query_id"] == approx["query_id"])
        & (brute["__bn"] == approx["__an"]),
        "left",
    ).select(brute["query_id"], approx["__an"])
    return joined.groupBy("query_id").agg(
        F.lit(5).cast("int").alias("k"),
        F.count("__an").cast("bigint").alias("hits"),
        F.round(F.count("__an") / F.lit(5.0), 6).alias("recall_at_k"),
    )


# =====================================================================
# Embedding dim-variance profile (q237): per-dimension moments of the
# vector corpus, top-16 by variance — the pre-quantization audit.
# =====================================================================
from dbt_incremental_ci_spark.operators.embstats import (  # noqa: E402
    dim_variance_profile,
    dim_variance_profile_sql,
    nearest_centroid_confusion,
    nearest_centroid_confusion_sql,
)


@q(
    "q237_dim_variance",
    dim_variance_profile_sql("embeddings", "embedding", top=16),
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return dim_variance_profile(emb, "embedding", top=16)


# =====================================================================
# Nearest-centroid confusion matrix (q238): Rocchio classification of
# every embedding against per-label centroids (broadcast model join,
# #classes fan-out), (true, pred) cells with per-class shares.
# =====================================================================
@q(
    "q238_nearest_centroid",
    nearest_centroid_confusion_sql(
        "embeddings", "embedding", "vec_id", "label"
    ),
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return nearest_centroid_confusion(emb, "embedding", "vec_id", "label")


# =====================================================================
# Mann-Whitney rank-sum drift test (q239): do 'purchase' event values
# stochastically dominate 'click' values? — the nonparametric
# distribution-shift test on the roc_auc two-phase rank machinery
# (drift.mann_whitney_u).
# =====================================================================
from dbt_incremental_ci_spark.operators.drift import (  # noqa: E402
    mann_whitney_u,
    mann_whitney_u_sql,
)


@q(
    "q239_mann_whitney",
    mann_whitney_u_sql("events", "value", "event_type", "purchase", "click"),
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return mann_whitney_u(ev, "value", "event_type", "purchase", "click")


# =====================================================================
# Mergeable moments (q240): per-shard power sums merged by addition
# == the direct profile, bit-for-bit — the oracle runs the DIRECT
# single-pass SQL, so a green hash PROVES shard-merge equivalence
# (profiling.moments_merge_profile; q174's register-merge pattern).
# =====================================================================
from dbt_incremental_ci_spark.operators.profiling import (  # noqa: E402
    moments_merge_profile,
    moments_profile_sql,
)


@q(
    "q240_moments_merge",
    moments_profile_sql("lineitem", ["l_extendedprice"]),
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return moments_merge_profile(
        li, "l_extendedprice", (F.col("l_orderkey") % 3)
    )


# =====================================================================
# Zipf fit (q241): OLS slope/r² of ln(freq) vs ln(rank) over the
# frequency-ranked vocabulary — corpus-health diagnostic
# (text.zipf_fit; two-phase ranks, decimal-folded OLS terms).
# =====================================================================
from dbt_incremental_ci_spark.operators.text import (  # noqa: E402
    zipf_fit,
    zipf_fit_sql,
)


@q("q241_zipf_fit", zipf_fit_sql("documents", "text", min_freq=2))
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", min_freq=2)


# =====================================================================
# Decision stump (q242): best information-gain split of order value
# against the high-priority label over a 9-threshold equal-width grid
# (operators/stump; bounded candidate fan-out, no quantile sort).
# =====================================================================
from dbt_incremental_ci_spark.operators.stump import (  # noqa: E402
    decision_stump,
    decision_stump_sql,
)

_STUMP_ROWS = (
    "(SELECT o_totalprice, "
    "o_orderpriority IN ('1-URGENT', '2-HIGH') AS hot FROM orders)"
)


@q(
    "q242_decision_stump",
    decision_stump_sql(_STUMP_ROWS, "o_totalprice", "hot", candidates=9),
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hot"),
    )
    return decision_stump(orders, "o_totalprice", "hot", candidates=9)


# =====================================================================
# Log-rank test (q243): do even- and odd-user cohorts share the
# time-to-first-purchase hazard? Same life-table machinery as q228
# (operators/survival.logrank_test).
# =====================================================================
from dbt_incremental_ci_spark.operators.survival import (  # noqa: E402
    logrank_test,
    logrank_test_sql,
)

_LR_SUBJECTS = """(
  WITH per_user AS (
    SELECT user_id,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp,
           min(epoch_us(ts)) AS t0,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS tp,
           max(epoch_us(ts)) AS tl
    FROM events GROUP BY 1, 2
  )
  SELECT grp,
         CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
              ELSE (tl - t0) // 86400000000 END AS duration,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
)"""


@q(
    "q243_logrank_test",
    logrank_test_sql(_LR_SUBJECTS, "duration", "event", "grp", "even", "odd"),
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
        F.max("ts").alias("tl"),
    )
    subjects = per_user.select(
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("grp"),
        F.expr(
            "CAST((coalesce(tp, tl) - t0) DIV 86400000000000 AS BIGINT)"
        ).alias("duration"),
        F.col("tp").isNotNull().cast("int").alias("event"),
    )
    return logrank_test(subjects, "duration", "event", "grp", "even", "odd")


# =====================================================================
# Heaps' law (q244): vocabulary growth at 10 token-prefix checkpoints
# + fitted exponent — first-occurrence rewrite of the sequential
# definition (operators/text.heaps_checkpoints).
# =====================================================================
from dbt_incremental_ci_spark.operators.text import (  # noqa: E402
    heaps_checkpoints,
    heaps_checkpoints_sql,
)


@q(
    "q244_heaps_law",
    heaps_checkpoints_sql("documents", "doc_id", "text", checkpoints=10),
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return heaps_checkpoints(docs, "doc_id", "text", checkpoints=10)


# =====================================================================
# G² collocations (q245): Dunning log-likelihood-ratio bigram
# association — the rare-pair-robust alternative to PMI on the same
# count substrate (collocations.gtest_collocations).
# =====================================================================
from dbt_incremental_ci_spark.operators.collocations import (  # noqa: E402
    gtest_collocations,
    gtest_collocations_sql,
)


@q(
    "q245_gtest_collocations",
    gtest_collocations_sql("documents", "text", min_pair_count=20, top_k=50),
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return gtest_collocations(docs, "text", min_pair_count=20, top_k=50)


# =====================================================================
# Covariate balance (q246): per-covariate standardized mean
# difference between experiment arms — the randomization sanity
# check before reading any lift (causal.covariate_balance).
# =====================================================================
from dbt_incremental_ci_spark.operators.causal import (  # noqa: E402
    covariate_balance,
    covariate_balance_sql,
    cuped,
    cuped_sql,
)

_BAL_ROWS = """(
  SELECT CASE WHEN o.o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END
           AS variant,
         o.o_totalprice,
         c.c_acctbal,
         CAST(c.c_mktsegment = 'BUILDING' AS INT) AS is_building
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)"""


@q(
    "q246_covariate_balance",
    covariate_balance_sql(
        _BAL_ROWS, "variant", ["o_totalprice", "c_acctbal", "is_building"]
    ),
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rows = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.when(F.col("o_orderkey") % 2 == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "o_totalprice",
        "c_acctbal",
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias(
            "is_building"
        ),
    )
    return covariate_balance(
        rows, "variant", ["o_totalprice", "c_acctbal", "is_building"]
    )


# =====================================================================
# CUPED (q247): pre-period activity as the control variate for the
# post-period metric — theta, variance reduction, raw vs adjusted
# lift between user-parity arms (causal.cuped).
# =====================================================================
_CUPED_UNITS = """(
  WITH mid AS (
    SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS m
    FROM events
  ),
  per_user AS (
    SELECT user_id,
      CAST(SUM(CASE WHEN epoch_ns(ts) < mid.m
           THEN CAST(ROUND(value, 6) AS DECIMAL(38,6)) ELSE 0 END)
        AS DOUBLE) AS pre,
      CAST(SUM(CASE WHEN epoch_ns(ts) >= mid.m
           THEN CAST(ROUND(value, 6) AS DECIMAL(38,6)) ELSE 0 END)
        AS DOUBLE) AS post
    FROM events CROSS JOIN mid
    GROUP BY user_id
  )
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         pre, post
  FROM per_user
)"""


@q(
    "q247_cuped",
    cuped_sql(_CUPED_UNITS, "user_id", "pre", "post", "variant"),
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts: bigint ns
    # integer DIV — (min+max) ~3.4e18 exceeds double's exact range, a
    # float halving would diverge from DuckDB's // on the last bits
    mid = ev.agg(
        F.min("ts").alias("__mn"), F.max("ts").alias("__mx")
    ).select(F.expr("CAST((__mn + __mx) DIV 2 AS BIGINT)").alias("__m"))
    vdec = F.round(F.col("value"), 6).cast("decimal(38,6)")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("__m"), vdec).otherwise(F.lit(0)))
            .cast("double")
            .alias("pre"),
            F.sum(
                F.when(F.col("ts") >= F.col("__m"), vdec).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("post"),
        )
    )
    units = per_user.select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
            "variant"
        ),
        "pre",
        "post",
    )
    return cuped(units, "user_id", "pre", "post", "variant")


# =====================================================================
# TF-IDF all-pairs cosine (q248): content-similarity join via the
# inverted index with a df-cap on hot tokens — pair volume
# Σ min(df, cap)², never docs² (retrieval.tfidf_cosine_pairs).
# =====================================================================
from dbt_incremental_ci_spark.operators.retrieval import (  # noqa: E402
    tfidf_cosine_pairs,
    tfidf_cosine_pairs_sql,
)


@q(
    "q248_tfidf_cosine_pairs",
    tfidf_cosine_pairs_sql(
        "documents", "doc_id", "text", min_cosine=0.25, df_cap=100
    ),
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, "doc_id", "text", min_cosine=0.25, df_cap=100
    )


# =====================================================================
# Jaccard dedup-threshold curve (q249): exact pair-similarity curve
# on a FIXED audit slice (§6o rule) — where to set the MinHash
# cutoff (dedup.jaccard_threshold_curve).
# =====================================================================
from dbt_incremental_ci_spark.operators.dedup import (  # noqa: E402
    jaccard_threshold_curve,
    jaccard_threshold_curve_sql,
)


@q(
    "q249_dedup_threshold_curve",
    jaccard_threshold_curve_sql(
        "(SELECT * FROM documents WHERE doc_id < 200)", "doc_id", "text"
    ),
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return jaccard_threshold_curve(docs, "doc_id", "text")


# =====================================================================
# Markov top-1 accuracy (q250): grade the transition-matrix baseline
# on its own stream — per-state argmax prediction accuracy
# (sequences.markov_top1_accuracy).
# =====================================================================
from dbt_incremental_ci_spark.operators.sequences import (  # noqa: E402
    markov_top1_accuracy,
    markov_top1_accuracy_sql,
)


@q(
    "q250_markov_accuracy",
    markov_top1_accuracy_sql(
        "(SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type "
        "FROM events)",
        "user_id",
        ["tsn", "event_id"],
        "event_type",
    ),
)
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return markov_top1_accuracy(
        ev, "user_id", ["ts", "event_id"], "event_type"
    )


# =====================================================================
# Consistent-hash reshard audit (q251): data movement growing 10 → 12
# shards, ring-with-vnodes vs static range sharding — the scale-out
# rewrite-cost readout (operators/sharding; ring broadcast as ONE
# sorted-array row, per-key assignment a pure codegen array fold).
# =====================================================================
from dbt_incremental_ci_spark.operators.sharding import (  # noqa: E402
    reshard_movement_audit,
    reshard_movement_audit_sql,
)


@q(
    "q251_reshard_audit",
    reshard_movement_audit_sql(
        "customer", "c_custkey", shards_before=10, shards_after=12
    ),
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return reshard_movement_audit(
        cust, "c_custkey", shards_before=10, shards_after=12
    )


# =====================================================================
# Count-min top-k accuracy (q252): grade the CMS point estimates
# against exact counts on the true top-20 tokens — the one-sided
# error the sketch trades for O(d·w) state (operators/countmin).
# =====================================================================
from dbt_incremental_ci_spark.operators.countmin import (  # noqa: E402
    _bucket_sql,
    countmin_build,
    countmin_estimate,
    countmin_sketch_sql,
)


def _q252_oracle() -> str:
    d, w, salt = 4, 512, "acc"
    stream = (
        r"(SELECT unnest(list_filter(string_split_regex(trim(lower(text)),"
        r" '\s+'), x -> x <> '')) AS tok FROM documents)"
    )
    probes = " UNION ALL ".join(
        f"SELECT tok, {r} AS r, {_bucket_sql('tok', r, w, salt)} AS b "
        "FROM top20"
        for r in range(d)
    )
    return f"""
    WITH stream AS (SELECT * FROM {stream}),
    sketch AS ({countmin_sketch_sql("stream", "tok", d, w, salt)}),
    exact AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
      FROM stream GROUP BY tok
    ),
    top20 AS (
      SELECT * FROM exact ORDER BY exact_n DESC, tok LIMIT 20
    ),
    probes AS ({probes}),
    est AS (
      SELECT p.tok, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS cm_est
      FROM probes p LEFT JOIN sketch s ON p.r = s.r AND p.b = s.b
      GROUP BY p.tok
    )
    SELECT t.tok AS token, t.exact_n, e.cm_est,
           CAST(e.cm_est - t.exact_n AS BIGINT) AS overestimate,
           ROUND(CAST(e.cm_est - t.exact_n AS DOUBLE) / t.exact_n, 6)
             AS rel_err
    FROM top20 t JOIN est e ON t.tok = e.tok
    """


@q("q252_cms_topk_accuracy", _q252_oracle())
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, w, salt = 4, 512, "acc"
    docs = t(spark, sf_dir, "documents")
    stream = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok")
    )
    sketch = countmin_build(stream, "tok", depth=d, width=w, salt=salt)
    exact = stream.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    top20 = exact.orderBy(F.desc("exact_n"), "tok").limit(20)
    est = countmin_estimate(
        sketch, top20.select("tok"), "tok", depth=d, width=w, salt=salt
    )
    return (
        top20.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_n",
            F.col("cm_est").cast("bigint").alias("cm_est"),
            (F.col("cm_est") - F.col("exact_n"))
            .cast("bigint")
            .alias("overestimate"),
            F.round(
                (F.col("cm_est") - F.col("exact_n")).cast("double")
                / F.col("exact_n"),
                6,
            ).alias("rel_err"),
        )
    )


# =====================================================================
# Two-hop neighborhoods (q253): distinct co-suppliers per supplier
# through shared parts, with a part-degree cap bounding pair volume
# at Σ min(deg, cap)² — the graph-feature-engineering staple.
# =====================================================================
@q(
    "q253_two_hop_neighbors",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
      FROM lineitem
    ),
    deg AS (
      SELECT part, count(*) AS d FROM edges GROUP BY part
    ),
    kept AS (
      SELECT e.part, e.supp FROM edges e JOIN deg ON e.part = deg.part
      WHERE deg.d <= 40
    ),
    pairs AS (
      SELECT DISTINCT a.supp AS s, b.supp AS co
      FROM kept a JOIN kept b ON a.part = b.part AND a.supp <> b.supp
    ),
    parts_per AS (
      SELECT supp AS s, CAST(count(*) AS BIGINT) AS n_parts FROM kept
      GROUP BY supp
    )
    SELECT p.s AS supp, p.n_parts,
           CAST(count(pr.co) AS BIGINT) AS n_co_suppliers
    FROM parts_per p LEFT JOIN pairs pr ON p.s = pr.s
    GROUP BY p.s, p.n_parts
    """,
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 rework (guide §2.4 remove shuffles / §2.3 aggregate
    # early): the r10 shape joined a degree table back onto the edge
    # list and then SELF-JOINED the capped edges on part — 12
    # exchanges, with the edge set shuffled three more times after
    # the distinct. Everything after the distinct is per-part work,
    # so it now rides ONE part partitioning: a window count computes
    # the degree (no join, no per-group array before the cap — a
    # billion-supplier hub part streams through the sort-based window
    # and is dropped by the filter, never collected), the capped
    # suppliers collapse to a ≤40-element set per part, and the
    # co-supplier pairs are exploded IN the partition. Catalyst's
    # ReuseExchange shares the scans of the capped frame (parts_per
    # and the pair branch read the same exchanges).
    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    w = Window.partitionBy("part")
    # part-degree cap: a hub part supplied by everyone contributes
    # deg² pairs and ~0 signal — dropped identically in the oracle
    kept = (
        edges.repartition("part")
        .withColumn("__d", F.count(F.lit(1)).over(w))
        .filter(F.col("__d") <= 40)
        .select("part", "supp")
    )
    # pairs are exploded CANONICAL (u < v via the sorted set + sliced
    # inner transform) — half the pair volume of the directed form —
    # and deduped once; each distinct unordered pair then contributes
    # 1 to each endpoint's partner count (measured across tails at
    # sf0.1: canonical+distinct+endpoint-sum 3.4 s median vs directed
    # countDistinct 5.0 s vs directed distinct+count 4.8 s, identical
    # output all three)
    grouped = kept.groupBy("part").agg(
        F.sort_array(F.collect_set("supp")).alias("__ss")
    )
    dp = (
        grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "__ss",
                        lambda x, i: F.transform(
                            F.slice(
                                "__ss",
                                i + F.lit(2),
                                F.size(F.col("__ss")) - i - F.lit(1),
                            ),
                            lambda y: F.struct(
                                x.alias("u"), y.alias("v")
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .select("__p.u", "__p.v")
        .distinct()
    )
    cu = dp.groupBy(F.col("u").alias("s")).agg(
        F.count(F.lit(1)).alias("__c1")
    )
    cv = dp.groupBy(F.col("v").alias("s")).agg(
        F.count(F.lit(1)).alias("__c2")
    )
    cocnt = cu.join(cv, "s", "full").select(
        "s",
        (
            F.coalesce("__c1", F.lit(0)) + F.coalesce("__c2", F.lit(0))
        ).cast("bigint").alias("__nco"),
    )
    parts_per = kept.groupBy(F.col("supp").alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    return (
        parts_per.join(cocnt, "s", "left")
        .select(
            F.col("s").alias("supp"),
            "n_parts",
            F.coalesce(F.col("__nco"), F.lit(0).cast("bigint")).alias(
                "n_co_suppliers"
            ),
        )
    )


# =====================================================================
# HLL overlap matrix (q254): pairwise audience overlap across the 5
# event types from ONE register pass — sketch-algebra reuse: unions /
# intersections / Jaccard computed from the register table, never
# rescanning the corpus (operators/hll.hll_overlap_matrix).
# =====================================================================
from dbt_incremental_ci_spark.operators.hll import (  # noqa: E402
    hll_overlap_matrix,
    hll_overlap_matrix_sql,
)


@q(
    "q254_hll_overlap_matrix",
    hll_overlap_matrix_sql(
        "events", "user_id", "event_type", m=64, salt="ovl"
    ),
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return hll_overlap_matrix(ev, "user_id", "event_type", m=64, salt="ovl")


# =====================================================================
# DAU / WAU stickiness (q255): exact trailing-7-day distinct users
# per day via the offset-spine equi-join rewrite — no distinct-over-
# window (operators/timeseries.dau_wau_stickiness).
# =====================================================================
from dbt_incremental_ci_spark.operators.timeseries import (  # noqa: E402
    dau_wau_stickiness,
    dau_wau_stickiness_sql,
)

_DAU_ROWS = (
    "(SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events)"
)


@q(
    "q255_dau_wau",
    dau_wau_stickiness_sql(_DAU_ROWS, "user_id", "day", window_days=7),
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts bigint ns
    rows = ev.select(
        "user_id",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    )
    return dau_wau_stickiness(rows, "user_id", "day", window_days=7)


# =====================================================================
# Sorted-neighborhood blocking (q256): rank-banded candidate pairs
# over customer names joined with a cheap agreement feature — the
# SIGMOD'95 ER blocking alternative to key blocking; candidate volume
# exactly n·w (operators/linkage.sorted_neighborhood_pairs).
# =====================================================================
from dbt_incremental_ci_spark.operators.linkage import (  # noqa: E402
    sorted_neighborhood_pairs,
    sorted_neighborhood_pairs_sql,
)


def _q256_oracle() -> str:
    pairs = sorted_neighborhood_pairs_sql(
        "supplier", "s_name", "s_suppkey", window=3
    )
    return f"""
    WITH cand AS ({pairs})
    SELECT c.id_a, c.id_b, c.rank_gap,
           a.s_nationkey = b.s_nationkey AS same_nation
    FROM cand c
    JOIN supplier a ON a.s_suppkey = c.id_a
    JOIN supplier b ON b.s_suppkey = c.id_b
    """


@q("q256_sorted_neighborhood", _q256_oracle())
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = t(spark, sf_dir, "supplier")
    cand = sorted_neighborhood_pairs(sup, "s_name", "s_suppkey", window=3)
    a = sup.select(
        F.col("s_suppkey").alias("id_a"), F.col("s_nationkey").alias("__na")
    )
    b = sup.select(
        F.col("s_suppkey").alias("id_b"), F.col("s_nationkey").alias("__nb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "rank_gap",
            (F.col("__na") == F.col("__nb")).alias("same_nation"),
        )
    )


# =====================================================================
# Degree assortativity (q257): hub-to-hub vs hub-to-spoke structure
# of the co-supplier graph — exact integer correlation sums
# (operators/triangles.degree_assortativity).
# =====================================================================
from dbt_incremental_ci_spark.operators.triangles import (  # noqa: E402
    degree_assortativity,
    degree_assortativity_sql,
)

_COSUPP_EDGES = """(
  WITH e AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
             FROM lineitem),
  deg AS (SELECT part, count(*) AS d FROM e GROUP BY part),
  kept AS (SELECT e.part, e.supp FROM e JOIN deg ON e.part = deg.part
           WHERE deg.d <= 40)
  SELECT DISTINCT a.supp AS id_a, b.supp AS id_b
  FROM kept a JOIN kept b ON a.part = b.part AND a.supp <> b.supp
)"""


@q(
    "q257_degree_assortativity",
    degree_assortativity_sql(_COSUPP_EDGES, "id_a", "id_b"),
)
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-11 rework, same shape as q253 (see the comment there):
    # window degree + per-part pair explosion replace the degree join
    # and the part self-join. Pairs are emitted already canonical
    # (u < v via the sorted set and a sliced inner transform) and NOT
    # pre-distinct'ed — degree_assortativity's canonical_edges runs
    # the one distinct this plan needs, where the r10 shape paid a
    # directed distinct AND the canonical distinct (two full pair
    # shuffles; min()/distinct are duplicate-insensitive, so the
    # result is unchanged).
    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    w = Window.partitionBy("part")
    kept = (
        edges.repartition("part")
        .withColumn("__d", F.count(F.lit(1)).over(w))
        .filter(F.col("__d") <= 40)
        .select("part", "supp")
    )
    grouped = kept.groupBy("part").agg(
        F.sort_array(F.collect_set("supp")).alias("__ss")
    )
    pairs = (
        grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "__ss",
                        lambda x, i: F.transform(
                            F.slice(
                                "__ss",
                                i + F.lit(2),
                                F.size(F.col("__ss")) - i - F.lit(1),
                            ),
                            lambda y: F.struct(
                                x.alias("id_a"), y.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .select("__p.id_a", "__p.id_b")
    )
    return degree_assortativity(pairs, "id_a", "id_b")


# =====================================================================
# Fano-factor burstiness (q258): per-event-type index of dispersion
# over hourly buckets INCLUDING empty hours — the Poisson-baseline
# bot/burst detector (operators/timeseries.fano_burstiness).
# =====================================================================
from dbt_incremental_ci_spark.operators.timeseries import (  # noqa: E402
    fano_burstiness,
    fano_burstiness_sql,
)

_FANO_ROWS = "(SELECT event_type, epoch_ns(ts) AS tsn FROM events)"


@q(
    "q258_fano_burstiness",
    fano_burstiness_sql(_FANO_ROWS, "event_type", "tsn"),
)
def q258(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts bigint ns
    return fano_burstiness(ev, "event_type", "ts")


# =====================================================================
# Ranker agreement (q259): overlap@10 / Jaccard@10 / RBO@10 between
# two BM25 parameterizations over the q117 query set — the "did the
# retrain change what users see" regression diagnostic
# (operators/retrieval.rank_agreement).
# =====================================================================
from dbt_incremental_ci_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    rank_agreement,
    rank_agreement_sql,
)
from dbt_incremental_ci_spark.workload_q3 import (  # noqa: E402
    _BM25_QUERIES,
)


def _bm25_list_sql(k1: float, b: float, k: int) -> str:
    vals = ", ".join(f"('{qid}', '{qt}')" for qid, qt in _BM25_QUERIES)
    return rf"""
    WITH q(query_id, qtext) AS (VALUES {vals}),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    post AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    dftbl AS (SELECT token, count(DISTINCT doc_id) AS df_t
              FROM post GROUP BY 1),
    qt AS (
      SELECT DISTINCT query_id,
             unnest(list_filter(string_split_regex(lower(qtext), '\s+'),
                                x -> x <> '')) AS token
      FROM q
    ),
    scored AS (
      SELECT query_id, doc_id,
             ROUND(CAST(SUM(CAST(
               ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * (tf * {k1 + 1.0!r})
               / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))
             AS DECIMAL(18,10))) AS DOUBLE), 6) AS score
      FROM qt
      JOIN post USING (token)
      JOIN dl USING (doc_id)
      JOIN dftbl USING (token)
      CROSS JOIN stats
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rnk FROM (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


@q(
    "q259_rank_agreement",
    rank_agreement_sql(
        _bm25_list_sql(1.2, 0.75, 10),
        _bm25_list_sql(2.0, 0.0, 10),
        k=10,
    ),
)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "qtext"])
    la = bm25_topk(docs, queries, k=10, k1=1.2, b=0.75)
    lb = bm25_topk(docs, queries, k=10, k1=2.0, b=0.0)
    return rank_agreement(la, lb, k=10)


# =====================================================================
# Operating-point selection (q260): max-F1 and min-expected-cost
# thresholds off the q151 classifier PR curve — the deploy decision
# (evalmetrics.best_threshold on the bins frame).
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    best_threshold,
    best_threshold_sql,
    binned_pr_curve,
)
from dbt_incremental_ci_spark.workload_q4 import _q151_oracle  # noqa: E402


@q(
    "q260_best_threshold",
    best_threshold_sql(_q151_oracle(), cost_fp=1.0, cost_fn=5.0),
)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier

    docs = t(spark, sf_dir, "documents").select("text", "lang")
    raw = F.round(
        classifier.linear_score(
            "text", classifier.default_weights(64, "qc"), 0.0, "qc"
        ),
        6,
    )
    scored = docs.select(
        F.round(classifier.sigmoid(raw), 6).alias("prob"),
        (F.col("lang") == "en").alias("y"),
    )
    pr = binned_pr_curve(scored, "prob", "y", bins=20)
    return best_threshold(pr, cost_fp=1.0, cost_fn=5.0)


# =====================================================================
# Exact-dup removal impact (q261): what keep-first-per-fingerprint
# dedup actually deletes — doc/token/char deltas in ONE report row
# (q26's md5 cluster machinery + token counting).
# =====================================================================
@q(
    "q261_dedup_impact",
    r"""
    WITH d AS (
      SELECT doc_id, md5(text) AS fp,
             len(list_filter(string_split_regex(trim(lower(text)),
                                                '\s+'),
                             x -> x <> '')) AS n_tok,
             length(text) AS n_chr
      FROM documents
    ),
    keep AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp),
    tagged AS (
      SELECT d.*, d.doc_id = k.keep_id AS kept
      FROM d JOIN keep k ON d.fp = k.fp
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
             AS n_removed,
           ROUND(CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS DOUBLE)
                 / count(*), 6) AS pct_removed,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
           CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_after,
           CAST(SUM(n_chr) AS BIGINT) AS chars_before,
           CAST(SUM(CASE WHEN kept THEN n_chr ELSE 0 END) AS BIGINT)
             AS chars_after
    FROM tagged
    """,
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    d = docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.size(toks).alias("n_tok"),
        F.length("text").alias("n_chr"),
    )
    keep = d.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    tagged = d.join(keep, "fp").withColumn(
        "kept", F.col("doc_id") == F.col("keep_id")
    )
    kept_i = F.col("kept").cast("int")
    return tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(kept_i).cast("bigint").alias("n_unique"),
        F.sum(1 - kept_i).cast("bigint").alias("n_removed"),
        F.round(
            F.sum(1 - kept_i).cast("double") / F.count(F.lit(1)), 6
        ).alias("pct_removed"),
        F.sum("n_tok").cast("bigint").alias("tokens_before"),
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_after"),
        F.sum("n_chr").cast("bigint").alias("chars_before"),
        F.sum(F.when(F.col("kept"), F.col("n_chr")).otherwise(0))
        .cast("bigint")
        .alias("chars_after"),
    )
