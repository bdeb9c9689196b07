"""q204+: round-5 second batch — ranking-quality eval (NDCG@k,
MAP@k, gains/lift), off-policy IPS evaluation, concentration /
inequality profiling (Gini, HHI, entropy), Jensen-Shannon drift,
mutual-information dependence profiling, trimmed/winsorized robust
stats, and zone-map pruning-effectiveness reporting.

Split-module registration contract: see ``workload`` (the hub) and
``workload_base`` (registries + determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import q, t

# =====================================================================
# NDCG@k (q204): grade a ranker per group against graded relevance —
# events ranked by value within event_type, relevance = a 0-3 grade
# derived deterministically from event_id (stands in for editorial
# labels). Two same-key windows, decimal-exact DCG folds.
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    average_precision_at_k,
    average_precision_at_k_sql,
    decile_lift,
    decile_lift_sql,
    ips_offline_eval,
    ips_offline_eval_sql,
    ndcg_at_k,
    ndcg_at_k_sql,
)

_RANK_ROWS = (
    "(SELECT event_type, event_id, value, event_id % 4 AS rel "
    "FROM events)"
)


@q(
    "q204_ndcg",
    ndcg_at_k_sql(_RANK_ROWS, "event_type", "value", "rel", "event_id", k=10),
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        (F.col("event_id") % 4).alias("rel"),
    )
    return ndcg_at_k(ev, "event_type", "value", "rel", "event_id", k=10)


# =====================================================================
# MAP@k (q205): binary-relevance average precision per ranking group
# (rel = 1 for every fifth event id — a 20% positive rate).
# =====================================================================
_AP_ROWS = (
    "(SELECT event_type, event_id, value, "
    "CAST(event_id % 5 = 0 AS INT) AS rel FROM events)"
)


@q(
    "q205_map_at_k",
    average_precision_at_k_sql(
        _AP_ROWS, "event_type", "value", "rel", "event_id", k=20
    ),
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        (F.col("event_id") % 5 == 0).cast("int").alias("rel"),
    )
    return average_precision_at_k(
        ev, "event_type", "value", "rel", "event_id", k=20
    )


# =====================================================================
# Concentration profile (q206): how customer spend concentrates
# within each market segment — Gini, HHI, entropy/evenness per
# segment (the domain-mix monitor shape: swap segment->source and
# spend->tokens for the pretraining-mix gate).
# =====================================================================
from dbt_incremental_ci_spark.operators.concentration import (  # noqa: E402
    group_concentration,
    group_concentration_sql,
)

_CONC_ROWS = (
    "(SELECT c_mktsegment, o_custkey, o_totalprice "
    "FROM orders JOIN customer ON o_custkey = c_custkey)"
)


@q(
    "q206_concentration",
    group_concentration_sql(
        _CONC_ROWS, "c_mktsegment", "o_custkey", "o_totalprice"
    ),
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rows = orders.join(
        F.broadcast(cust),
        orders.o_custkey == cust.c_custkey,
    ).select("c_mktsegment", "o_custkey", "o_totalprice")
    return group_concentration(
        rows, "c_mktsegment", "o_custkey", "o_totalprice"
    )


# =====================================================================
# Jensen-Shannon drift (q207): the bounded symmetric drift scalar
# between two periods' return-flag mixes — the alarm number next to
# q201's per-category PSI/chi2 report.
# =====================================================================
from dbt_incremental_ci_spark.operators.drift import (  # noqa: E402
    js_divergence,
    js_divergence_sql,
)


@q(
    "q207_js_divergence",
    js_divergence_sql(
        "(SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1996)",
        "(SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1997)",
        "l_returnflag",
    ),
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ref = li.filter(F.year("l_shipdate") == 1996)
    cur = li.filter(F.year("l_shipdate") == 1997)
    return js_divergence(ref, cur, "l_returnflag")


# =====================================================================
# Mutual information (q208): is `source` informative about `lang` on
# the documents table — MI/NMI + marginal entropies from one
# contingency aggregate (the dependence complement to q139's
# chi-square test).
# =====================================================================
from dbt_incremental_ci_spark.operators.profiling import (  # noqa: E402
    mutual_information,
    mutual_information_sql,
)


@q(
    "q208_mutual_information",
    mutual_information_sql("(SELECT source, lang FROM documents)", "source", "lang"),
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("source", "lang")
    return mutual_information(docs, "source", "lang")


# =====================================================================
# Gains / decile lift (q209): account balance as the score, "placed
# more than 5 orders" as the label — the threshold-picking report for
# any quality-classifier score.
# =====================================================================
_LIFT_ROWS = """(
  SELECT c_custkey, c_acctbal,
         CAST(COALESCE(o.cnt, 0) > 5 AS INT) AS label
  FROM customer
  LEFT JOIN (SELECT o_custkey, count(*) AS cnt
             FROM orders GROUP BY o_custkey) o
    ON c_custkey = o.o_custkey
)"""


@q(
    "q209_decile_lift",
    decile_lift_sql(_LIFT_ROWS, "c_acctbal", "label", "c_custkey", n_tiles=10),
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cnt = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = (
        cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            (F.coalesce(F.col("cnt"), F.lit(0)) > 5)
            .cast("int")
            .alias("label"),
        )
    )
    return decile_lift(rows, "c_acctbal", "label", "c_custkey", n_tiles=10)


# =====================================================================
# Trimmed / winsorized means (q210): per-nation robust order-value
# location estimates — rank-trimmed at 10% each side, decimal-exact.
# =====================================================================
from dbt_incremental_ci_spark.operators.robust import (  # noqa: E402
    trimmed_stats,
    trimmed_stats_sql,
)

_TRIM_ROWS = (
    "(SELECT c_nationkey, o_orderkey, o_totalprice "
    "FROM orders JOIN customer ON o_custkey = c_custkey)"
)


@q(
    "q210_trimmed_stats",
    trimmed_stats_sql(
        _TRIM_ROWS, "c_nationkey", "o_totalprice", "o_orderkey", trim=0.1
    ),
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rows = orders.join(
        F.broadcast(cust),
        orders.o_custkey == cust.c_custkey,
    ).select("c_nationkey", "o_orderkey", "o_totalprice")
    return trimmed_stats(
        rows, "c_nationkey", "o_totalprice", "o_orderkey", trim=0.1
    )


# =====================================================================
# Zone-map pruning report (q211): month-of-shipdate zones over the
# epoch-day of the same date — per-predicate zones skipped, rows
# scanned vs matching (the "is Z-ordering worth it" measurement,
# pairing with q162/q92's Z-order keys).
# =====================================================================
from dbt_incremental_ci_spark.sinks.layout import (  # noqa: E402
    pruning_report,
    pruning_report_sql,
)

_ZONE_PREDS = [
    ("year_1996", 9496.0, 9861.0),
    ("q3_1998", 10408.0, 10499.0),
    ("week_2000_03", 11017.0, 11023.0),
]
_ZONE_ROWS = (
    "(SELECT strftime(l_shipdate, '%Y-%m') AS zone_month, "
    "date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) "
    "AS ship_day FROM lineitem)"
)


@q(
    "q211_zone_pruning",
    pruning_report_sql(_ZONE_ROWS, "zone_month", "ship_day", _ZONE_PREDS),
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("zone_month"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01")
        ).alias("ship_day"),
    )
    return pruning_report(li, "zone_month", "ship_day", _ZONE_PREDS)


# =====================================================================
# IPS off-policy evaluation (q212): logs = events (context = user
# cohort, action = event_type, reward = value); target policy =
# "purchase for low cohorts, click otherwise". Propensities estimated
# from the logs; IPS / SNIPS / effective sample size in one pass.
# =====================================================================
_IPS_ROWS = """(
  SELECT user_id % 10 AS cohort, event_type, value,
         CASE WHEN user_id % 10 < 5 THEN 'purchase'
              ELSE 'click' END AS target_action
  FROM events
)"""


@q(
    "q212_ips_eval",
    ips_offline_eval_sql(
        _IPS_ROWS, "cohort", "event_type", "value", "target_action"
    ),
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("cohort"),
        "event_type",
        "value",
        F.when(F.col("user_id") % 10 < 5, F.lit("purchase"))
        .otherwise(F.lit("click"))
        .alias("target_action"),
    )
    return ips_offline_eval(
        ev, "cohort", "event_type", "value", "target_action"
    )


# =====================================================================
# A/B power analysis (q213): per-cohort baseline conversion -> minimum
# detectable effect at current n + required n per arm for a 10%
# relative lift. Completes the experimentation family (q168 z-test,
# q177 SRM): size the test before running it.
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    power_analysis,
    power_analysis_sql,
)

_POWER_ROWS = (
    "(SELECT user_id % 5 AS cohort, "
    "CAST(event_type = 'purchase' AS INT) AS converted FROM events)"
)


@q(
    "q213_power_analysis",
    power_analysis_sql(_POWER_ROWS, "cohort", "converted", rel_lift=0.10),
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("cohort"),
        (F.col("event_type") == "purchase").cast("int").alias("converted"),
    )
    return power_analysis(ev, "cohort", "converted", rel_lift=0.10)


# =====================================================================
# Weighted quantiles (q214): quantity-weighted median and p90 of the
# extended price per return flag — exact integer-centi-unit cumulative
# weights, engine-identical row selection.
# =====================================================================
from dbt_incremental_ci_spark.operators.robust import (  # noqa: E402
    trimmed_stats as _ts,  # noqa: F401  (q210 imports above)
    weighted_quantiles,
    weighted_quantiles_sql,
)

_WQ_ROWS = (
    "(SELECT l_returnflag, l_extendedprice, l_quantity, "
    "l_orderkey * 8 + l_linenumber AS lid FROM lineitem)"
)


@q(
    "q214_weighted_quantiles",
    weighted_quantiles_sql(
        _WQ_ROWS, "l_returnflag", "l_extendedprice", "l_quantity",
        "lid", [0.5, 0.9],
    ),
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lid"),
    )
    return weighted_quantiles(
        li, "l_returnflag", "l_extendedprice", "l_quantity", "lid",
        [0.5, 0.9],
    )


# =====================================================================
# Rare-category collapse (q215): fold the long tail of leading tokens
# into __other__ at min_support=5 — the cardinality-stabilizing step
# before categorical encoding.
# =====================================================================
from dbt_incremental_ci_spark.operators.featurehygiene import (  # noqa: E402
    feature_hash_stats,
    feature_hash_stats_sql,
    rare_category_collapse,
    rare_category_collapse_sql,
)

_FIRST_TOKEN_SQL = (
    "(SELECT list_filter(string_split_regex(trim(text), '\\s+'), "
    "x -> x <> '')[1] AS tok0 FROM documents)"
)


@q(
    "q215_rare_collapse",
    rare_category_collapse_sql(_FIRST_TOKEN_SQL, "tok0", 5),
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
        )[0].alias("tok0")
    )
    return rare_category_collapse(docs, "tok0", 5)


# =====================================================================
# N-gram novelty (q216): share of the current crawl epoch's distinct
# trigrams unseen in the previous epoch — the freshness monitor for
# incremental ingestion.
# =====================================================================
from dbt_incremental_ci_spark.operators.decontam import (  # noqa: E402
    ngram_novelty,
    ngram_novelty_sql,
)


@q(
    "q216_ngram_novelty",
    ngram_novelty_sql(
        "(SELECT text FROM documents WHERE doc_id < 250)",
        "(SELECT text FROM documents WHERE doc_id >= 250)",
        "text",
        n=3,
    ),
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    prev = docs.filter(F.col("doc_id") < 250)
    cur = docs.filter(F.col("doc_id") >= 250)
    return ngram_novelty(prev, cur, "text", n=3)


# =====================================================================
# Feature-hash diagnostics (q217): hashing-trick collision load of
# the document token vocabulary at 256 buckets — sizes the hash
# dimension by measurement.
# =====================================================================
_TOKENS_SQL = (
    "(SELECT unnest(list_filter("
    "string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tok "
    "FROM documents)"
)


@q(
    "q217_feature_hash_stats",
    feature_hash_stats_sql(_TOKENS_SQL, "tok", 256),
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok")
    )
    return feature_hash_stats(docs, "tok", 256)


# =====================================================================
# Sliced eval with Wilson intervals (q218): per-event-type accuracy of
# a threshold predictor against the high-value label, with
# small-slice-honest confidence bounds.
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    slice_metrics_wilson,
    slice_metrics_wilson_sql,
)

_SLICE_ROWS = (
    "(SELECT event_type, CAST(value > 50 AS INT) AS label, "
    "CAST(value > 45 AS INT) AS pred FROM events)"
)


@q(
    "q218_slice_wilson",
    slice_metrics_wilson_sql(_SLICE_ROWS, "event_type", "label", "pred"),
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value") > 50).cast("int").alias("label"),
        (F.col("value") > 45).cast("int").alias("pred"),
    )
    return slice_metrics_wilson(ev, "event_type", "label", "pred")


# =====================================================================
# Poisson bootstrap CI (q219): per-priority mean order value with a
# 95% percentile-bootstrap interval — the one-pass distributed
# bootstrap (per-row Poisson(1) weights, B=40 resamples).
# =====================================================================
from dbt_incremental_ci_spark.operators.sampling import (  # noqa: E402
    poisson_bootstrap_ci,
    poisson_bootstrap_ci_sql,
)


@q(
    "q219_bootstrap_ci",
    poisson_bootstrap_ci_sql(
        "(SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders)",
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        n_resamples=40,
    ),
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    return poisson_bootstrap_ci(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey",
        n_resamples=40,
    )


# =====================================================================
# Mergeable MinHash registers (q220): per-event-type audience sketch
# built per shard, shard-merged, and proven register-identical to the
# direct sketch — the q174 HLL-merge contract for set-similarity
# signatures.
# =====================================================================
from dbt_incremental_ci_spark.operators.mhsketch import (  # noqa: E402
    minhash_merge_proof,
    minhash_merge_proof_sql,
)

_MH_ROWS = (
    "(SELECT event_type, user_id, event_id % 3 AS shard FROM events)"
)


@q(
    "q220_minhash_merge",
    minhash_merge_proof_sql(
        _MH_ROWS, "event_type", "user_id", "shard", m=32
    ),
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.col("event_id") % 3).alias("shard"),
    )
    return minhash_merge_proof(ev, "event_type", "user_id", "shard", m=32)


# =====================================================================
# LSH banding QA (q221): recall/precision of the (m=32, bands=8)
# MinHash banding config against exact token-set Jaccard ground truth
# on the fixed documents audit slice — measure the dedup config
# before trusting a corpus sweep.
# =====================================================================
from dbt_incremental_ci_spark.operators.mhsketch import (  # noqa: E402
    lsh_banding_eval,
    lsh_banding_eval_sql,
)


@q(
    "q221_lsh_banding_eval",
    lsh_banding_eval_sql(
        # fixed audit slice (doc_id cap): QA samples don't grow with
        # the corpus — the truth side is all-pairs over this slice
        "(SELECT doc_id, text FROM documents WHERE doc_id < 1000)",
        "doc_id",
        "text",
        m=32,
        bands=8,
        threshold=0.5,
    ),
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 1000)
        .select("doc_id", "text")
    )
    return lsh_banding_eval(
        docs, "doc_id", "text", m=32, bands=8, threshold=0.5
    )


# =====================================================================
# HITS hub/authority (q222): buyers as hubs, suppliers as authorities
# over the order transaction graph — 3 max-normalized power
# iterations, round-9-then-iterate so both engines walk identical
# numbers (the DuckDB twin unrolls the iterations as CTEs).
# =====================================================================
from dbt_incremental_ci_spark.operators.hits import (  # noqa: E402
    hits_scores,
    hits_scores_sql,
)

_HITS_EDGES = (
    "(SELECT o_custkey, l_suppkey FROM orders "
    "JOIN lineitem ON o_orderkey = l_orderkey)"
)


@q(
    "q222_hits",
    hits_scores_sql(_HITS_EDGES, "o_custkey", "l_suppkey", iterations=3),
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select("o_custkey", "l_suppkey")
    return hits_scores(edges, "o_custkey", "l_suppkey", iterations=3)


# =====================================================================
# Dataset card (q223): the one-row release datasheet for the corpus —
# volume, length stats, language/source cardinality + top shares,
# exact-duplicate rate.
# =====================================================================
from dbt_incremental_ci_spark.operators.datasetcard import (  # noqa: E402
    dataset_card,
    dataset_card_sql,
)


@q(
    "q223_dataset_card",
    dataset_card_sql("documents"),
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_card(t(spark, sf_dir, "documents"))


# =====================================================================
# Krippendorff's alpha (q224): inter-annotator agreement over a
# 3-rater synthetic labeling of events (unit = event, rating = one of
# 3 derived labelers) — the missing-tolerant, N-rater upgrade over
# Cohen's kappa (q152).
# =====================================================================
from dbt_incremental_ci_spark.operators.evalmetrics import (  # noqa: E402
    krippendorff_alpha_nominal,
    krippendorff_alpha_nominal_sql,
)

# three deterministic "raters" with partial agreement; rater 3 skips
# two thirds of units (missing ratings — the case kappa can't handle)
_KRIPP_ROWS = """(
  SELECT event_id AS unit, CAST(value > 50 AS INT) AS rating
  FROM events
  UNION ALL
  SELECT event_id AS unit, CAST(value > 45 AS INT) AS rating
  FROM events
  UNION ALL
  SELECT event_id AS unit, CAST(value > 55 AS INT) AS rating
  FROM events WHERE event_id % 3 = 0
)"""


@q(
    "q224_krippendorff_alpha",
    krippendorff_alpha_nominal_sql(_KRIPP_ROWS, "unit", "rating"),
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "value")
    r1 = ev.select(
        F.col("event_id").alias("unit"),
        (F.col("value") > 50).cast("int").alias("rating"),
    )
    r2 = ev.select(
        F.col("event_id").alias("unit"),
        (F.col("value") > 45).cast("int").alias("rating"),
    )
    r3 = ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("unit"),
        (F.col("value") > 55).cast("int").alias("rating"),
    )
    rows = r1.unionByName(r2).unionByName(r3)
    return krippendorff_alpha_nominal(rows, "unit", "rating")


# =====================================================================
# Quantile normalization (q225): map each source's doc-length
# distribution onto the global one by exact integer rank mapping —
# per-source batch-effect correction.
# =====================================================================
from dbt_incremental_ci_spark.operators.robust import (  # noqa: E402
    quantile_normalize,
    quantile_normalize_sql,
)


@q(
    "q225_quantile_normalize",
    quantile_normalize_sql(
        "(SELECT doc_id, source, n_chars FROM documents)",
        "source",
        "n_chars",
        "doc_id",
    ),
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return quantile_normalize(docs, "source", "n_chars", "doc_id")


# =====================================================================
# Split-leakage audit (q226): a row-level fold assignment over events
# with unit = user — per-fold balance plus the group-leakage count a
# group-aware split would have avoided.
# =====================================================================
from dbt_incremental_ci_spark.operators.featurehygiene import (  # noqa: E402
    split_leakage_audit,
    split_leakage_audit_sql,
)

_SPLIT_ROWS = """(
  SELECT user_id, event_id % 5 AS fold,
         CAST(event_type = 'purchase' AS INT) AS label
  FROM events
)"""


@q(
    "q226_split_leakage",
    split_leakage_audit_sql(_SPLIT_ROWS, "user_id", "fold", "label"),
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_id") % 5).alias("fold"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return split_leakage_audit(ev, "user_id", "fold", "label")


# =====================================================================
# Dedup cluster-size profile (q227): the monitoring chart behind any
# dedup sweep — component-size histogram + duplication rate over the
# q52 near-dup components (size 1 = unique docs; heavy tails = boiler-
# plate families). Composes minhash pairs -> connected components ->
# two cardinality-sized aggregates.
# =====================================================================
_Q227_ORACLE = r"""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id,
             CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    ),
    prs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) >= 0.7
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM prs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM prs
    ),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    assigned AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    sizes AS (
      SELECT component, count(*) AS csize FROM assigned GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT component) AS BIGINT) AS n_clusters
      FROM assigned
    )
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters_of_size,
           CAST(csize * count(*) AS BIGINT) AS n_docs_covered,
           ROUND(CAST(csize * count(*) AS DOUBLE) / max(tot.n_docs), 6)
             AS pct_docs,
           ROUND(1 - CAST(max(tot.n_clusters) AS DOUBLE)
                 / max(tot.n_docs), 6) AS corpus_dup_rate
    FROM sizes CROSS JOIN tot
    GROUP BY csize
"""


@q("q227_cluster_size_profile", _Q227_ORACLE)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import components as cc
    from dbt_incremental_ci_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7)
    assigned = cc.dedup_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )
    sizes = assigned.groupBy("component").agg(
        F.count(F.lit(1)).alias("csize")
    )
    tot = sizes.agg(
        F.sum("csize").cast("bigint").alias("__n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("__n_clusters"),
    )
    prof = (
        sizes.groupBy("csize")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters_of_size"))
        .crossJoin(F.broadcast(tot))
    )
    return prof.select(
        F.col("csize").cast("bigint").alias("cluster_size"),
        "n_clusters_of_size",
        (F.col("csize") * F.col("n_clusters_of_size"))
        .cast("bigint")
        .alias("n_docs_covered"),
        F.round(
            (F.col("csize") * F.col("n_clusters_of_size"))
            / F.col("__n_docs"),
            6,
        ).alias("pct_docs"),
        F.round(
            1 - F.col("__n_clusters") / F.col("__n_docs"), 6
        ).alias("corpus_dup_rate"),
    )
