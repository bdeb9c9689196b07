"""q185+: round-5 additions — sketch set operations and
reaggregatable sketch columns (HLL), Benford first-digit audit,
WOE/IV feature binning, split-conformal calibration thresholds.

Split-module registration contract: see ``workload`` (the hub) and
``workload_base`` (registries + determinism rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    _LAZY_ORACLES,
    ORACLES,
    QUERIES,
    d,
    dec,
    events_table,
    get_oracles,
    q,
    t,
)


# =====================================================================
# HLL set operations (q185): sketch-only |A|, |B|, |A∪B|, |A∩B| and
# Jaccard between two keyed row sets — union is register-exact,
# intersection by inclusion-exclusion. The "how much do these two
# 10 TB corpora overlap" monitor at O(m) post-map cost.
# =====================================================================
from dbt_incremental_ci_spark.operators.hll import (  # noqa: E402
    hll_set_ops,
    hll_set_ops_sql,
)


@q(
    "q185_hll_setops",
    hll_set_ops_sql(
        "FROM orders WHERE year(o_orderdate) = 1996",
        "FROM orders WHERE year(o_orderdate) = 1997",
        "o_custkey",
        m=128,
        salt="setops",
    ),
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1996)
    b = orders.filter(F.year("o_orderdate") == 1997)
    return hll_set_ops(a, b, "o_custkey", m=128, salt="setops")


# =====================================================================
# Benford first-digit audit (q186): leading-digit distribution of
# l_extendedprice vs Benford's law with per-digit chi-square terms —
# the forensic/data-quality screen for fabricated or truncated
# measure columns.
# =====================================================================
from dbt_incremental_ci_spark.operators.benford import (  # noqa: E402
    benford_first_digit,
    benford_first_digit_sql,
)


@q(
    "q186_benford_audit",
    benford_first_digit_sql("lineitem", "l_extendedprice"),
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_first_digit(t(spark, sf_dir, "lineitem"), "l_extendedprice")


# =====================================================================
# WOE / information value (q187): account-balance bins of customers
# scored against the "frequent buyer" label (>5 orders) — the
# feature-ranking pass a training pipeline runs before fitting.
# Counts are one key-join + two hash aggregates; WOE/IV are pure
# column math over #bins rows.
# =====================================================================
from dbt_incremental_ci_spark.operators.woe import (  # noqa: E402
    woe_iv,
    woe_iv_sql,
)

_WOE_LABELED = """(
      SELECT CAST(floor(c.c_acctbal / 2000.0) AS INT) AS bin,
             COALESCE(o.cnt, 0) > 5 AS label
      FROM customer c
      LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      ) o ON c.c_custkey = o.o_custkey
    )"""
_WOE_ORACLE = woe_iv_sql(_WOE_LABELED, "bin", "label")


@q("q187_woe_iv", _WOE_ORACLE)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cnts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    labeled = cust.join(
        cnts, cust["c_custkey"] == cnts["o_custkey"], "left"
    ).select(
        F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bin"),
        (F.coalesce(F.col("cnt"), F.lit(0)) > 5).alias("label"),
    )
    return woe_iv(labeled, "bin", "label")


# =====================================================================
# Split-conformal thresholds (q188): per-returnflag (1−α) conformal
# quantile of discount scores over a FIXED calibration slice
# (l_orderkey < 1000 — calibration sets do not grow with the corpus;
# the q155/q175 fixed-bound rule). k = ceil((1−α)(n+1)) exact.
# =====================================================================
from dbt_incremental_ci_spark.operators.conformal import (  # noqa: E402
    conformal_thresholds,
    conformal_thresholds_sql,
)

_CONF_ORACLE = conformal_thresholds_sql(
    "(SELECT * FROM lineitem WHERE l_orderkey < 1000)",
    "l_returnflag",
    "l_discount",
    "l_orderkey * 8 + l_linenumber",
    alpha=0.1,
)


@q("q188_conformal_thresholds", _CONF_ORACLE)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    cal = cal.withColumn(
        "__id", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    return conformal_thresholds(
        cal, "l_returnflag", "l_discount", "__id", alpha=0.1
    )


# =====================================================================
# Reaggregatable sketch columns (q189): per-month HLL registers of
# active customers, rolled up to the year by register max — the
# distinct-count cube pattern (a true count_distinct is not
# reaggregatable; register maxima are, register-EXACTLY). Output:
# month rows + the year row, estimates from the same registers.
# =====================================================================
from dbt_incremental_ci_spark.operators.hll import (  # noqa: E402
    _alpha,
    _u32_sql,
    hll_estimate_by,
    hll_registers_by,
    hll_rollup,
)


def _q189_oracle(m: int = 64, salt: str = "cube") -> str:
    ub = _u32_sql("k", salt + ":b")
    ur = _u32_sql("k", salt + ":r")
    alpha = _alpha(m)
    est = (
        f"CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m})"
        f" / (sum(pow(2.0, -mr)) + ({m} - count(*)))"
        f" <= 2.5 * {m} AND count(*) < {m}"
        f" THEN {float(m)!r} * ln({float(m)!r} / ({m} - count(*)))"
        f" ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m})"
        f" / (sum(pow(2.0, -mr)) + ({m} - count(*))) END"
    )
    return f"""
    WITH hashed AS (
      SELECT CAST(month(o_orderdate) AS INT) AS mo,
             ({ub}) % {m} AS b,
             CASE WHEN ({ur}) = 0 THEN 33
                  ELSE 32 - CAST(floor(log2({ur})) AS INT) END AS r
      FROM (SELECT o_custkey AS k, o_orderdate
            FROM orders WHERE year(o_orderdate) = 1996)
    ),
    regs_mo AS (SELECT mo, b, max(r) AS mr FROM hashed GROUP BY mo, b),
    regs_yr AS (SELECT b, max(mr) AS mr FROM regs_mo GROUP BY b),
    months AS (
      SELECT 'month' AS level, mo AS key,
             CAST(count(*) AS BIGINT) AS n_active,
             ROUND({est}, 3) AS estimate
      FROM regs_mo GROUP BY mo
    ),
    yr AS (
      SELECT 'year' AS level, 0 AS key,
             CAST(count(*) AS BIGINT) AS n_active,
             ROUND({est}, 3) AS estimate
      FROM regs_yr
    )
    SELECT * FROM months UNION ALL SELECT * FROM yr
    """


@q("q189_hll_cube", _q189_oracle())
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    base = orders.select(
        F.month("o_orderdate").cast("int").alias("mo"), "o_custkey"
    )
    regs_mo = hll_registers_by(base, "o_custkey", ["mo"], m=64, salt="cube")
    # rollup is register-exact: identical to sketching the year directly
    regs_mo = regs_mo.localCheckpoint(eager=False)  # feeds both levels
    regs_yr = hll_rollup(regs_mo, [])
    months = hll_estimate_by(regs_mo, ["mo"], m=64).select(
        F.lit("month").alias("level"),
        F.col("mo").cast("int").alias("key"),
        "n_active",
        "estimate",
    )
    yr = hll_estimate_by(regs_yr, [], m=64).select(
        F.lit("year").alias("level"),
        F.lit(0).cast("int").alias("key"),
        "n_active",
        "estimate",
    )
    return months.unionByName(yr)


# =====================================================================
# ANN recall@k evaluation (q190): the index-quality monitor — recall
# of the LSH top-k (q34 pipeline) against the exact brute-force top-k
# (q29 baseline) for the fixed 10-query probe set. Both sides rank on
# (rounded cosine DESC, neighbor_id), so the comparison is
# deterministic; output is one row per probe query. At 100 TB the
# probe set stays FIXED-size (an eval set does not grow with the
# corpus — the q155 rule), so the brute-force side is bounded:
# |probes| linear scans, each a broadcast-join map pass.
# =====================================================================
from dbt_incremental_ci_spark.operators import similarity  # noqa: E402


def _q190_oracle() -> str:
    from dbt_incremental_ci_spark.operators.similarity import _hyperplane

    def arr(plane: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in plane) + "]"

    def bucket(col: str) -> str:
        terms = [
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr(_hyperplane(64, p, 42))})"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(6)
        ]
        return "(" + " + ".join(terms) + ")"

    cos = (
        "ROUND(list_dot_product(q.qv, c.cv)"
        " / NULLIF(sqrt(list_dot_product(q.qv, q.qv))"
        "          * sqrt(list_dot_product(c.cv, c.cv)), 0), 6)"
    )
    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                      {bucket('embedding')} AS bkt
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                 {bucket('embedding')} AS qbkt
          FROM embeddings WHERE vec_id < 10),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos} DESC, c.neighbor_id) AS rnk
        FROM q JOIN c ON c.neighbor_id <> q.query_id
      ) WHERE rnk <= 5
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos} DESC, c.neighbor_id) AS rnk
        FROM q JOIN c ON c.bkt = q.qbkt AND c.neighbor_id <> q.query_id
      ) WHERE rnk <= 5
    )
    SELECT b.query_id,
           CAST(5 AS INT) AS k,
           CAST(count(a.neighbor_id) AS BIGINT) AS hits,
           ROUND(count(a.neighbor_id) / 5.0, 6) AS recall_at_k
    FROM brute b
    LEFT JOIN approx a
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """


@q("q190_ann_recall", _q190_oracle())
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    brute = similarity.brute_force_topk(emb, probes, k=5).select(
        "query_id", F.col("neighbor_id").alias("__bn")
    )
    approx = similarity.lsh_topk(emb, probes, k=5, dim=64, n_planes=6).select(
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
# Functional-dependency audit (q191): schema-discovery profiling over
# candidate determinant→dependent pairs — each candidate one
# two-phase aggregate reduced to a single row (union across
# candidates, the expectations.py shape).
# =====================================================================
from dbt_incremental_ci_spark.operators.profiling import (  # noqa: E402
    fd_check,
    fd_check_sql,
)

_FD_CANDS = [
    ("o_orderkey", "o_custkey"),       # PK -> attribute: holds
    ("o_custkey", "o_orderpriority"),  # many orders per cust: fails
    ("o_custkey", "o_orderstatus"),    # fails
]


@q("q191_fd_discovery", fd_check_sql("orders", _FD_CANDS))
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fd_check(t(spark, sf_dir, "orders"), _FD_CANDS)


# =====================================================================
# Attribution model variants (q192 position-based, q193 time-decay):
# the other two production attribution models on q178's pair frame —
# same user-keyed join bound, same integer micro-unit exactness
# (position shares are percent integer divisions; decay weights are
# quantized to micro-weights BEFORE normalization so every sum is an
# associative bigint sum).
# =====================================================================
_ATTR_PAIRS_CTE = """
    WITH conv AS (
      SELECT user_id, epoch_ns(ts) AS cts, event_id,
             CAST(CAST(ROUND(value, 6) AS DECIMAL(18,6)) * 1000000
                  AS BIGINT) AS vm,
             CAST(user_id AS VARCHAR) || ':' || CAST(epoch_ns(ts) AS VARCHAR)
               || ':' || CAST(event_id AS VARCHAR) AS cid
      FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS tts, event_type AS ch
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    pairs AS (
      SELECT c.cid, c.vm, c.cts, t.tts, t.ch
      FROM conv c JOIN tch t ON t.user_id = c.user_id
      WHERE t.tts < c.cts AND t.tts >= c.cts - 21600000000000
    )
"""

_ATTR_ROLLUP = """
    SELECT ch AS channel,
           CAST(count(*) AS BIGINT) AS touches,
           CAST(count(DISTINCT cid) AS BIGINT) AS conversions,
           CAST(sum(share) AS BIGINT) AS attributed_micro,
           ROUND(sum(share) / 1000000.0, 6) AS attributed
    FROM shared
    GROUP BY ch
"""


def _events_conv_touch(spark: SparkSession, sf_dir: str):
    ev = events_table(spark, sf_dir)
    conv = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select("user_id", "ts", "event_id", "value")
    tch = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "ts", F.col("event_type").alias("channel"))
    return conv, tch


@q(
    "q192_position_attribution",
    _ATTR_PAIRS_CTE
    + """,
    ranked AS (
      SELECT p.*,
             row_number() OVER (PARTITION BY cid ORDER BY tts, ch) AS pos,
             count(*) OVER (PARTITION BY cid) AS n
      FROM pairs p
    ),
    shared AS (
      SELECT ch, cid,
             CASE WHEN n = 1 THEN vm
                  WHEN n = 2 THEN (vm * 50) // 100
                  WHEN pos = 1 OR pos = n THEN (vm * 40) // 100
                  ELSE ((vm * 20) // 100) // (n - 2)
             END AS share
      FROM ranked
    )
"""
    + _ATTR_ROLLUP,
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.attribution import (
        position_attribution,
    )

    conv, tch = _events_conv_touch(spark, sf_dir)
    return position_attribution(
        conv, tch,
        user_col="user_id", ts_col="ts", value_col="value",
        channel_col="channel", lookback=21_600_000_000_000,
        id_col="event_id",
    )


@q(
    "q193_time_decay_attribution",
    _ATTR_PAIRS_CTE
    + """,
    weighted AS (
      SELECT p.*,
             CAST(CAST(ROUND(pow(2.0, -(CAST(cts - tts AS DOUBLE)
                                        / 3600000000000.0)), 6)
                       AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS wm
      FROM pairs p
    ),
    per_conv AS (SELECT cid, sum(wm) AS wsum FROM weighted GROUP BY cid),
    shared AS (
      SELECT w.ch, w.cid, (w.vm * w.wm) // pc.wsum AS share
      FROM weighted w JOIN per_conv pc USING (cid)
    )
"""
    + _ATTR_ROLLUP,
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.attribution import (
        time_decay_attribution,
    )

    conv, tch = _events_conv_touch(spark, sf_dir)
    return time_decay_attribution(
        conv, tch,
        user_col="user_id", ts_col="ts", value_col="value",
        channel_col="channel", lookback=21_600_000_000_000,
        half_life=3_600_000_000_000,
        id_col="event_id",
    )


# =====================================================================
# Mergeable histogram-sketch quantiles (q194): fixed-range equi-width
# bin counts as reaggregatable quantile state (the Prometheus /
# HDR-histogram idiom) — two date-shard sketches merge cell-wise and
# the quantiles come from one O(bins) cumulative pass. The oracle
# sketches the WHOLE table directly, so the value match proves the
# shard merge is state-exact (the q174 HLL proof pattern, for
# quantiles).
# =====================================================================
from dbt_incremental_ci_spark.operators.histsketch import (  # noqa: E402
    histogram_merge,
    histogram_quantiles,
    histogram_quantiles_sql,
    histogram_sketch,
    histogram_sketch_sql,
)

_HS_LO, _HS_HI, _HS_BINS = 0.0, 110_000.0, 512
_HS_QS = [0.25, 0.5, 0.9, 0.99]


def _q194_oracle() -> str:
    sketch = histogram_sketch_sql(
        "lineitem", "l_extendedprice", _HS_LO, _HS_HI, _HS_BINS
    )
    return (
        f"WITH sk AS ({sketch}),\n"
        + histogram_quantiles_sql("sk", _HS_LO, _HS_HI, _HS_BINS, _HS_QS)
    )


@q("q194_histogram_quantiles", _q194_oracle())
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    early = li.filter(F.year("l_shipdate") < 1998)
    late = li.filter(F.year("l_shipdate") >= 1998)
    merged = histogram_merge(
        histogram_sketch(early, "l_extendedprice", _HS_LO, _HS_HI, _HS_BINS),
        histogram_sketch(late, "l_extendedprice", _HS_LO, _HS_HI, _HS_BINS),
    )
    return histogram_quantiles(merged, _HS_LO, _HS_HI, _HS_BINS, _HS_QS)


# =====================================================================
# Flesch readability (q195): reading-ease scores per document — word /
# sentence / vowel-group-syllable counts as three map-only
# regexp_count expressions (regex classes chosen to mean the same in
# Java regex and RE2, so DuckDB counts identical spans).
# =====================================================================
@q(
    "q195_readability",
    """
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+')) AS words,
             GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
               AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(syllables AS BIGINT) AS syllables,
           CASE WHEN words > 0
                THEN ROUND(206.835
                           - 1.015 * (CAST(words AS DOUBLE) / sentences)
                           - 84.6 * (CAST(syllables AS DOUBLE) / words), 3)
           END AS flesch
    FROM c
    """,
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.text import (
        flesch_reading_ease,
        readability_counts,
    )

    docs = t(spark, sf_dir, "documents")
    c = readability_counts("text")
    return docs.select(
        "doc_id",
        c["words"].cast("bigint").alias("words"),
        c["sentences"].cast("bigint").alias("sentences"),
        c["syllables"].cast("bigint").alias("syllables"),
        flesch_reading_ease("text").alias("flesch"),
    )


# =====================================================================
# Deterministic higher-moment profile (q196): skewness / excess
# kurtosis per measure column from EXACT decimal power sums (built-in
# skewness/kurtosis fold doubles in partition order — not reproducible
# at scale, not cross-engine matchable; Σx..Σx⁴ as DECIMAL(38) are
# associative on any partitioning, and the moment combination is one
# double expression).
# =====================================================================
from dbt_incremental_ci_spark.operators.profiling import (  # noqa: E402
    moments_profile,
    moments_profile_sql,
)

_MOM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@q("q196_moments_profile", moments_profile_sql("lineitem", _MOM_COLS))
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    return moments_profile(t(spark, sf_dir, "lineitem"), _MOM_COLS)


# =====================================================================
# Positional-index phrase search (q197): exact phrase query as
# token-pruned postings joins on (doc, position+offset) — the
# inverted-index shape that replaces LIKE corpus scans at 100 TB
# (postings bucketed by token; each phrase term's join touches only
# that token's postings).
# =====================================================================
from dbt_incremental_ci_spark.operators.retrieval import (  # noqa: E402
    phrase_search,
    phrase_search_sql,
)

_PHRASE = ["merge", "join"]


@q("q197_phrase_search", phrase_search_sql("documents", _PHRASE))
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    return phrase_search(t(spark, sf_dir, "documents"), _PHRASE)


# =====================================================================
# CUSUM change detection (q198): Page's cumulative-sum drift alarm
# over per-type daily event volumes — running-sum identity (s − running
# min), per-key frames only, exact per-key mean/σ from decimal sums.
# =====================================================================
from dbt_incremental_ci_spark.operators.timeseries import (  # noqa: E402
    cusum_changepoints,
    cusum_changepoints_sql,
)

_CUSUM_DAILY_SQL = """(
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)"""


@q(
    "q198_cusum_changepoints",
    cusum_changepoints_sql(_CUSUM_DAILY_SQL, "event_type", "day", "n_events"),
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return cusum_changepoints(daily, "event_type", "day", "n_events")


# =====================================================================
# Classifier confusion matrix (q199): the lang-ID heuristic (q28)
# evaluated against the corpus's true lang column — per (truth,
# predicted) cell counts and per-truth-class recall share. One
# |classes|²-bounded hash aggregate over map-only predictions.
# =====================================================================
from dbt_incremental_ci_spark.workload_q1 import _langid_oracle  # noqa: E402


@q(
    "q199_lang_confusion",
    f"""
    WITH pred AS ({_langid_oracle()}),
    cells AS (
      SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2
    ),
    truth AS (SELECT lang, sum(n) AS t FROM cells GROUP BY lang)
    SELECT c.lang, c.lang_pred,
           CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / CAST(t.t AS DOUBLE), 6) AS recall_share
    FROM cells c JOIN truth t USING (lang)
    """,
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import text

    docs = t(spark, sf_dir, "documents")
    cells = docs.select(
        "lang", text.lang_id("text").alias("lang_pred")
    ).groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    truth = cells.groupBy("lang").agg(F.sum("n").alias("__t"))
    return cells.join(truth, "lang").select(
        "lang",
        "lang_pred",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("__t").cast("double"), 6).alias(
            "recall_share"
        ),
    )


# =====================================================================
# Bitemporal point-in-time query (q200): reconstruct every user's
# state as of a mid-corpus instant from the q156 SCD2 history — a
# pure validity-interval filter (file-prunable on a bounds-partitioned
# history at scale).
# =====================================================================
_AS_OF_NS = 1_705_363_200_000_000_000  # 2024-01-16T00:00Z, mid-corpus


@q(
    "q200_scd2_as_of",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id FROM events
    ),
    d AS (
      SELECT user_id, event_type, tsn, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tsn, event_id) AS prev
      FROM e
    ),
    o AS (
      SELECT user_id, event_type, tsn FROM d
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
    ),
    scd AS (
      SELECT user_id, event_type, tsn AS valid_from,
             lead(tsn) OVER (PARTITION BY user_id ORDER BY tsn)
               AS valid_to
      FROM o
    )
    SELECT user_id, event_type, valid_from
    FROM scd
    WHERE valid_from <= {_AS_OF_NS}
      AND (valid_to IS NULL OR valid_to > {_AS_OF_NS})
    """,
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.scd import (
        scd2_as_of,
        scd2_from_events,
    )

    ev = events_table(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    scd = scd2_from_events(
        ev, "user_id", ["event_type"], "ts", tiebreak_col="event_id"
    )
    return scd2_as_of(scd, _AS_OF_NS)


# =====================================================================
# Categorical drift (q201): order-priority mix 1996 vs 1997 — per
# category shares, PSI contribution, chi-square homogeneity terms.
# Category-cardinality-sized join; the label/segment-mix monitor next
# to q135's numeric PSI.
# =====================================================================
from dbt_incremental_ci_spark.operators.drift import (  # noqa: E402
    categorical_drift,
    categorical_drift_sql,
)


@q(
    "q201_categorical_drift",
    categorical_drift_sql(
        "(SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996)",
        "(SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997)",
        "o_orderpriority",
    ),
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ref = orders.filter(F.year("o_orderdate") == 1996)
    cur = orders.filter(F.year("o_orderdate") == 1997)
    return categorical_drift(ref, cur, "o_orderpriority")


# =====================================================================
# Pareto skyline (q202): cheapest line item dominating each quantity
# level — two-phase frontier (bucketed local running max + O(buckets)
# broadcast prefix maxima), no global single-task sort; the oracle
# affords the textbook sorted pass.
# =====================================================================
from dbt_incremental_ci_spark.operators.skyline import (  # noqa: E402
    skyline_2d,
    skyline_2d_sql,
)

_SKY_ROWS = "(SELECT l_orderkey * 8 + l_linenumber AS lid, l_extendedprice, l_quantity FROM lineitem)"


@q(
    "q202_skyline",
    skyline_2d_sql(_SKY_ROWS, "l_extendedprice", "l_quantity", "lid"),
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lid"),
        "l_extendedprice",
        "l_quantity",
    )
    return skyline_2d(li, "l_extendedprice", "l_quantity", "lid")


# =====================================================================
# Sweep-line peak concurrency (q203): max simultaneous 30-minute
# activity windows per event type — (+1 start, −1 end) points, per-key
# ordered running sum, deterministic earliest-peak argmax. The
# capacity-planning staple; per-key frames only.
# =====================================================================
from dbt_incremental_ci_spark.operators.intervals import (  # noqa: E402
    max_concurrency,
    max_concurrency_sql,
)

_CONC_WIN_NS = 1_800_000_000_000  # 30 min


@q(
    "q203_max_concurrency",
    max_concurrency_sql(
        f"""(
      SELECT event_type, epoch_ns(ts) AS s,
             epoch_ns(ts) + {_CONC_WIN_NS} AS e
      FROM events
    )""",
        "event_type",
        "s",
        "e",
    ),
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.lit(_CONC_WIN_NS)).alias("e"),
    )
    return max_concurrency(iv, "event_type", "s", "e")
