"""q262+: round-7 additions — link prediction (common-neighbor /
resource-allocation / Adamic-Adar), item-item co-occurrence cosine
(bipartite projection), Kruskal-Wallis, one-way ANOVA +
Brown-Forsythe, effect sizes (Cohen's d / Hedges' g / Cliff's delta),
Spearman rank correlation, and the round's time-series / text / data-
quality batches.

Split-module registration contract: see ``workload`` (the hub) and
``workload_base`` (registries + determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    events_table,
    q,
    t,
)

# =====================================================================
# Link prediction on the co-purchase part graph (q262): parts
# repeatedly co-ordered (support ≥ 2) form a sparse undirected graph;
# common-neighbor / resource-allocation / Adamic-Adar scores rank the
# NON-edges most likely to be real associations. operators/linkpred.
# Pair volume: Σ C(|order basket|,2) for edge building (baskets are
# order-sized, ≤ 7 in TPC-H), then Σ min(deg,cap)² for wedges.
# =====================================================================
from dbt_incremental_ci_spark.operators.linkpred import (  # noqa: E402
    item_cooccurrence_cosine,
    item_cooccurrence_cosine_sql,
    neighbor_overlap_scores,
    neighbor_overlap_scores_sql,
)

_COORDER_EDGES = """(
  WITH inc AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
               FROM lineitem),
  pairs AS (
    SELECT a.p AS id_a, b.p AS id_b, count(*) AS c
    FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
  )
  SELECT id_a, id_b FROM pairs WHERE c >= 2
)"""


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    inc = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = inc.select("o", F.col("p").alias("id_a"))
    b = inc.select("o", F.col("p").alias("id_b"))
    return (
        a.join(b, "o")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("id_a", "id_b")
    )


@q(
    "q262_link_prediction",
    neighbor_overlap_scores_sql(
        _COORDER_EDGES, "id_a", "id_b", max_degree=64, top_k=50
    ),
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neighbor_overlap_scores(
        _coorder_edges(spark, sf_dir),
        "id_a",
        "id_b",
        max_degree=64,
        top_k=50,
    )


# =====================================================================
# Item-item co-occurrence cosine (q263): bipartite customer×part
# incidence projected to an item-item similarity — the co-purchase
# recommender's first model. Basket-size cap bounds Σ C(|basket|,2).
# =====================================================================
_CUSTPART_BASKETS = """(
  SELECT o.o_custkey AS cust, l.l_partkey AS part
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)"""


@q(
    "q263_item_cooccurrence",
    item_cooccurrence_cosine_sql(
        _CUSTPART_BASKETS,
        "cust",
        "part",
        max_basket_items=128,
        min_support=2,
        top_k=100,
    ),
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    baskets = o.join(
        li, o["o_orderkey"] == li["l_orderkey"]
    ).select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
    return item_cooccurrence_cosine(
        baskets,
        "cust",
        "part",
        max_basket_items=128,
        min_support=2,
        top_k=100,
    )


# =====================================================================
# Kruskal-Wallis H (q264): did order value distributions move across
# the 5 priority classes — the k-sample Mann-Whitney. Exact integer
# rank arithmetic via the distinct-value cumsum machinery;
# chi2_crit = 95th pct of chi-square(df=4). operators/stattests.
# =====================================================================
from dbt_incremental_ci_spark.operators.stattests import (  # noqa: E402
    anova_oneway,
    anova_oneway_sql,
    effect_sizes,
    effect_sizes_sql,
    kruskal_wallis,
    kruskal_wallis_sql,
    spearman_rho,
    spearman_rho_sql,
)

_CHI2_CRIT_DF4 = 9.487729036781154


@q(
    "q264_kruskal_wallis",
    kruskal_wallis_sql(
        "orders",
        "o_totalprice",
        "o_orderpriority",
        decimals=2,
        chi2_crit=_CHI2_CRIT_DF4,
    ),
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kruskal_wallis(
        t(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderpriority",
        decimals=2,
        chi2_crit=_CHI2_CRIT_DF4,
    )


# =====================================================================
# One-way ANOVA F (q265): the parametric twin of q264 — between/within
# variance decomposition of order value across priority classes from
# ONE per-group (n, Σx, Σx²) fold.
# =====================================================================
@q(
    "q265_anova_f",
    anova_oneway_sql("orders", "o_totalprice", "o_orderpriority", scale=2),
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anova_oneway(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority", scale=2
    )


# =====================================================================
# Brown-Forsythe / Levene variance homogeneity (q266): ANOVA's
# precondition check — one-way ANOVA on |x − group median|. The group
# medians are a groups-sized frame joined back (exact interpolated
# percentile on identically-rounded doubles in both engines).
# =====================================================================
_BF_ROWS = """(
  WITH med AS (
    SELECT o_orderpriority AS g,
           median(ROUND(o_totalprice, 2)) AS m
    FROM orders GROUP BY 1
  )
  SELECT o.o_orderpriority AS grp,
         ABS(ROUND(o.o_totalprice, 2) - med.m) AS zdev
  FROM orders o JOIN med ON o.o_orderpriority = med.g
)"""


@q("q266_levene_bf", anova_oneway_sql(_BF_ROWS, "zdev", "grp", scale=3))
def q266(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice", 2).alias("__x"),
    )
    med = o.groupBy("grp").agg(
        F.percentile("__x", F.lit(0.5)).alias("__m")
    )
    rows = o.join(med, "grp").select(
        "grp", F.abs(F.col("__x") - F.col("__m")).alias("zdev")
    )
    return anova_oneway(rows, "zdev", "grp", scale=3)


# =====================================================================
# Effect sizes (q267): Cohen's d / Hedges' g / Cliff's delta for
# purchase-vs-view event values — the "how big, not how significant"
# readout. Moments from exact decimal folds; Cliff's delta from the
# exact Mann-Whitney 2U integer, rounded in integer space.
# =====================================================================
@q(
    "q267_effect_sizes",
    effect_sizes_sql(
        "events", "value", "event_type", "purchase", "view", decimals=2
    ),
)
def q267(spark: SparkSession, sf_dir: str) -> DataFrame:
    return effect_sizes(
        events_table(spark, sf_dir),
        "value",
        "event_type",
        "purchase",
        "view",
        decimals=2,
    )


# =====================================================================
# Spearman rank correlation (q268): monotone association between a
# customer's order count and total spend (integer cents) — midranks
# via distinct-value cumsum, correlation on exact DECIMAL sums.
# =====================================================================
_SPEND_ROWS = """(
  SELECT o_custkey,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY 1
)"""


@q(
    "q268_spearman",
    spearman_rho_sql(_SPEND_ROWS, "n_orders", "spend_cents"),
)
def q268(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("spend_cents"),
    )
    return spearman_rho(per_cust, "n_orders", "spend_cents")


# =====================================================================
# Daily-count autocorrelation (q269): ACF at lags 1..7 of per-type
# daily event counts — the seasonality fingerprint. Lag spine is a
# constant fan-out; correlation sums are exact DECIMAL folds
# (operators/timeseries.acf).
# =====================================================================
from dbt_incremental_ci_spark.operators.timeseries import (  # noqa: E402
    acf,
    acf_sql,
    page_hinkley,
    page_hinkley_sql,
)

_DAILY_COUNTS = """(
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
)"""


@q(
    "q269_acf",
    acf_sql(_DAILY_COUNTS, "event_type", "day", "c", max_lag=7),
)
def q269(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return acf(daily, "event_type", "day", "c", max_lag=7)


# =====================================================================
# Good-Turing frequency smoothing (q270): freq-of-freqs over word-
# TRIGRAM counts, adjusted counts r* = (r+1)·N_{r+1}/N_r for r ≤ 10 —
# the classical unseen-mass estimate (Good 1953) behind Katz backoff.
# Trigrams, not unigrams: the synthetic corpus has a 31-word
# vocabulary where every unigram count exceeds 10; trigram types give
# the singleton/doubleton tail Good-Turing exists for. Corpus reduces
# to type counts then a COUNTS-OF-COUNTS table (bounded by max
# count); r* rounds half-up in integer space.
# =====================================================================
@q(
    "q270_good_turing",
    """
    WITH tk AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    toks AS (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             AS tok
      FROM tk WHERE len(toks) >= 3
    ),
    counts AS (SELECT tok, count(*) AS r FROM toks GROUP BY tok),
    fof AS (SELECT r, count(*) AS n_r FROM counts GROUP BY r)
    SELECT a.r, CAST(a.n_r AS BIGINT) AS n_r,
           CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_next,
           CASE WHEN b.n_r IS NOT NULL THEN
             CAST(((a.r + 1) * b.n_r * 2000000 + a.n_r)
                  // (a.n_r * 2) AS BIGINT) / 1000000.0
           END AS r_star
    FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
    WHERE a.r <= 10
    ORDER BY a.r
    """,
)
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.ngrams import positional_ngrams

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(positional_ngrams(F.lower(F.col("text")), 3)).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    fof = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("__nn")
    )
    out = (
        fof.join(nxt, "r", "left")
        .filter(F.col("r") <= 10)
        .select(
            "r",
            F.col("n_r").cast("bigint").alias("n_r"),
            F.coalesce(F.col("__nn"), F.lit(0))
            .cast("bigint")
            .alias("n_r_next"),
            F.when(
                F.col("__nn").isNotNull(),
                F.expr(
                    "CAST(((r + 1) * __nn * 2000000 + n_r) "
                    "DIV (n_r * 2) AS BIGINT)"
                ).cast("double")
                / 1_000_000.0,
            ).alias("r_star"),
        )
        .orderBy("r")
    )
    return out


# =====================================================================
# Sequential patterns with gaps (q271): top length-3 event-type
# sequences where each step follows within ≤ 2 positions — the
# PrefixSpan-lite "what do journeys look like" mine. Pair volume is
# per-user activity × gap², both bounded; rn windows are user-keyed.
# =====================================================================
@q(
    "q271_seq_patterns",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    triples AS (
      SELECT a.user_id,
             a.event_type AS e1, b.event_type AS e2, c.event_type AS e3
      FROM ordered a
      JOIN ordered b ON b.user_id = a.user_id
        AND b.rn > a.rn AND b.rn <= a.rn + 2
      JOIN ordered c ON c.user_id = b.user_id
        AND c.rn > b.rn AND c.rn <= b.rn + 2
    )
    SELECT e1, e2, e3,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM triples
    GROUP BY 1, 2, 3
    ORDER BY n_occurrences DESC, e1, e2, e3
    LIMIT 20
    """,
)
def q271(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).localCheckpoint(eager=False)  # three join branches read it
    a = ordered.select(
        "user_id", F.col("event_type").alias("e1"), F.col("rn").alias("r1")
    )
    b = ordered.select(
        "user_id", F.col("event_type").alias("e2"), F.col("rn").alias("r2")
    )
    c = ordered.select(
        "user_id", F.col("event_type").alias("e3"), F.col("rn").alias("r3")
    )
    triples = (
        a.join(b, "user_id")
        .filter((F.col("r2") > F.col("r1")) & (F.col("r2") <= F.col("r1") + 2))
        .join(c, "user_id")
        .filter((F.col("r3") > F.col("r2")) & (F.col("r3") <= F.col("r2") + 2))
    )
    return (
        triples.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "e1", "e2", "e3")
        .limit(20)
    )


# =====================================================================
# Seasonal-naive forecast error / MASE (q272): per-region daily
# revenue, lag-7 seasonal-naive forecast graded against the lag-1
# naive baseline — MASE < 1 means weekly seasonality carries signal.
# Day frames per region are calendar-bounded; cents arithmetic exact.
# =====================================================================
@q(
    "q272_mase",
    """
    WITH daily AS (
      SELECT r.r_name AS region,
             epoch_ns(o.o_orderdate) // 86400000000000 AS day,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    errs AS (
      SELECT region,
             ABS(cents - lag(cents, 1) OVER w) AS e1,
             ABS(cents - lag(cents, 7) OVER w) AS e7
      FROM daily
      WINDOW w AS (PARTITION BY region ORDER BY day)
    ),
    agg AS (
      SELECT region,
             CAST(count(e1) AS BIGINT) AS n1, CAST(SUM(e1) AS BIGINT) AS s1,
             CAST(count(e7) AS BIGINT) AS n7, CAST(SUM(e7) AS BIGINT) AS s7
      FROM errs GROUP BY region
    )
    SELECT region,
           ROUND(CAST(s1 AS DOUBLE) / n1, 6) AS mae_naive,
           ROUND(CAST(s7 AS DOUBLE) / n7, 6) AS mae_seasonal,
           ROUND((CAST(s7 AS DOUBLE) * n1) / (CAST(s1 AS DOUBLE) * n7), 6)
             AS mase
    FROM agg
    ORDER BY region
    """,
)
def q272(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cst = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    daily = (
        o.join(cst, o["o_custkey"] == cst["c_custkey"])
        .join(n, cst["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"),
            F.expr(
                "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 "
                "DIV 86400000000000 AS BIGINT)"
            ).alias("day"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("region").orderBy("day")
    errs = daily.select(
        "region",
        F.abs(F.col("cents") - F.lag("cents", 1).over(w)).alias("e1"),
        F.abs(F.col("cents") - F.lag("cents", 7).over(w)).alias("e7"),
    )
    agg = errs.groupBy("region").agg(
        F.count("e1").cast("bigint").alias("n1"),
        F.sum("e1").cast("bigint").alias("s1"),
        F.count("e7").cast("bigint").alias("n7"),
        F.sum("e7").cast("bigint").alias("s7"),
    )
    return agg.select(
        "region",
        F.round(F.col("s1").cast("double") / F.col("n1"), 6).alias(
            "mae_naive"
        ),
        F.round(F.col("s7").cast("double") / F.col("n7"), 6).alias(
            "mae_seasonal"
        ),
        F.round(
            (F.col("s7").cast("double") * F.col("n1"))
            / (F.col("s1").cast("double") * F.col("n7")),
            6,
        ).alias("mase"),
    ).orderBy("region")


# =====================================================================
# Unary inclusion-dependency discovery (q273): which column value
# sets are subsets of which — the FK-candidate profiler (Bell &
# Brockhausen 1995). Each candidate is a distinct-projection
# anti-join (count of src values missing from dst); the candidate
# list is schema-sized, each check one hash-distinct + one hash join.
# Includes a deliberate "spurious IND" pair (suppkey ⊆ partkey holds
# numerically because both are dense 1..N ranges — the classic
# false-positive the profiler must surface for human review).
# =====================================================================
_IND_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("supplier", "s_suppkey", "part", "p_partkey"),
]


def _ind_oracle() -> str:
    parts = []
    for st, sc, dt, dc in _IND_CANDIDATES:
        parts.append(f"""
    SELECT '{st}' AS src_table, '{sc}' AS src_col,
           '{dt}' AS dst_table, '{dc}' AS dst_col,
           (SELECT CAST(count(DISTINCT {sc}) AS BIGINT) FROM {st})
             AS n_src_distinct,
           (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT DISTINCT {sc} AS v FROM {st}) s
              ANTI JOIN (SELECT DISTINCT {dc} AS v FROM {dt}) d
              ON s.v = d.v) AS n_violations""")
    inner = "\n    UNION ALL".join(parts)
    return f"""
    SELECT *, n_violations = 0 AS is_ind FROM ({inner})
    ORDER BY src_table, src_col, dst_table, dst_col
    """


@q("q273_ind_discovery", _ind_oracle())
def q273(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for st, sc, dt, dc in _IND_CANDIDATES:
        s = t(spark, sf_dir, st).select(F.col(sc).alias("v")).distinct()
        dd = t(spark, sf_dir, dt).select(F.col(dc).alias("v")).distinct()
        viol = s.join(dd, "v", "left_anti")
        row = s.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_src_distinct")
        ).crossJoin(
            viol.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_violations")
            )
        ).select(
            F.lit(st).alias("src_table"),
            F.lit(sc).alias("src_col"),
            F.lit(dt).alias("dst_table"),
            F.lit(dc).alias("dst_col"),
            "n_src_distinct",
            "n_violations",
        )
        outs.append(row)
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.withColumn("is_ind", F.col("n_violations") == 0).orderBy(
        "src_table", "src_col", "dst_table", "dst_col"
    )


# =====================================================================
# Candidate-key discovery (q274): uniqueness check over a fixed
# schema-sized combo list — count(distinct combo) vs count(*) per
# candidate, one hash aggregate each (Huhtala TANE's level-1, the
# practical 80% of key profiling).
# =====================================================================
_KEY_CANDIDATES = [
    ("orders", ["o_orderkey"]),
    ("orders", ["o_custkey"]),
    ("orders", ["o_custkey", "o_orderdate"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("lineitem", ["l_partkey", "l_suppkey"]),
]


def _key_oracle() -> str:
    parts = []
    for tb, cols in _KEY_CANDIDATES:
        cl = ", ".join(cols)
        parts.append(f"""
    SELECT '{tb}' AS table_name, '{cl}' AS columns,
           (SELECT CAST(count(*) AS BIGINT) FROM {tb}) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT {cl} FROM {tb})) AS n_distinct""")
    inner = "\n    UNION ALL".join(parts)
    return f"""
    SELECT *, n_distinct = n_rows AS is_key FROM ({inner})
    ORDER BY table_name, columns
    """


@q("q274_key_discovery", _key_oracle())
def q274(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tb, cols in _KEY_CANDIDATES:
        df = t(spark, sf_dir, tb)
        row = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols])
            .cast("bigint")
            .alias("n_distinct"),
        ).select(
            F.lit(tb).alias("table_name"),
            F.lit(", ".join(cols)).alias("columns"),
            "n_rows",
            "n_distinct",
        )
        outs.append(row)
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.withColumn("is_key", F.col("n_distinct") == F.col("n_rows")).orderBy(
        "table_name", "columns"
    )


# =====================================================================
# Page-Hinkley level-shift detection (q275): per-type daily event
# counts monitored for upward mean shifts — exact integer statistic
# (multiplied through by the series length), frame-bounded per-key
# windows (operators/timeseries.page_hinkley).
# =====================================================================
@q(
    "q275_page_hinkley",
    page_hinkley_sql(
        _DAILY_COUNTS, "event_type", "day", "c", delta=0, lam=25
    ),
)
def q275(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return page_hinkley(daily, "event_type", "day", "c", delta=0, lam=25)


# =====================================================================
# Embedding covariance profile (q276): exact covariance of the first
# 16 embedding dimensions (120 dim pairs) — the redundancy check
# before whitening / PCA. Inputs quantize to DECIMAL(18,6), all sums
# exact; at production scale the same partial (n, Σx, Σy, Σxy) shards
# merge associatively (the moments-merge class), and widening to all
# d²/2 pairs is a budget knob, not a shape change.
# =====================================================================
_Q276_DIMS = 16


def _q276_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings
    ),
    x AS (
      SELECT vec_id, i,
             CAST(ROUND(v[i], 6) AS DECIMAL(18,6)) AS xi
      FROM e, (SELECT unnest(generate_series(1, {_Q276_DIMS})) AS i)
      WHERE len(v) >= {_Q276_DIMS}
    ),
    pairs AS (
      SELECT a.i AS dim_i, b.i AS dim_j,
             count(*) AS n,
             SUM(a.xi) AS sx, SUM(b.xi) AS sy,
             SUM(CAST(a.xi * b.xi AS DECIMAL(37,12))) AS sxy
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY 1, 2
    ),
    cov AS (
      SELECT CAST(dim_i AS INT) AS dim_i, CAST(dim_j AS INT) AS dim_j,
             CAST(n AS BIGINT) AS n,
             ROUND(CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n),
                   6) AS cov
      FROM pairs
    )
    SELECT dim_i, dim_j, n, cov, ABS(cov) AS abs_cov
    FROM cov
    ORDER BY abs_cov DESC, dim_i, dim_j
    LIMIT 20
    """


@q("q276_emb_covariance", _q276_oracle())
def q276(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = emb.filter(F.size("embedding") >= _Q276_DIMS).select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, _Q276_DIMS)).alias(
            "__p", "__val"
        ),
    ).select(
        "vec_id",
        (F.col("__p") + 1).alias("i"),
        F.round(F.col("__val").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("xi"),
    ).localCheckpoint(eager=False)  # both pair sides read it
    a = x.select("vec_id", F.col("i").alias("dim_i"), F.col("xi").alias("xa"))
    b = x.select("vec_id", F.col("i").alias("dim_j"), F.col("xi").alias("xb"))
    pairs = (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") < F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(37,12)")).alias(
                "sxy"
            ),
        )
    )
    nd = F.col("n").cast("double")
    cov = F.round(
        F.col("sxy").cast("double") / nd
        - (F.col("sx").cast("double") / nd)
        * (F.col("sy").cast("double") / nd),
        6,
    )
    return (
        pairs.select(
            F.col("dim_i").cast("int").alias("dim_i"),
            F.col("dim_j").cast("int").alias("dim_j"),
            F.col("n").cast("bigint").alias("n"),
            cov.alias("cov"),
        )
        .withColumn("abs_cov", F.abs(F.col("cov")))
        .orderBy(F.desc("abs_cov"), "dim_i", "dim_j")
        .limit(20)
    )


# =====================================================================
# Reciprocal best match (q277): mutual 1-NN by cosine between a FIXED
# probe shard (vec_id < 200 — the §6o fixed-eval-set rule: probe sets
# are audit-sized, they don't grow with the corpus) and the rest —
# the translation-pair / duplicate-pair mining primitive. One
# probes×corpus score pass feeds BOTH argmax directions; ranking on
# ROUNDED cosine + id tiebreak (house rule).
# =====================================================================
@q(
    "q277_reciprocal_best_match",
    """
    WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 200),
    b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id >= 200),
    scored AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             ROUND(list_dot_product(a.v, b.v)
                   / NULLIF(sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v)), 0), 6)
               AS cosine
      FROM a CROSS JOIN b
    ),
    best_a AS (
      SELECT a_id, b_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY a_id
          ORDER BY cosine DESC, b_id) AS rn FROM scored) WHERE rn = 1
    ),
    best_b AS (
      SELECT a_id, b_id FROM (
        SELECT *, row_number() OVER (PARTITION BY b_id
          ORDER BY cosine DESC, a_id) AS rn FROM scored) WHERE rn = 1
    )
    SELECT ba.a_id, ba.b_id, ba.cosine
    FROM best_a ba JOIN best_b bb
      ON ba.a_id = bb.a_id AND ba.b_id = bb.b_id
    ORDER BY ba.a_id
    """,
)
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import similarity

    # norms fold ONCE per vector (n + 200 rows), not once per pair —
    # the pair pass then runs a single dot fold per candidate
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "nrm", F.sqrt(similarity.dot(F.col("v"), F.col("v")))
    )
    a = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = emb.filter(F.col("vec_id") >= 200).select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # probes×corpus dots on the Arrow einsum path: the interpreted
    # aggregate fold was ~90% of the sf1 gate wall (40.5 s, ratio
    # 11.1×); round-6 absorbs the einsum-vs-fold ulp (the dot_arrow
    # contract, validated against the DuckDB oracles)
    scored = (
        F.broadcast(a)
        .crossJoin(b)  # driver-bound fan-out: |probes| fixed at 200
        .select(
            "a_id",
            "b_id",
            F.round(
                similarity.dot_arrow()(F.col("va"), F.col("vb"))
                / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
        .localCheckpoint(eager=False)  # both argmax directions read it
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("cosine"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("cosine"), "a_id")
    best_a = (
        scored.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    best_b = (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("a_id", "b_id")
    )
    return best_a.join(best_b, ["a_id", "b_id"]).orderBy("a_id")


# =====================================================================
# Theil-Sen robust trend (q278): median-of-pairwise-slopes on the
# DAILY revenue series — the outlier-proof regression line. The pair
# frame is days², calendar-bounded (never corpus-scaled: the corpus
# reduces to one row per day first); slopes are IEEE divisions of
# exact integer cents/days, medians interpolate identically in both
# engines.
# =====================================================================
@q(
    "q278_theil_sen",
    """
    WITH daily AS (
      SELECT epoch_ns(o_orderdate) // 86400000000000 AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    slopes AS (
      SELECT (b.cents - a.cents) * 1.0 / (b.day - a.day) AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    sl AS (SELECT median(s) AS slope FROM slopes),
    icept AS (
      SELECT median(d.cents - sl.slope * d.day) AS intercept
      FROM daily d, sl
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           (SELECT CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
            FROM daily) AS n_pairs,
           ROUND(sl.slope, 6) AS slope,
           ROUND(icept.intercept, 6) AS intercept
    FROM sl, icept
    """,
)
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 "
            "DIV 86400000000000 AS BIGINT)"
        ).alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    ).localCheckpoint(eager=False)  # pair sides + intercept read it
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    # slopes are consumed by exactly ONE aggregate (the median):
    # n_pairs = n_days·(n_days−1)/2 by construction, so no second
    # pass / checkpoint materialization of the days² frame is needed
    # the WHEN guard is load-bearing under ANSI: exact_quantiles'
    # isNotNull filter gets merged into the BNL join condition AHEAD
    # of db > da, so an unguarded division evaluates on the da == db
    # diagonal and throws DIVIDE_BY_ZERO
    slopes = a.join(b, F.col("db") > F.col("da")).select(
        F.when(
            F.col("db") != F.col("da"),
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("db") - F.col("da")).cast("double"),
        ).alias("s")
    )
    # median of 2.9M mostly-DISTINCT doubles: F.percentile's
    # single-task object buffer measured 9.8 s and the distinct-value
    # cumsum (exact_quantiles) is no better when nothing deduplicates
    # — the right shape here is a partition-parallel range sort +
    # two-phase row_number, picking the two middle order statistics
    # directly (~2 s; identical value: avg of middle two = the
    # quantile_cont 0.5 interpolation)
    from dbt_incremental_ci_spark.operators.ranks import (
        two_phase_row_number,
    )

    ranked = two_phase_row_number(
        slopes.localCheckpoint(eager=False), [F.col("s")], out_col="__rn"
    )
    npairs_lit = ranked.agg(F.count(F.lit(1)).alias("__n"))
    sl = (
        ranked.crossJoin(F.broadcast(npairs_lit))
        .filter(
            (F.col("__rn") * 2 == F.col("__n") + 1)  # odd n: middle
            | (F.col("__rn") * 2 == F.col("__n"))  # even n: lower mid
            | (F.col("__rn") * 2 == F.col("__n") + 2)  # even n: upper
        )
        .agg(F.avg("s").alias("slope"))
    )
    icept = daily.crossJoin(F.broadcast(sl)).agg(
        F.percentile(
            F.col("cents").cast("double") - F.col("slope") * F.col("day"),
            F.lit(0.5),
        ).alias("intercept")
    )
    counts = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    ).withColumn(
        "n_pairs",
        F.expr("n_days * (n_days - 1) DIV 2").cast("bigint"),
    )
    return (
        counts.crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(icept))
        .select(
            "n_days",
            "n_pairs",
            F.round("slope", 6).alias("slope"),
            F.round("intercept", 6).alias("intercept"),
        )
    )


# =====================================================================
# Kendall tau-b (q279): concordance of daily order volume vs daily
# revenue — the rank-correlation that handles ties head-on. The pair
# frame is days² (calendar-bounded, the Theil-Sen class); tie terms
# come from value-count aggregates, never the pair join; everything
# is exact integers until the one final double expression.
# =====================================================================
@q(
    "q279_kendall_tau",
    """
    WITH daily AS (
      SELECT epoch_ns(o_orderdate) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS disc
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    cd AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n0
      FROM pairs
    ),
    tx AS (
      SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS tsum FROM
        (SELECT count(*) AS t FROM daily GROUP BY x)
    ),
    ty AS (
      SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS tsum FROM
        (SELECT count(*) AS t FROM daily GROUP BY y)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           cd.n0 AS n_pairs, cd.c AS concordant, cd.d AS discordant,
           ROUND((cd.c - cd.d)
                 / sqrt(CAST(cd.n0 - tx.tsum AS DOUBLE)
                        * CAST(cd.n0 - ty.tsum AS DOUBLE)), 6) AS tau_b
    FROM cd, tx, ty
    """,
)
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 "
            "DIV 86400000000000 AS BIGINT)"
        ).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("y"),
    ).localCheckpoint(eager=False)  # pair sides + tie margins read it
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    ).cast("int")
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    ).cast("int")
    cd = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(conc).cast("bigint").alias("c"),
            F.sum(disc).cast("bigint").alias("d"),
            F.count(F.lit(1)).cast("bigint").alias("n0"),
        )
    )
    tx = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) DIV 2")).cast("bigint").alias("txs")
        )
    )
    ty = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) DIV 2")).cast("bigint").alias("tys")
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    tau = F.round(
        (F.col("c") - F.col("d")).cast("double")
        / F.sqrt(
            (F.col("n0") - F.col("txs")).cast("double")
            * (F.col("n0") - F.col("tys")).cast("double")
        ),
        6,
    )
    return (
        nd.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n_days",
            F.col("n0").alias("n_pairs"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            tau.alias("tau_b"),
        )
    )


# =====================================================================
# Recommendation coverage & novelty (q280): grade the q263 co-
# occurrence recommender's top-3 lists — catalog coverage (share of
# items ever recommended) and mean novelty (−log₂ popularity share of
# recommended items, Vargas & Castells 2011). Rec lists come from the
# pair frame both ways (item-keyed windows); novelty terms are
# ROUND-9 into DECIMAL before the sum (srm rule).
# =====================================================================
@q(
    "q280_rec_coverage",
    """
    WITH inc AS (
      SELECT DISTINCT o.o_custkey AS b, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sizes AS (SELECT b, count(*) AS sz FROM inc GROUP BY b),
    kept AS (
      SELECT inc.b, inc.i FROM inc JOIN sizes USING (b)
      WHERE sizes.sz <= 128
    ),
    n_i AS (SELECT i, count(*) AS n FROM kept GROUP BY i),
    nb AS (SELECT count(DISTINCT b) AS n_baskets FROM kept),
    pairs AS (
      SELECT a.i AS ia, b.i AS ib, count(*) AS c
      FROM kept a JOIN kept b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    directed AS (
      SELECT ia AS src, ib AS dst,
             ROUND(c / sqrt(CAST(na.n * nd.n AS DOUBLE)), 6) AS cosine
      FROM pairs JOIN n_i na ON pairs.ia = na.i
                 JOIN n_i nd ON pairs.ib = nd.i
      UNION ALL
      SELECT ib AS src, ia AS dst,
             ROUND(c / sqrt(CAST(na.n * nd.n AS DOUBLE)), 6) AS cosine
      FROM pairs JOIN n_i na ON pairs.ia = na.i
                 JOIN n_i nd ON pairs.ib = nd.i
    ),
    recs AS (
      SELECT src, dst FROM (
        SELECT *, row_number() OVER (PARTITION BY src
          ORDER BY cosine DESC, dst) AS rn FROM directed) WHERE rn <= 3
    ),
    nov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_recs,
             CAST(SUM(CAST(ROUND(-log2(CAST(n_i.n AS DOUBLE)
                                       / nb.n_baskets), 9)
                           AS DECIMAL(28,9))) AS DOUBLE) AS novsum
      FROM recs JOIN n_i ON recs.dst = n_i.i, nb
    ),
    cov AS (
      SELECT CAST(count(DISTINCT dst) AS BIGINT) AS n_recommended,
             (SELECT CAST(count(*) AS BIGINT) FROM n_i) AS n_items
      FROM recs
    )
    SELECT cov.n_items, cov.n_recommended,
           CAST((cov.n_recommended * 2000000 + cov.n_items)
                // (cov.n_items * 2) AS BIGINT) / 1000000.0 AS coverage,
           nov.n_recs,
           ROUND(nov.novsum / nov.n_recs, 6) AS mean_novelty
    FROM cov, nov
    """,
)
def q280(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    inc = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("b"), F.col("l_partkey").alias("i"))
        .repartition("b")
        .dropDuplicates(["b", "i"])
    )
    # NOTE (round-11): the q253-style in-partition pair explosion was
    # tried on this prefix and measured 3.4× SLOWER (see
    # operators/linkpred.py item_cooccurrence_cosine) — at ~128-item
    # baskets the per-basket O(sz²) struct array costs more than the
    # join's streamed pairs. The self-join stays on purpose.
    # Round-12 (guide §2.4, mirroring item_cooccurrence_cosine): one
    # hash-by-basket exchange feeds the distinct, the window size cap,
    # and both self-join sides.
    kept = (
        inc.withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("b"))
        )
        .filter(F.col("sz") <= 128)
        .select("b", "i")
        .localCheckpoint(eager=False)
    )
    n_i = kept.groupBy("i").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=False
    )
    nb = kept.agg(F.countDistinct("b").alias("n_baskets"))
    a = kept.select("b", F.col("i").alias("ia"))
    bb = kept.select("b", F.col("i").alias("ib"))
    pairs = (
        a.join(bb, "b")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    na = n_i.select(F.col("i").alias("ia"), F.col("n").alias("na"))
    ndm = n_i.select(F.col("i").alias("ib"), F.col("n").alias("ndn"))
    scored = pairs.join(na, "ia").join(ndm, "ib").select(
        "ia",
        "ib",
        F.round(
            F.col("c").cast("double")
            / F.sqrt((F.col("na") * F.col("ndn")).cast("double")),
            6,
        ).alias("cosine"),
    )
    directed = scored.select(
        F.col("ia").alias("src"), F.col("ib").alias("dst"), "cosine"
    ).unionAll(
        scored.select(
            F.col("ib").alias("src"), F.col("ia").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    recs = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
        .localCheckpoint(eager=False)  # coverage + novelty read it
    )
    nov = (
        recs.join(n_i.withColumnRenamed("i", "dst"), "dst")
        .crossJoin(F.broadcast(nb))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_recs"),
            F.sum(
                F.round(
                    -F.log2(
                        F.col("n").cast("double") / F.col("n_baskets")
                    ),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("novsum"),
        )
    )
    cov = recs.agg(
        F.countDistinct("dst").cast("bigint").alias("n_recommended")
    ).crossJoin(
        F.broadcast(n_i.agg(F.count(F.lit(1)).cast("bigint").alias("n_items")))
    )
    coverage = (
        F.expr(
            "CAST((n_recommended * 2000000 + n_items) "
            "DIV (n_items * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        cov.crossJoin(F.broadcast(nov))
        .select(
            "n_items",
            "n_recommended",
            coverage.alias("coverage"),
            "n_recs",
            F.round(F.col("novsum") / F.col("n_recs"), 6).alias(
                "mean_novelty"
            ),
        )
    )


# =====================================================================
# Popularity-baseline hit rate (q281): leave-last-order-out eval of
# the "recommend the global top-20 parts" baseline — the sanity floor
# every recommender must beat. Split is per-customer windows (last
# order = test, tiebreak orderkey); top-20 from TRAIN popularity only
# (no leakage); hit rate rounds in integer space.
# =====================================================================
@q(
    "q281_popularity_hitrate",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_custkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS n_orders
      FROM orders
    ),
    eligible AS (SELECT * FROM ranked WHERE n_orders >= 2),
    test_orders AS (SELECT o_orderkey, o_custkey FROM eligible
                    WHERE rn = 1),
    train_orders AS (SELECT o_orderkey FROM eligible WHERE rn > 1),
    top20 AS (
      SELECT l.l_partkey FROM lineitem l
      SEMI JOIN train_orders tr ON l.l_orderkey = tr.o_orderkey
      GROUP BY 1 ORDER BY count(*) DESC, l.l_partkey LIMIT 20
    ),
    test_parts AS (
      SELECT DISTINCT t.o_custkey, l.l_partkey
      FROM test_orders t JOIN lineitem l ON l.l_orderkey = t.o_orderkey
    ),
    hits AS (
      SELECT DISTINCT tp.o_custkey
      FROM test_parts tp SEMI JOIN top20 ON tp.l_partkey = top20.l_partkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM test_orders)
             AS n_eval_users,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
           CAST(((SELECT count(*) FROM hits) * 2000000
                 + (SELECT count(*) FROM test_orders))
                // ((SELECT count(*) FROM test_orders) * 2) AS BIGINT)
             / 1000000.0 AS hit_rate
    """,
)
def q281(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    wc = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_orders"),
    ).filter(F.col("n_orders") >= 2).localCheckpoint(eager=False)
    test_orders = ranked.filter(F.col("rn") == 1).select(
        "o_orderkey", "o_custkey"
    ).localCheckpoint(eager=False)
    train_orders = ranked.filter(F.col("rn") > 1).select("o_orderkey")
    top20 = (
        li.join(train_orders, li["l_orderkey"] == train_orders["o_orderkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), "l_partkey")
        .limit(20)
        .select("l_partkey")
    )
    test_parts = (
        test_orders.join(li, test_orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    hits = test_parts.join(
        F.broadcast(top20), "l_partkey", "left_semi"
    ).select("o_custkey").distinct()
    ne = test_orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_users")
    )
    nh = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    rate = (
        F.expr(
            "CAST((n_hits * 2000000 + n_eval_users) "
            "DIV (n_eval_users * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        ne.crossJoin(F.broadcast(nh))
        .select("n_eval_users", "n_hits", rate.alias("hit_rate"))
    )


# =====================================================================
# Shannon diversity / evenness per source (q282): language diversity
# audit of each corpus slice — H = ln n − (Σ c·ln c)/n over the
# per-source language counts, evenness = H/ln k (Pielou 1966). The
# corpus reduces to a (source × lang)-sized count frame; ln terms
# round-9 into DECIMAL before the per-source sum (srm rule).
# =====================================================================
@q(
    "q282_diversity_index",
    """
    WITH counts AS (
      SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
    ),
    per_source AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(SUM(CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 9)
                           AS DECIMAL(28,9))) AS DOUBLE) AS clnc
      FROM counts GROUP BY source
    )
    SELECT source, n_docs, n_langs,
           ROUND(ln(CAST(n_docs AS DOUBLE)) - clnc / n_docs, 6)
             AS shannon_h,
           CASE WHEN n_langs > 1 THEN
             ROUND((ln(CAST(n_docs AS DOUBLE)) - clnc / n_docs)
                   / ln(CAST(n_langs AS DOUBLE)), 6)
           END AS evenness
    FROM per_source
    ORDER BY source
    """,
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_source = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(
            F.round(
                F.col("c") * F.log(F.col("c").cast("double")), 9
            ).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("clnc"),
    )
    h = F.log(F.col("n_docs").cast("double")) - F.col("clnc") / F.col(
        "n_docs"
    )
    return per_source.select(
        "source",
        "n_docs",
        "n_langs",
        F.round(h, 6).alias("shannon_h"),
        F.when(
            F.col("n_langs") > 1,
            F.round(h / F.log(F.col("n_langs").cast("double")), 6),
        ).alias("evenness"),
    ).orderBy("source")


# =====================================================================
# Day-over-day audience overlap (q283): EXACT Jaccard of adjacent
# days' active-user sets — the retention/churn curve at day grain
# (the exact twin of q254's HLL overlap: per-day sets are day-bounded,
# so exactness is affordable; the sketch path takes over when a
# window's set no longer fits a join). One distinct pass + one
# self-join on (user, day+1); Jaccard rounds in integer space.
# =====================================================================
@q(
    "q283_audience_overlap",
    """
    WITH du AS (
      SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day
      FROM events
    ),
    sizes AS (SELECT day, count(*) AS n FROM du GROUP BY day),
    inter AS (
      SELECT a.day AS day, count(*) AS ix
      FROM du a JOIN du b ON b.user_id = a.user_id AND b.day = a.day + 1
      GROUP BY a.day
    )
    SELECT s1.day, CAST(s1.n AS BIGINT) AS n_day,
           CAST(s2.n AS BIGINT) AS n_next,
           CAST(COALESCE(i.ix, 0) AS BIGINT) AS n_overlap,
           CAST((COALESCE(i.ix, 0) * 2000000
                 + (s1.n + s2.n - COALESCE(i.ix, 0)))
                // ((s1.n + s2.n - COALESCE(i.ix, 0)) * 2) AS BIGINT)
             / 1000000.0 AS jaccard
    FROM sizes s1
    JOIN sizes s2 ON s2.day = s1.day + 1
    LEFT JOIN inter i ON i.day = s1.day
    ORDER BY s1.day
    """,
)
def q283(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    du = ev.select(
        "user_id",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    ).distinct().localCheckpoint(eager=False)  # sizes + both join sides
    sizes = du.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    a = du.select("user_id", F.col("day").alias("da"))
    b = du.select("user_id", (F.col("day") - 1).alias("da"))
    inter = (
        a.join(b, ["user_id", "da"])
        .groupBy("da")
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    s1 = sizes.select(F.col("day"), F.col("n").alias("n_day"))
    s2 = sizes.select(
        (F.col("day") - 1).alias("day"), F.col("n").alias("n_next")
    )
    joined = (
        s1.join(s2, "day")
        .join(inter.withColumnRenamed("da", "day"), "day", "left")
        .withColumn("n_overlap", F.coalesce(F.col("ix"), F.lit(0)))
    )
    jac = (
        F.expr(
            "CAST((n_overlap * 2000000 + (n_day + n_next - n_overlap)) "
            "DIV ((n_day + n_next - n_overlap) * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return joined.select(
        "day",
        F.col("n_day").cast("bigint").alias("n_day"),
        F.col("n_next").cast("bigint").alias("n_next"),
        F.col("n_overlap").cast("bigint").alias("n_overlap"),
        jac.alias("jaccard"),
    ).orderBy("day")


# =====================================================================
# Categorical information gain via Gini (q284): which categorical
# feature best splits urgent-vs-rest orders — the categorical
# counterpart of q242's threshold stump (CART, Breiman 1984). Gini is
# RATIONAL in the class counts ((n²−Σc²)/n²), so the parent impurity
# is exact; per-value terms widen through exact DECIMAL squares and
# take ONE double division each, cast (never ROUND) into DECIMAL
# before the value sum (the q265 cast rule). Count frames are
# (feature × value)-sized.
# =====================================================================
def _q284_oracle() -> str:
    feats = [
        ("o_orderstatus", "o.o_orderstatus"),
        ("order_year", "CAST(year(o.o_orderdate) AS VARCHAR)"),
        ("cust_nation", "n.n_name"),
    ]
    parts = []
    for name, expr in feats:
        parts.append(f"""
    SELECT '{name}' AS feature, v, n_v, pos FROM (
      SELECT {expr} AS v, count(*) AS n_v,
             SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS pos
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )""")
    vals = "\nUNION ALL".join(parts)
    return f"""
    WITH vals AS ({vals}),
    terms AS (
      SELECT feature, v, n_v, pos,
             CAST(CAST(CAST(n_v AS HUGEINT) * n_v
                       - (CAST(pos AS HUGEINT) * pos
                          + CAST(n_v - pos AS HUGEINT) * (n_v - pos))
                       AS DOUBLE) / n_v AS DECIMAL(38,6)) AS term
      FROM vals
    ),
    per_feat AS (
      SELECT feature, CAST(count(*) AS BIGINT) AS n_values,
             CAST(SUM(n_v) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS npos,
             CAST(SUM(term) AS DOUBLE) AS wsum
      FROM terms GROUP BY feature
    )
    SELECT feature, n_values,
           ROUND(wsum / n, 6) AS weighted_gini,
           ROUND(CAST(CAST(n AS HUGEINT) * n
                      - (CAST(npos AS HUGEINT) * npos
                         + CAST(n - npos AS HUGEINT) * (n - npos))
                      AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                 - wsum / n, 6) AS gini_gain
    FROM per_feat
    ORDER BY gini_gain DESC, feature
    """


@q("q284_gini_gain", _q284_oracle())
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cst = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    base = (
        o.join(cst, o["o_custkey"] == cst["c_custkey"])
        .join(F.broadcast(n), cst["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("o_orderstatus").alias("f_status"),
            F.year("o_orderdate").cast("string").alias("f_year"),
            F.col("n_name").alias("f_nation"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("int")
            .alias("y"),
        )
        .localCheckpoint(eager=False)  # three per-feature aggs read it
    )
    feats = [("o_orderstatus", "f_status"), ("order_year", "f_year"),
             ("cust_nation", "f_nation")]
    outs = []
    d380 = "decimal(38,0)"
    for name, col in feats:
        vals = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("n_v"), F.sum("y").alias("pos")
        )
        nvd = F.col("n_v").cast(d380)
        pd_ = F.col("pos").cast(d380)
        qd = (F.col("n_v") - F.col("pos")).cast(d380)
        term = (
            (nvd * nvd - (pd_ * pd_ + qd * qd)).cast("double")
            / F.col("n_v")
        ).cast("decimal(38,6)")
        per = vals.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.sum("n_v").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("npos"),
            F.sum(term).cast("double").alias("wsum"),
        ).select(F.lit(name).alias("feature"), "n_values", "n", "npos", "wsum")
        outs.append(per)
    u = outs[0]
    for x in outs[1:]:
        u = u.unionAll(x)
    nd = F.col("n").cast(d380)
    posd = F.col("npos").cast(d380)
    negd = (F.col("n") - F.col("npos")).cast(d380)
    parent = (nd * nd - (posd * posd + negd * negd)).cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    return u.select(
        "feature",
        "n_values",
        F.round(F.col("wsum") / F.col("n"), 6).alias("weighted_gini"),
        F.round(parent - F.col("wsum") / F.col("n"), 6).alias("gini_gain"),
    ).orderBy(F.desc("gini_gain"), "feature")


# =====================================================================
# Time-to-convert percentiles (q285): seconds from a user's first
# view to their first later purchase, at p50/p90/p99 — funnel latency
# SLOs. Reuses the scalable exact-quantile path end to end (the q77
# operator both sides: no single-task sort anywhere).
# =====================================================================
from dbt_incremental_ci_spark.operators.ranks import (  # noqa: E402
    exact_quantiles,
    exact_quantiles_sql,
)

_TTC_ROWS = """(
  WITH per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS tv,
           min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
             AS tp
    FROM events GROUP BY 1
  )
  SELECT (tp - tv) // 1000000000 AS delta_sec
  FROM per_user WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv
)"""


@q(
    "q285_time_to_convert",
    f"""
    SELECT q, n, ROUND(quantile, 3) AS quantile_sec
    FROM ({exact_quantiles_sql(_TTC_ROWS, "delta_sec", [0.5, 0.9, 0.99])})
    ORDER BY q
    """,
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("tv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
    )
    deltas = per_user.filter(
        F.col("tv").isNotNull()
        & F.col("tp").isNotNull()
        & (F.col("tp") > F.col("tv"))
    ).select(
        F.expr("CAST((tp - tv) DIV 1000000000 AS BIGINT)").alias("delta_sec")
    )
    return (
        exact_quantiles(deltas, "delta_sec", [0.5, 0.9, 0.99])
        .select("q", "n", F.round("quantile", 3).alias("quantile_sec"))
        .orderBy("q")
    )


# =====================================================================
# Join-key skew audit (q286): the pre-shuffle planning readout —
# per-key row counts reduced to max / median / hot-key share, the
# numbers that decide salting (q50) vs AQE skew-join. Median of the
# count-of-counts via the scalable exact-quantile path.
# =====================================================================
@q(
    "q286_key_skew_audit",
    f"""
    WITH kc AS (
      SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1
    ),
    med AS (
      SELECT quantile AS p50 FROM
        ({exact_quantiles_sql("kc", "c", [0.5])})
    ),
    top1 AS (
      SELECT CAST(min(k) AS BIGINT) AS hot_key,
             CAST(max(c) AS BIGINT) AS max_cnt
      FROM kc WHERE c = (SELECT max(c) FROM kc)
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(SUM(c) AS BIGINT) AS n_rows FROM kc)
    SELECT tot.n_keys, tot.n_rows, top1.hot_key,
           CAST(top1.max_cnt AS BIGINT) AS max_cnt,
           med.p50 AS p50_cnt,
           ROUND(top1.max_cnt / med.p50, 6) AS skew_factor,
           CAST((top1.max_cnt * 2000000 + tot.n_rows)
                // (tot.n_rows * 2) AS BIGINT) / 1000000.0 AS top1_share
    FROM tot, top1, med
    """,
)
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)  # totals + median + argmax read it
    med = exact_quantiles(kc, "c", [0.5]).select(
        F.col("quantile").alias("p50_cnt")
    )
    # hot key = LOWEST key among those at the max count — a two-pass
    # (max, then filter-and-min) shape that is exact at any key
    # magnitude (the r06 lpad(-k + 99999999) inversion went negative
    # past l_partkey 99,999,999, i.e. sf >= ~500 — ADVICE r06 item 3)
    mx = kc.agg(F.max("c").alias("__mx"))
    top1 = (
        kc.join(F.broadcast(mx), F.col("c") == F.col("__mx"))
        .agg(
            F.min("k").cast("bigint").alias("hot_key"),
            F.max("c").cast("bigint").alias("max_cnt"),
        )
    )
    tot = kc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
    )
    share = (
        F.expr(
            "CAST((max_cnt * 2000000 + n_rows) DIV (n_rows * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        tot.crossJoin(F.broadcast(top1))
        .crossJoin(F.broadcast(med))
        .select(
            "n_keys",
            "n_rows",
            "hot_key",
            F.col("max_cnt").cast("bigint").alias("max_cnt"),
            "p50_cnt",
            F.round(
                F.col("max_cnt").cast("double") / F.col("p50_cnt"), 6
            ).alias("skew_factor"),
            share.alias("top1_share"),
        )
    )


# =====================================================================
# Markov entropy rate (q287): conditional entropy H(next|prev) of the
# event-type chain vs its ln(k) ceiling — how predictable user
# behavior is (the q144/q250 transition matrix graded as information).
# H = (Σ_x c_x ln c_x − Σ_xy c_xy ln c_xy)/N over the states²-sized
# count frame; ln terms ROUND-9 into DECIMAL (srm rule).
# =====================================================================
@q(
    "q287_entropy_rate",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    tr AS (
      SELECT prev, event_type AS cur, count(*) AS c
      FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    margins AS (SELECT prev, SUM(c) AS cx FROM tr GROUP BY prev),
    sums AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM tr) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM margins) AS k,
             (SELECT CAST(SUM(CAST(ROUND(cx * ln(CAST(cx AS DOUBLE)), 9)
                                   AS DECIMAL(28,9))) AS DOUBLE)
              FROM margins) AS a,
             (SELECT CAST(SUM(CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 9)
                                   AS DECIMAL(28,9))) AS DOUBLE)
              FROM tr) AS b
    )
    SELECT n AS n_transitions, k AS n_states,
           ROUND((a - b) / n, 6) AS entropy_rate,
           ROUND(ln(CAST(k AS DOUBLE)), 6) AS max_entropy,
           CASE WHEN k > 1 THEN
             ROUND(((a - b) / n) / ln(CAST(k AS DOUBLE)), 6)
           END AS efficiency
    FROM sums
    """,
)
def q287(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # margins + sums both read it
    )
    margins = tr.groupBy("prev").agg(F.sum("c").alias("cx"))

    def lnfold(col: str) -> F.Column:
        return (
            F.sum(
                F.round(
                    F.col(col) * F.log(F.col(col).cast("double")), 9
                ).cast("decimal(28,9)")
            )
            .cast("double")
        )

    a = margins.agg(
        lnfold("cx").alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    b = tr.agg(
        lnfold("c").alias("b"),
        F.sum("c").cast("bigint").alias("n"),
    )
    h = (F.col("a") - F.col("b")) / F.col("n")
    lnk = F.log(F.col("k").cast("double"))
    return (
        b.crossJoin(F.broadcast(a))
        .select(
            F.col("n").alias("n_transitions"),
            F.col("k").alias("n_states"),
            F.round(h, 6).alias("entropy_rate"),
            F.round(lnk, 6).alias("max_entropy"),
            F.when(F.col("k") > 1, F.round(h / lnk, 6)).alias(
                "efficiency"
            ),
        )
    )


# =====================================================================
# Grid-density clustering / DBSCAN-lite (q288): JL-project embeddings
# to 2-D (shared ±1 literal matrix, the q236 recipe), bucket into
# fixed cells, keep cells ≥ minpts, merge 8-adjacent dense cells with
# the O(log n) components operator. The scalable density-clustering
# shape: the corpus reduces to an occupied-CELL frame before any
# graph work; adjacency is a 9-offset equi-join, never a range join.
# =====================================================================
# cell width / density floor sized to the embeddings' projection
# spread (unit-normalized vectors project to ~N(0, 0.7²)): h = 0.2
# gives ~100 occupied cells and a multi-cluster dense structure at
# sf0.01 (4 clusters); coarser grids collapse to one blob
_Q288_H = 0.2
_Q288_MINPTS = 3


def _q288_oracle() -> str:
    import math

    from dbt_incremental_ci_spark.operators.similarity import jl_sign_vector

    scale = 1.0 / math.sqrt(2)

    def arr(row):
        return "[" + ",".join(repr(x) for x in row) + "]"

    px = (
        f"list_dot_product(embedding::DOUBLE[], {arr(jl_sign_vector(64, 0))})"
        f" * {scale!r}"
    )
    py = (
        f"list_dot_product(embedding::DOUBLE[], {arr(jl_sign_vector(64, 1))})"
        f" * {scale!r}"
    )
    return f"""
    WITH RECURSIVE
    cells AS (
      SELECT CAST(floor(ROUND({px}, 6) / {_Q288_H!r}) AS BIGINT) AS cx,
             CAST(floor(ROUND({py}, 6) / {_Q288_H!r}) AS BIGINT) AS cy
      FROM embeddings
    ),
    counts AS (SELECT cx, cy, count(*) AS c FROM cells GROUP BY 1, 2),
    dense AS (
      SELECT cx, cy, c, (cx + 1000) * 1000000 + (cy + 1000) AS node
      FROM counts WHERE c >= {_Q288_MINPTS}
    ),
    edges AS (
      SELECT a.node AS u, b.node AS v
      FROM dense a
      JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON TRUE
      JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON TRUE
      JOIN dense b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
      WHERE a.node <> b.node
    ),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT COALESCE(comp.component, dense.node) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(SUM(dense.c) AS BIGINT) AS n_points
    FROM dense LEFT JOIN comp ON dense.node = comp.node
    GROUP BY 1
    ORDER BY n_points DESC, cluster_id
    """


@q("q288_grid_density_clusters", _q288_oracle())
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import components as cc
    from dbt_incremental_ci_spark.operators.similarity import jl_project

    emb = t(spark, sf_dir, "embeddings")
    proj = jl_project(emb, "embedding", dim=64, out_dim=2)
    cells = proj.select(
        F.floor(
            F.round(F.col("proj")[0], 6) / F.lit(_Q288_H)
        ).cast("bigint").alias("cx"),
        F.floor(
            F.round(F.col("proj")[1], 6) / F.lit(_Q288_H)
        ).cast("bigint").alias("cy"),
    )
    dense = (
        cells.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _Q288_MINPTS)
        .withColumn(
            "node", (F.col("cx") + 1000) * 1000000 + (F.col("cy") + 1000)
        )
        .localCheckpoint(eager=False)  # edge sides + final agg read it
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probes = dense.select(
        F.col("node").alias("u"), "cx", "cy", offs.alias("o")
    ).select(
        "u",
        (F.col("cx") + F.col("o.dx")).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
    )
    nbr = dense.select(
        F.col("cx").alias("nx"),
        F.col("cy").alias("ny"),
        F.col("node").alias("v"),
    )
    edges = (
        probes.join(nbr, ["nx", "ny"])
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    comp = cc.connected_components_logn(edges, "u", "v")
    out = (
        dense.join(
            comp.withColumnRenamed("node", "node_id"),
            dense["node"] == F.col("node_id"),
            "left",
        )
        .withColumn(
            "cluster_id", F.coalesce(F.col("component"), F.col("node"))
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("c").cast("bigint").alias("n_points"),
        )
    )
    return out.orderBy(F.desc("n_points"), "cluster_id")


# =====================================================================
# Join-size estimation (q289): predicted output rows of the
# l_partkey self-join from per-key counts (Σ c² — exact, the number
# the optimizer needs before picking a similarity-join strategy) plus
# the hot key's share — q286's skew audit taken to pair space.
# =====================================================================
@q(
    "q289_join_size_estimate",
    """
    WITH kc AS (
      SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS est_join_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_rows
      FROM kc
    )
    SELECT n_keys, n_rows, est_join_rows, max_key_rows,
           CAST((max_key_rows * max_key_rows * 2000000 + est_join_rows)
                // (est_join_rows * 2) AS BIGINT) / 1000000.0
             AS top1_share
    FROM agg
    """,
)
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = kc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("est_join_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    share = (
        F.expr(
            "CAST((max_key_rows * max_key_rows * 2000000 + est_join_rows)"
            " DIV (est_join_rows * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "est_join_rows",
        "max_key_rows",
        share.alias("top1_share"),
    )


# =====================================================================
# TextRank keywords (q290): PageRank on the word-adjacency graph
# (Mihalcea & Tarau 2004) — the graph-centrality complement of RAKE
# (q235). Vocabulary ids come from one alphabetical rank over the
# vocab frame (vocabulary-bounded); the rank loop is the q112 integer
# fixed-point operator; the oracle recomputes the WHOLE iteration
# independently in pure Python and inlines it as VALUES.
# =====================================================================
def _q290_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    import os as _os

    from dbt_incremental_ci_spark.operators.pagerank import pagerank_replica

    dp = _os.path.join(sf_dir, "documents.parquet")
    if not _os.path.exists(dp):
        return None
    import duckdb as _duck

    con = _duck.connect()
    pairs = con.execute(
        f"""
        WITH tk AS (
          SELECT list_filter(string_split_regex(trim(lower(text)),
                                                '\\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{dp}')
        ),
        bi AS (
          SELECT DISTINCT t.toks[i] AS w1, t.toks[i+1] AS w2
          FROM tk t, (SELECT unnest(generate_series(1, 10000)) AS i)
          WHERE i < len(t.toks) AND t.toks[i] <> t.toks[i+1]
        )
        SELECT w1, w2 FROM bi
        """
    ).fetchall()
    vocab = sorted({w for p in pairs for w in p})
    wid = {w: i + 1 for i, w in enumerate(vocab)}
    edges = [(wid[a], wid[b]) for a, b in pairs] + [
        (wid[b], wid[a]) for a, b in pairs
    ]
    ranks = pagerank_replica(edges, iterations=6)
    con.close()
    rows = ",\n      ".join(
        f"('{w}', {ranks.get(wid[w], 0)})" for w in vocab
    )
    return f"""
    SELECT word, CAST(rank_fp AS BIGINT) AS rank_fp,
           rank_fp / 1000000000000.0 AS rank
    FROM (VALUES
      {rows}
    ) t(word, rank_fp)
    ORDER BY rank_fp DESC, word
    """


from dbt_incremental_ci_spark.workload_base import _LAZY_ORACLES  # noqa: E402

_LAZY_ORACLES["q290_textrank"] = _q290_oracle


@q("q290_textrank")
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.ngrams import (
        shifted_ngram_arrays,
    )
    from dbt_incremental_ci_spark.operators.pagerank import pagerank

    docs = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    bi = (
        docs.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2, shifted_ngram_arrays(toks, 2)
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bg")
        )
        .select(
            F.split(F.col("bg"), " ")[0].alias("w1"),
            F.split(F.col("bg"), " ")[1].alias("w2"),
        )
        .filter(F.col("w1") != F.col("w2"))
        .distinct()
        .localCheckpoint(eager=False)  # vocab + both edge dirs read it
    )
    vocab = (
        bi.select(F.col("w1").alias("word"))
        .unionAll(bi.select(F.col("w2").alias("word")))
        .distinct()
    )
    # vocabulary-bounded global window (31 words in this corpus) —
    # the documented bounded-frame total order class
    wv = Window.orderBy("word")
    vocab = vocab.withColumn(
        "wid", F.row_number().over(wv).cast("bigint")
    ).localCheckpoint(eager=False)
    v1 = vocab.select(F.col("word").alias("w1"), F.col("wid").alias("id1"))
    v2 = vocab.select(F.col("word").alias("w2"), F.col("wid").alias("id2"))
    directed = bi.join(v1, "w1").join(v2, "w2")
    edges = directed.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionAll(
        directed.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    ranks = pagerank(edges, iterations=6)
    return (
        vocab.join(ranks, vocab["wid"] == ranks["node"])
        .select(
            "word",
            F.col("rank_fp").cast("bigint").alias("rank_fp"),
            (F.col("rank_fp") / F.lit(1_000_000_000_000.0)).alias("rank"),
        )
        .orderBy(F.desc("rank_fp"), "word")
    )


# =====================================================================
# HLL accuracy curve (q291): the sketch-tuning readout — estimate vs
# exact distinct users at m ∈ {16, 64, 256} registers, one row per m.
# Each estimate is one register pass (mergeable); exact is the
# self-grading column hll_cardinality already carries.
# =====================================================================
from dbt_incremental_ci_spark.operators.hll import (  # noqa: E402
    hll_cardinality,
    hll_cardinality_sql,
)


def _q291_oracle() -> str:
    parts = [
        f"SELECT * FROM ({hll_cardinality_sql('FROM events', 'user_id', m=m, salt='acc')})"
        for m in (16, 64, 256)
    ]
    inner = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({inner}) ORDER BY m"


@q("q291_hll_accuracy_curve", _q291_oracle())
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    outs = [
        hll_cardinality(ev, "user_id", m=m, salt="acc")
        for m in (16, 64, 256)
    ]
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.orderBy("m")


# =====================================================================
# LSH parameter planner (q292): the analytic S-curve — candidate
# probability 1−(1−s^r)^b for every (bands, rows) split of a 64-perm
# MinHash signature × similarity grid, plus the ~(1/b)^(1/r)
# threshold. Pure expression spine (no corpus): r and b are powers of
# two, so s^r, (1−x)^b and the root all evaluate by REPEATED
# SQUARING / sqrt — every op IEEE-pinned, no pow()/exp() divergence.
# =====================================================================
def _sq_chain_sql(base: str, log2n: int) -> str:
    e = base
    for _ in range(log2n):
        e = f"(({e}) * ({e}))"
    return e


def _sqrt_chain_sql(base: str, log2n: int) -> str:
    e = base
    for _ in range(log2n):
        e = f"sqrt({e})"
    return e


def _q292_oracle() -> str:
    import math

    combos = [(64, 1), (32, 2), (16, 4), (8, 8), (4, 16)]
    rows = []
    for b, r in combos:
        lr = int(math.log2(r))
        lb = int(math.log2(b))
        sr = _sq_chain_sql("s", lr)
        p = f"1.0 - {_sq_chain_sql(f'(1.0 - {sr})', lb)}"
        thr = _sqrt_chain_sql(f"(1.0 / {b})", lr)
        rows.append(
            f"""
    SELECT {b} AS bands, {r} AS rows_per_band, s AS similarity,
           ROUND({p}, 6) AS p_candidate,
           ROUND({thr}, 6) AS threshold_est
    FROM (SELECT unnest([0.1, 0.3, 0.5, 0.7, 0.9]::DOUBLE[]) AS s)"""
        )
    inner = "\nUNION ALL".join(rows)
    return f"""
    SELECT CAST(bands AS INT) AS bands,
           CAST(rows_per_band AS INT) AS rows_per_band,
           similarity, p_candidate, threshold_est
    FROM ({inner})
    ORDER BY bands DESC, similarity
    """


@q("q292_lsh_parameter_planner", _q292_oracle())
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    combos = [(64, 1), (32, 2), (16, 4), (8, 8), (4, 16)]
    sims = [0.1, 0.3, 0.5, 0.7, 0.9]
    outs = []
    for b, r in combos:
        lr = int(math.log2(r))
        lb = int(math.log2(b))
        spine = spark.createDataFrame([(float(s),) for s in sims], "s double")
        sr = F.col("s")
        for _ in range(lr):
            sr = sr * sr
        one_minus = F.lit(1.0) - sr
        p = one_minus
        for _ in range(lb):
            p = p * p
        thr = F.lit(1.0 / b)
        for _ in range(lr):
            thr = F.sqrt(thr)
        outs.append(
            spine.select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.col("s").alias("similarity"),
                F.round(F.lit(1.0) - p, 6).alias("p_candidate"),
                F.round(thr, 6).alias("threshold_est"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.orderBy(F.desc("bands"), "similarity")


# =====================================================================
# Coarsened exact matching ATT (q293): Iacus-King-Porro CEM — strata
# on coarsened covariates (order year × customer nation), keep strata
# with both arms, treated-weighted mean outcome contrast. Everything
# reduces to a strata-sized frame of exact decimal sums; the one
# division per stratum casts (never ROUNDs) into DECIMAL before the
# cross-stratum fold (q265 rule).
# =====================================================================
@q(
    "q293_cem_att",
    """
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             c.c_nationkey AS nat,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS tr,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    strata AS (
      SELECT yr, nat,
             SUM(tr) AS n1, COUNT(*) - SUM(tr) AS n0,
             SUM(CASE WHEN tr = 1 THEN y
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS t1,
             SUM(CASE WHEN tr = 0 THEN y
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS t0
      FROM base GROUP BY 1, 2
    ),
    matched AS (SELECT * FROM strata WHERE n1 > 0 AND n0 > 0),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(SUM(n1) AS BIGINT) AS n_treated,
             CAST(SUM(n0) AS BIGINT) AS n_control,
             CAST(SUM(t1) AS DOUBLE) AS t1sum,
             CAST(SUM(CAST(n1 * (CAST(t0 AS DOUBLE) / n0)
                           AS DECIMAL(38,6))) AS DOUBLE) AS ctrl_w
      FROM matched
    ),
    tot AS (SELECT CAST(SUM(tr) AS BIGINT) AS n_treated_all FROM base)
    SELECT agg.n_strata, agg.n_treated, agg.n_control,
           ROUND((agg.t1sum - agg.ctrl_w) / agg.n_treated, 6) AS att,
           CAST((agg.n_treated * 2000000 + tot.n_treated_all)
                // (tot.n_treated_all * 2) AS BIGINT) / 1000000.0
             AS treated_match_rate
    FROM agg, tot
    """,
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cst = t(spark, sf_dir, "customer")
    zero = F.lit(0).cast("decimal(18,2)")
    base = (
        o.join(cst, o["o_custkey"] == cst["c_custkey"])
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.col("c_nationkey").alias("nat"),
            (F.col("o_orderstatus") == "F").cast("int").alias("tr"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
        .localCheckpoint(eager=False)  # strata + total both read it
    )
    strata = base.groupBy("yr", "nat").agg(
        F.sum("tr").alias("n1"),
        (F.count(F.lit(1)) - F.sum("tr")).alias("n0"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(zero)).alias(
            "t1"
        ),
        F.sum(F.when(F.col("tr") == 0, F.col("y")).otherwise(zero)).alias(
            "t0"
        ),
    )
    matched = strata.filter((F.col("n1") > 0) & (F.col("n0") > 0))
    ctrl_term = (
        F.col("n1") * (F.col("t0").cast("double") / F.col("n0"))
    ).cast("decimal(38,6)")
    agg = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("n1").cast("bigint").alias("n_treated"),
        F.sum("n0").cast("bigint").alias("n_control"),
        F.sum("t1").cast("double").alias("t1sum"),
        F.sum(ctrl_term).cast("double").alias("ctrl_w"),
    )
    tot = base.agg(F.sum("tr").cast("bigint").alias("n_treated_all"))
    rate = (
        F.expr(
            "CAST((n_treated * 2000000 + n_treated_all) "
            "DIV (n_treated_all * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "n_strata",
            "n_treated",
            "n_control",
            F.round(
                (F.col("t1sum") - F.col("ctrl_w")) / F.col("n_treated"), 6
            ).alias("att"),
            rate.alias("treated_match_rate"),
        )
    )


# =====================================================================
# Day-of-week × hour activity profile (q294): the seasonal traffic
# matrix capacity planning reads. DOW from epoch days in PURE integer
# arithmetic ((days+4) % 7, 1970-01-01 = Thursday) — no calendar
# function divergence; shares round in integer space.
# =====================================================================
@q(
    "q294_dow_hour_profile",
    """
    WITH ticks AS (
      SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
             (epoch_ns(ts) // 3600000000000) % 24 AS hour
      FROM events
    ),
    counts AS (
      SELECT dow, hour, CAST(count(*) AS BIGINT) AS n
      FROM ticks GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT CAST(dow AS INT) AS dow, CAST(hour AS INT) AS hour, n,
           CAST((n * 2000000 + tot.total) // (tot.total * 2) AS BIGINT)
             / 1000000.0 AS share
    FROM counts, tot
    ORDER BY dow, hour
    """,
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    counts = ev.select(
        ((F.expr("ts DIV 86400000000000") + 4) % 7).alias("dow"),
        (F.expr("ts DIV 3600000000000") % 24).alias("hour"),
    ).groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    share = (
        F.expr(
            "CAST((n * 2000000 + total) DIV (total * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("hour").cast("int").alias("hour"),
            "n",
            share.alias("share"),
        )
        .orderBy("dow", "hour")
    )


# =====================================================================
# Dedup pair explanation report (q295): for the near-dup candidate
# pairs, the human-reviewable WHY — exact shingle overlap, asymmetric
# diffs, containment, and length delta per pair. Array ops on the two
# joined documents; volume = candidate pairs (already banded/bounded
# upstream), never all-pairs.
#
# Oracle convention (inherited from q32, ADVICE r06 item 4): the
# engine's candidates come from LSH-banded minhash_dedup_pairs, whose
# recall is PROBABILISTIC, while the oracle enumerates pairs by
# exhaustive exact-Jaccard scan — feasible only because the oracle
# runs at sf0.01. On the fixed seeded test data the banding recalls
# every >=0.7 pair (verified green every round since q32/r02), so the
# two candidate sets coincide; on NEW data a true pair missed by
# banding would flag here by design — that is the banding-recall QA
# signal (q221 measures the same recall explicitly), not a bug in
# this report.
# =====================================================================
@q(
    "q295_dedup_pair_report",
    """
    WITH sh AS (
      SELECT doc_id, length(text) AS n_chr,
             CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb,
             a.n_chr AS ca, b.n_chr AS cb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= 0.7
    )
    SELECT id_a, id_b,
           CAST(inter AS BIGINT) AS n_common,
           CAST(na - inter AS BIGINT) AS only_a,
           CAST(nb - inter AS BIGINT) AS only_b,
           CAST((inter * 2000000 + (na + nb - inter))
                // ((na + nb - inter) * 2) AS BIGINT) / 1000000.0
             AS jaccard,
           CAST((inter * 2000000 + LEAST(na, nb))
                // (LEAST(na, nb) * 2) AS BIGINT) / 1000000.0
             AS containment,
           CAST(ABS(ca - cb) AS BIGINT) AS char_delta
    FROM pairs
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 50
    """,
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    # the pair frame is tiny (banded candidates that survive exact
    # verification) and read THREE times below (two report joins +
    # the member-id semi-join) — checkpoint it once
    pairs = (
        dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    # Round-11 (guide §1.2 "don't compute things you throw away",
    # measured at sf0.1: shingling the full corpus cost 3.3 s of the
    # query's 5 s while only ~10% of docs appear in any pair):
    # restrict the exact-shingle report input to pair MEMBERS with a
    # semi-join before the O(len·k) shingle/array_distinct work, so
    # the expensive arrays are built only for rows the report uses.
    members = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    sh = docs.join(members, "doc_id", "semi").select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chr"),
        dedup.char_shingles("text", k=5, distinct=True).alias("s"),
    )
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_chr").alias("ca"),
        F.col("s").alias("sa"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_chr").alias("cb"),
        F.col("s").alias("sb"),
    )
    # materialize the intersection SIZE once per pair (the r10 shape
    # re-evaluated array_intersect in five expressions; one projection
    # makes the reuse explicit instead of relying on codegen CSE)
    joined = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "ca",
            "cb",
            F.size("sa").cast("bigint").alias("na"),
            F.size("sb").cast("bigint").alias("nb"),
            F.size(F.array_intersect("sa", "sb"))
            .cast("bigint")
            .alias("inter"),
        )
    )
    out = joined.select(
        "id_a",
        "id_b",
        F.col("inter").alias("n_common"),
        (F.col("na") - F.col("inter")).alias("only_a"),
        (F.col("nb") - F.col("inter")).alias("only_b"),
        (
            F.expr(
                "CAST((inter * 2000000 + (na + nb - inter)) "
                "DIV ((na + nb - inter) * 2) AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        ).alias("jaccard"),
        (
            F.expr(
                "CAST((inter * 2000000 + LEAST(na, nb)) "
                "DIV (LEAST(na, nb) * 2) AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        ).alias("containment"),
        F.abs(F.col("ca") - F.col("cb")).cast("bigint").alias("char_delta"),
    )
    return out.orderBy(F.desc("jaccard"), "id_a", "id_b").limit(50)


# =====================================================================
# Group-conditional conformal coverage (q296): the fairness audit on
# top of q188 — calibrate per-group thresholds on the calibration
# split, then measure EMPIRICAL coverage per group on the held-out
# split (expected ≥ 1−α up to finite-sample noise). Threshold frame
# is group-sized; coverage is one keyed join + exact integer rates.
# =====================================================================
from dbt_incremental_ci_spark.operators.conformal import (  # noqa: E402
    conformal_thresholds,
    conformal_thresholds_sql,
)

_Q296_CAL = """(
  SELECT l_returnflag, l_discount,
         l_orderkey * 8 + l_linenumber AS __id
  FROM lineitem WHERE l_orderkey < 1000
)"""


@q(
    "q296_group_conformal_coverage",
    f"""
    WITH thr AS ({conformal_thresholds_sql(_Q296_CAL, "l_returnflag",
                                           "l_discount", "__id",
                                           alpha=0.1)}),
    test AS (
      SELECT l_returnflag AS grp, l_discount AS s
      FROM lineitem WHERE l_orderkey >= 1000
    ),
    cov AS (
      SELECT t.grp,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.s <= thr.threshold THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_covered
      FROM test t JOIN thr ON t.grp = thr.grp
      WHERE thr.covered
      GROUP BY t.grp
    )
    SELECT grp, n_test, n_covered,
           CAST((n_covered * 2000000 + n_test) // (n_test * 2) AS BIGINT)
             / 1000000.0 AS coverage,
           CAST((n_covered * 2000000 + n_test) // (n_test * 2) AS BIGINT)
             / 1000000.0 >= 0.9 AS meets_alpha
    FROM cov
    ORDER BY grp
    """,
)
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cal = li.filter(F.col("l_orderkey") < 1000).withColumn(
        "__id", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    thr = conformal_thresholds(
        cal, "l_returnflag", "l_discount", "__id", alpha=0.1
    ).filter(F.col("covered"))
    test = li.filter(F.col("l_orderkey") >= 1000).select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_discount").alias("s"),
    )
    cov = (
        test.join(F.broadcast(thr), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (F.col("s") <= F.col("threshold")).cast("int")
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    coverage = (
        F.expr(
            "CAST((n_covered * 2000000 + n_test) DIV (n_test * 2) "
            "AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return cov.select(
        "grp",
        "n_test",
        "n_covered",
        coverage.alias("coverage"),
        (coverage >= 0.9).alias("meets_alpha"),
    ).orderBy("grp")


# =====================================================================
# Rich-club coefficient (q297): φ(k) = density among nodes of degree
# > k on the co-order part graph (Zhou & Mondragón 2004) — do hubs
# preferentially interconnect. Degree frame + a constant k-spine of
# semi-joined edge counts; φ rounds in integer space.
# =====================================================================
@q(
    "q297_rich_club",
    f"""
    WITH edges AS (SELECT id_a AS u, id_b AS v FROM {_COORDER_EDGES}),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    ks AS (SELECT unnest([1, 2, 4, 8]) AS k),
    rich AS (
      SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k
    ),
    nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich
           GROUP BY k),
    ek AS (
      SELECT r1.k, CAST(count(*) AS BIGINT) AS e_rich
      FROM edges e
      JOIN rich r1 ON r1.node = e.u
      JOIN rich r2 ON r2.k = r1.k AND r2.node = e.v
      GROUP BY r1.k
    )
    SELECT nk.k, nk.n_rich, COALESCE(ek.e_rich, 0) AS e_rich,
           CASE WHEN nk.n_rich >= 2 THEN
             CAST((COALESCE(ek.e_rich, 0) * 2 * 2000000
                   + nk.n_rich * (nk.n_rich - 1))
                  // (nk.n_rich * (nk.n_rich - 1) * 2) AS BIGINT)
               / 1000000.0
           END AS phi
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    ORDER BY nk.k
    """,
)
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _coorder_edges(spark, sf_dir).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).localCheckpoint(eager=False)  # degrees + both semi joins read it
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ks = spark.createDataFrame([(1,), (2,), (4,), (8,)], "k int")
    rich = (
        F.broadcast(ks)
        .join(deg, deg["d"] > F.col("k"))
        .select("k", "node")
        .localCheckpoint(eager=False)
    )
    nk = rich.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n_rich"))
    r1 = rich.select(F.col("k"), F.col("node").alias("u"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("node").alias("v"))
    ek = (
        edges.join(r1, "u")
        .join(r2, (F.col("k2") == F.col("k")) & (r2["v"] == edges["v"]))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_rich"))
    )
    joined = nk.join(ek, "k", "left").withColumn(
        "e_rich", F.coalesce(F.col("e_rich"), F.lit(0)).cast("bigint")
    )
    phi = F.when(
        F.col("n_rich") >= 2,
        F.expr(
            "CAST((e_rich * 2 * 2000000 + n_rich * (n_rich - 1)) "
            "DIV (n_rich * (n_rich - 1) * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0,
    )
    return joined.select("k", "n_rich", "e_rich", phi.alias("phi")).orderBy(
        "k"
    )


# =====================================================================
# Inter-event burstiness (q298): Goh-Barabási B = (σ−μ)/(σ+μ) of each
# user's inter-event gaps — bursty (B→1) vs Poisson (B→0) vs regular
# (B→−1) behavior. Per-user lag gaps (keyed frames), exact DECIMAL
# moment folds; the corpus rolls up to one row.
# =====================================================================
@q(
    "q298_interevent_burstiness",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_ns(ts) - lag(epoch_ns(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ),
    per_user AS (
      SELECT user_id, count(*) AS n,
             SUM(CAST(g AS HUGEINT)) AS s,
             SUM(CAST(g AS HUGEINT) * g) AS q
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
      HAVING count(*) >= 5
    ),
    b AS (
      SELECT user_id,
             ROUND(
               (sqrt(GREATEST((CAST(q AS DOUBLE)
                               - CAST(s AS DOUBLE) * s / n) / (n - 1), 0))
                - CAST(s AS DOUBLE) / n)
               / NULLIF(sqrt(GREATEST((CAST(q AS DOUBLE)
                               - CAST(s AS DOUBLE) * s / n) / (n - 1), 0))
                        + CAST(s AS DOUBLE) / n, 0), 6) AS bu
      FROM per_user
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(bu AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS mean_burstiness,
           CAST((SUM(CASE WHEN bu > 0.2 THEN 1 ELSE 0 END) * 2000000
                 + count(*)) // (count(*) * 2) AS BIGINT) / 1000000.0
             AS pct_bursty
    FROM b
    """,
)
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", (F.col("ts") - F.lag("ts").over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    d380 = "decimal(38,0)"
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("g").cast(d380)).alias("s"),
            F.sum(F.col("g").cast(d380) * F.col("g").cast(d380)).alias("q"),
        )
        .filter(F.col("n") >= 5)
    )
    mu = F.col("s").cast("double") / F.col("n")
    var = F.greatest(
        (F.col("q").cast("double") - F.col("s").cast("double") * mu)
        / (F.col("n") - 1),
        F.lit(0.0),
    )
    sd = F.sqrt(var)
    bu = F.round((sd - mu) / F.nullif(sd + mu, F.lit(0.0)), 6)
    b = per_user.select(bu.alias("bu"))
    pct = (
        F.expr(
            "CAST((npos * 2000000 + n_users) DIV (n_users * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        b.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.col("bu").cast("decimal(18,6)")).alias("__bs"),
            F.sum((F.col("bu") > 0.2).cast("int")).alias("npos"),
        )
        .select(
            "n_users",
            F.round(
                F.col("__bs").cast("double") / F.col("n_users"), 6
            ).alias("mean_burstiness"),
            pct.alias("pct_bursty"),
        )
    )


# =====================================================================
# Time-weighted average value / TWAP (q299): per event type, the mean
# of `value` weighted by each observation's holding duration (lead
# gap) — the right average for irregularly-sampled series. Duration ×
# cent products fold in DECIMAL(38,0); the last observation per key
# carries no duration (standard TWAP convention).
# =====================================================================
@q(
    "q299_twap",
    """
    WITH spans AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             lead(epoch_ns(ts)) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id)
               - epoch_ns(ts) AS dur
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_spans,
             SUM(CAST(dur AS HUGEINT)) AS total_dur,
             SUM(CAST(cents AS HUGEINT) * dur) AS wsum
      FROM spans WHERE dur IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_spans,
           ROUND(CAST(wsum AS DOUBLE) / CAST(total_dur AS DOUBLE)
                 / 100.0, 6) AS twap,
           CAST(total_dur // 1000000000 AS BIGINT) AS window_sec
    FROM agg ORDER BY event_type
    """,
)
def q299(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    spans = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (F.lead("ts").over(w) - F.col("ts")).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    d380 = "decimal(38,0)"
    agg = spans.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("dur").cast(d380)).alias("total_dur"),
        F.sum((F.col("cents") * F.col("dur")).cast(d380)).alias("wsum"),
    )
    return agg.select(
        "event_type",
        "n_spans",
        F.round(
            F.col("wsum").cast("double")
            / F.col("total_dur").cast("double")
            / 100.0,
            6,
        ).alias("twap"),
        F.expr("CAST(total_dur DIV 1000000000 AS BIGINT)").alias(
            "window_sec"
        ),
    ).orderBy("event_type")


# =====================================================================
# Token-budget waterfilling (q300): the mix planner — find the
# per-source cap λ such that Σ min(tokens_i, λ) exactly equals the
# training budget (here: half the corpus), fill small sources fully
# and cap the rest at λ, distributing the integer remainder
# deterministically. The closed-form level selection runs entirely on
# the SOURCE-cardinality frame (one window cumsum + exact integer
# cross-multiplications — no iteration, no floats), i.e. the corpus
# is touched once for token counts no matter how many sources.
# =====================================================================
@q(
    "q300_waterfill_mix",
    """
    WITH src AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)),
                                                         '\\s+'),
                          x -> x <> ''))) AS BIGINT) AS c
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(c) AS total, SUM(c) // 2 AS b,
                   count(*) AS k FROM src),
    ranked AS (
      SELECT source, c,
             row_number() OVER (ORDER BY c, source) AS rn,
             SUM(c) OVER (ORDER BY c, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
      FROM src
    ),
    feasible AS (
      -- rn can be filled fully iff level >= c_rn:
      -- csum_{rn-1} + c_rn * (k - rn + 1) <= B
      SELECT ranked.*, tot.b, tot.k,
             (csum - c) + c * (k - rn + 1) <= tot.b AS full_ok
      FROM ranked, tot
    ),
    jstar AS (
      SELECT COALESCE(MAX(CASE WHEN full_ok THEN rn END), 0) AS j
      FROM feasible
    ),
    lvl AS (
      SELECT j,
             CASE WHEN j < k THEN
               (b - COALESCE((SELECT csum FROM ranked WHERE rn = j), 0))
                 // (k - j) END AS lam,
             CASE WHEN j < k THEN
               (b - COALESCE((SELECT csum FROM ranked WHERE rn = j), 0))
                 % (k - j) END AS rem
      FROM jstar, tot
    )
    SELECT f.source, f.c AS available,
           CAST(CASE WHEN f.rn <= lvl.j THEN f.c
                ELSE lvl.lam + CASE WHEN f.rn - lvl.j <= lvl.rem
                                    THEN 1 ELSE 0 END
           END AS BIGINT) AS allocated,
           f.rn > lvl.j AS capped
    FROM feasible f, lvl
    ORDER BY f.source
    """,
)
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda x: x != "",
        )
    )
    src = docs.groupBy("source").agg(
        F.sum(toks).cast("bigint").alias("c")
    )
    tot = src.agg(
        F.sum("c").alias("total"),
        F.expr("SUM(c) DIV 2").alias("b"),
        F.count(F.lit(1)).alias("k"),
    )
    wr = Window.orderBy("c", "source")  # source-cardinality frame
    ranked = src.select(
        "source",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.sum("c")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("csum"),
    ).crossJoin(F.broadcast(tot)).localCheckpoint(eager=False)
    feasible = ranked.withColumn(
        "full_ok",
        (F.col("csum") - F.col("c"))
        + F.col("c") * (F.col("k") - F.col("rn") + 1)
        <= F.col("b"),
    )
    jstar = feasible.agg(
        F.coalesce(
            F.max(F.when(F.col("full_ok"), F.col("rn"))), F.lit(0)
        ).alias("j")
    )
    csum_j = (
        feasible.join(F.broadcast(jstar), F.col("rn") == F.col("j"))
        .select(F.col("csum").alias("csj"))
    )
    lvl = (
        jstar.crossJoin(F.broadcast(tot))
        .crossJoin(
            F.broadcast(
                csum_j.agg(
                    F.coalesce(F.max("csj"), F.lit(0)).alias("csj")
                )
            )
        )
        .select(
            "j",
            F.when(
                F.col("j") < F.col("k"),
                F.expr("(b - csj) DIV (k - j)"),
            ).alias("lam"),
            F.when(
                F.col("j") < F.col("k"), F.expr("(b - csj) % (k - j)")
            ).alias("rem"),
        )
    )
    out = feasible.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("c").alias("available"),
        F.when(F.col("rn") <= F.col("j"), F.col("c"))
        .otherwise(
            F.col("lam")
            + F.when(
                F.col("rn") - F.col("j") <= F.col("rem"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("allocated"),
        (F.col("rn") > F.col("j")).alias("capped"),
    )
    return out.orderBy("source")


# =====================================================================
# Watermark lateness audit (q301): the out-of-orderness profile that
# PICKS the streaming watermark — per event type, how far events
# arrive behind the running max event time (ingest order ≈ event_id),
# as exceedance shares at 1m / 10m / 1h plus the worst case. Keyed
# running-max windows (never a global order); shares in integer space.
# =====================================================================
@q(
    "q301_watermark_lateness",
    """
    WITH lat AS (
      SELECT event_type,
             MAX(epoch_ns(ts)) OVER (PARTITION BY event_type
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - epoch_ns(ts) AS l
      FROM events
    ),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l > 60000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_1m,
             CAST(SUM(CASE WHEN l > 600000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_10m,
             CAST(SUM(CASE WHEN l > 3600000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_1h,
             CAST(MAX(l) // 1000000000 AS BIGINT) AS max_late_sec
      FROM lat GROUP BY event_type
    )
    SELECT event_type, n,
           CAST((n_1m * 2000000 + n) // (n * 2) AS BIGINT) / 1000000.0
             AS pct_late_1m,
           CAST((n_10m * 2000000 + n) // (n * 2) AS BIGINT) / 1000000.0
             AS pct_late_10m,
           CAST((n_1h * 2000000 + n) // (n * 2) AS BIGINT) / 1000000.0
             AS pct_late_1h,
           max_late_sec
    FROM agg ORDER BY event_type
    """,
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lat = ev.select(
        "event_type", (F.max("ts").over(w) - F.col("ts")).alias("l")
    )
    agg = lat.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("l") > 60_000_000_000).cast("int"))
        .cast("bigint")
        .alias("n_1m"),
        F.sum((F.col("l") > 600_000_000_000).cast("int"))
        .cast("bigint")
        .alias("n_10m"),
        F.sum((F.col("l") > 3_600_000_000_000).cast("int"))
        .cast("bigint")
        .alias("n_1h"),
        F.expr("CAST(MAX(l) DIV 1000000000 AS BIGINT)").alias(
            "max_late_sec"
        ),
    )

    def pct(col: str) -> F.Column:
        return (
            F.expr(
                f"CAST(({col} * 2000000 + n) DIV (n * 2) AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        )

    return agg.select(
        "event_type",
        "n",
        pct("n_1m").alias("pct_late_1m"),
        pct("n_10m").alias("pct_late_10m"),
        pct("n_1h").alias("pct_late_1h"),
        "max_late_sec",
    ).orderBy("event_type")


# =====================================================================
# Survey design effect (q302): DEFF = Σ(n_h/n)s_h² / s² — how much
# variance proportionate nation-stratified sampling of order values
# saves vs SRS (Kish 1965); the eval twin of Neyman allocation
# (q164). Per-stratum moment folds in exact DECIMAL; stratum terms
# CAST into DECIMAL before the cross-stratum sum (q265 rule).
# =====================================================================
@q(
    "q302_design_effect",
    """
    WITH base AS (
      SELECT c.c_nationkey AS h,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per_h AS (
      SELECT h, count(*) AS nh, SUM(y) AS th,
             SUM(CAST(y * y AS DECIMAL(37,4))) AS qh
      FROM base GROUP BY h
    ),
    terms AS (
      SELECT nh, th, qh,
             CAST(nh * ((CAST(qh AS DOUBLE)
                         - CAST(th AS DOUBLE) * th / nh) / (nh - 1))
                  AS DECIMAL(38,6)) AS wterm
      FROM per_h WHERE nh >= 2
    ),
    tot AS (
      SELECT CAST(SUM(nh) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_strata,
             CAST(SUM(th) AS DOUBLE) AS t,
             CAST(SUM(CAST(qh AS DECIMAL(38,4))) AS DOUBLE) AS q,
             CAST(SUM(wterm) AS DOUBLE) AS w
      FROM terms
    )
    SELECT n, n_strata,
           ROUND((q - t * t / n) / (n - 1), 4) AS overall_var,
           ROUND(w / n, 4) AS within_var,
           ROUND((w / n) / ((q - t * t / n) / (n - 1)), 6) AS deff
    FROM tot
    """,
)
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cst = t(spark, sf_dir, "customer")
    base = o.join(cst, o["o_custkey"] == cst["c_custkey"]).select(
        F.col("c_nationkey").alias("h"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    per_h = base.groupBy("h").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("y").alias("th"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(37,4)")).alias("qh"),
    ).filter(F.col("nh") >= 2)
    th_d = F.col("th").cast("double")
    var_h = (
        F.col("qh").cast("double") - th_d * th_d / F.col("nh")
    ) / (F.col("nh") - 1)
    wterm = (F.col("nh") * var_h).cast("decimal(38,6)")
    tot = per_h.agg(
        F.sum("nh").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("th").cast("double").alias("t"),
        F.sum(F.col("qh").cast("decimal(38,4)")).cast("double").alias("q"),
        F.sum(wterm).cast("double").alias("w"),
    )
    overall = (F.col("q") - F.col("t") * F.col("t") / F.col("n")) / (
        F.col("n") - 1
    )
    within = F.col("w") / F.col("n")
    return tot.select(
        "n",
        "n_strata",
        F.round(overall, 4).alias("overall_var"),
        F.round(within, 4).alias("within_var"),
        F.round(within / overall, 6).alias("deff"),
    )


# =====================================================================
# ABC / Pareto classification (q303): parts by cumulative revenue
# share into A (≤80%), B (≤95%), C — the inventory-curation workhorse.
# Ranking via the two-phase row_number + partition-parallel cumsum
# (never a global window); class boundaries compare IN INTEGER SPACE
# (5·cum ≤ 4·total etc.), so no share rounding can flip a class.
# =====================================================================
@q(
    "q303_abc_classification",
    """
    WITH pr AS (
      SELECT l_partkey AS part,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT part, cents,
             SUM(cents) OVER (ORDER BY cents DESC, part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM pr
    ),
    tot AS (SELECT SUM(cents) AS total FROM pr),
    classed AS (
      SELECT part, cents,
             CASE WHEN 5 * cum <= 4 * tot.total THEN 'A'
                  WHEN 20 * cum <= 19 * tot.total THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked, tot
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST((CAST(SUM(cents) AS HUGEINT) * 2000000 + tot.total)
                // (tot.total * 2) AS BIGINT) / 1000000.0
             AS revenue_share
    FROM classed, tot
    GROUP BY abc, tot.total
    ORDER BY abc
    """,
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.packing import global_cumsum
    from dbt_incremental_ci_spark.operators.ranks import (
        two_phase_row_number,
    )

    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("part")).agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    ranked = two_phase_row_number(
        pr, [F.col("cents").desc(), F.col("part").asc()], out_col="__rn"
    )
    cum = global_cumsum(ranked, "__rn", "cents", out_col="__cum")
    tot = pr.agg(F.sum("cents").alias("total"))
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "part",
        "cents",
        "total",
        F.when(5 * F.col("__cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("__cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    share = (
        # DECIMAL widening is load-bearing: class revenue cents x 2e6
        # overflows BIGINT at the 10x replica (caught by the sf1 gate)
        F.expr(
            "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 2000000 "
            "+ total) DIV (total * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        classed.groupBy("abc", "total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "abc", "n_parts", "revenue_cents", share.alias("revenue_share")
        )
        .orderBy("abc")
    )


# =====================================================================
# Cohort LTV curve (q304): cumulative revenue per first-order-month
# cohort by age-in-months — the money twin of q183's retention
# counts. Cohort-keyed month frames (calendar-bounded windows); LTV
# per customer rounds half-up in integer space with DECIMAL widening.
# =====================================================================
@q(
    "q304_cohort_ltv",
    """
    WITH orders_m AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    cohorts AS (
      SELECT o_custkey, min(m) AS cohort_m FROM orders_m GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_m, CAST(count(*) AS BIGINT) AS n_customers
      FROM cohorts GROUP BY 1
    ),
    rev AS (
      SELECT c.cohort_m, o.m - c.cohort_m AS age,
             SUM(o.cents) AS cents
      FROM orders_m o JOIN cohorts c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_m, age,
             SUM(cents) OVER (PARTITION BY cohort_m ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents
      FROM rev
    )
    SELECT cum.cohort_m AS cohort_month, CAST(cum.age AS INT) AS age_months,
           sizes.n_customers,
           CAST(cum.cum_cents AS BIGINT) AS cum_revenue_cents,
           CAST((CAST(cum.cum_cents AS HUGEINT) * 2000000
                 + sizes.n_customers * 100)
                // (sizes.n_customers * 100 * 2) AS BIGINT) / 1000000.0
             AS ltv_per_customer
    FROM cum JOIN sizes ON cum.cohort_m = sizes.cohort_m
    WHERE cum.age <= 12
    ORDER BY cohort_month, age_months
    """,
)
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "m"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    ).localCheckpoint(eager=False)  # cohorts + revenue both read it
    cohorts = om.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = cohorts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    rev = (
        om.join(cohorts, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"))
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w)).filter(
        F.col("age") <= 12
    )
    ltv = (
        F.expr(
            "CAST((CAST(cum_cents AS DECIMAL(38,0)) * 2000000 "
            "+ n_customers * 100) DIV (n_customers * 100 * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        cum.join(sizes, "cohort_m")
        .select(
            F.col("cohort_m").alias("cohort_month"),
            F.col("age").cast("int").alias("age_months"),
            "n_customers",
            F.col("cum_cents").cast("bigint").alias("cum_revenue_cents"),
            ltv.alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


# =====================================================================
# Ship-lag SLA percentiles (q305): order-to-ship latency p50/p90/p99
# per priority class plus the 30-day SLA attainment — fulfillment-ops
# reporting on the scalable keyed exact-quantile path (lag days are
# grid-bounded integers, the by-key cumsum's best case).
# =====================================================================
from dbt_incremental_ci_spark.operators.ranks import (  # noqa: E402
    exact_quantiles_by_key,
)

_Q305_ROWS = """(
  SELECT o.o_orderpriority AS prio,
         epoch_ns(l.l_shipdate) // 86400000000000
           - epoch_ns(o.o_orderdate) // 86400000000000 AS lag_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)"""


@q(
    "q305_ship_lag_sla",
    f"""
    WITH rows_in AS {_Q305_ROWS},
    qs AS (
      SELECT prio,
             ROUND(quantile_cont(CAST(lag_days AS DOUBLE), 0.5), 3)
               AS p50,
             ROUND(quantile_cont(CAST(lag_days AS DOUBLE), 0.9), 3)
               AS p90,
             ROUND(quantile_cont(CAST(lag_days AS DOUBLE), 0.99), 3)
               AS p99
      FROM rows_in GROUP BY prio
    ),
    sla AS (
      SELECT prio, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ok
      FROM rows_in GROUP BY prio
    )
    SELECT qs.prio, sla.n, qs.p50, qs.p90, qs.p99,
           CAST((sla.n_ok * 2000000 + sla.n) // (sla.n * 2) AS BIGINT)
             / 1000000.0 AS sla_30d
    FROM qs JOIN sla ON qs.prio = sla.prio
    ORDER BY qs.prio
    """,
)
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    rows = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("prio"),
        (
            F.expr(
                "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) * 1000 "
                "DIV 86400000000000 AS BIGINT)"
            )
            - F.expr(
                "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 "
                "DIV 86400000000000 AS BIGINT)"
            )
        ).alias("lag_days"),
    ).localCheckpoint(eager=False)  # quantiles + SLA both read it
    eq = exact_quantiles_by_key(rows, ["prio"], "lag_days", [0.5, 0.9, 0.99])

    def at(p: float, name: str) -> F.Column:
        return F.round(
            F.max(F.when(F.col("q") == p, F.col("quantile"))), 3
        ).alias(name)

    qs = eq.groupBy("prio").agg(
        at(0.5, "p50"), at(0.9, "p90"), at(0.99, "p99")
    )
    sla = rows.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("lag_days") <= 30).cast("int"))
        .cast("bigint")
        .alias("n_ok"),
    )
    rate = (
        F.expr(
            "CAST((n_ok * 2000000 + n) DIV (n * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return (
        qs.join(sla, "prio")
        .select("prio", "n", "p50", "p90", "p99", rate.alias("sla_30d"))
        .orderBy("prio")
    )


# =====================================================================
# Per-key metric trend mining (q306): OLS slope / intercept / R² of
# each event type's daily count series — the "which metrics are
# drifting" sweep over every series at once. Exact integer sums per
# key (x = day index, y = count), one double expression per key — the
# assortativity DECIMAL pattern applied per key.
# =====================================================================
@q(
    "q306_metric_trends",
    """
    WITH daily AS (
      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(day) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(day AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(day AS HUGEINT) * day) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             AS intercept,
           CASE WHEN (n * syy - sy * sy) > 0 THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS r2
    FROM agg ORDER BY event_type
    """,
)
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    d380 = "decimal(38,0)"

    def dd(c: F.Column) -> F.Column:
        return c.cast(d380)

    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dd(F.col("day"))).alias("sx"),
        F.sum(dd(F.col("y"))).alias("sy"),
        F.sum(dd(F.col("day")) * dd(F.col("y"))).alias("sxy"),
        F.sum(dd(F.col("day")) * dd(F.col("day"))).alias("sxx"),
        F.sum(dd(F.col("y")) * dd(F.col("y"))).alias("syy"),
    )
    nd = dd(F.col("n"))
    cov = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cov / vx
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.when(vy > 0, F.round(cov * cov / (vx * vy), 6)).alias("r2"),
    ).orderBy("event_type")


# =====================================================================
# Dedup-weighted token budget by source (q307): tokens before/after
# keep-first exact dedup PER SOURCE — which slices are template-heavy
# (q261's corpus report sliced to where the curation decision is
# made). One fingerprint aggregate + one source rollup.
# =====================================================================
@q(
    "q307_dedup_tokens_by_source",
    """
    WITH d AS (
      SELECT doc_id, source, md5(text) AS fp,
             len(list_filter(string_split_regex(trim(lower(text)),
                                                '\\s+'),
                 x -> x <> '')) AS n_tok
      FROM documents
    ),
    keep AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp),
    tagged AS (
      SELECT d.source, d.n_tok, d.doc_id = k.keep_id AS kept
      FROM d JOIN keep k ON d.fp = k.fp
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
           CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_after,
           CAST((SUM(CASE WHEN kept THEN 0 ELSE n_tok END) * 2000000
                 + SUM(n_tok)) // (SUM(n_tok) * 2) AS BIGINT) / 1000000.0
             AS token_loss_share
    FROM tagged
    GROUP BY source
    ORDER BY source
    """,
)
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda x: x != "",
        )
    )
    d = docs.select(
        "doc_id", "source", F.md5("text").alias("fp"), toks.alias("n_tok")
    )
    keep = d.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    tagged = d.join(keep, "fp").select(
        "source",
        "n_tok",
        (F.col("doc_id") == F.col("keep_id")).alias("kept"),
    )
    agg = tagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_before"),
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_after"),
        F.sum(F.when(~F.col("kept"), F.col("n_tok")).otherwise(0)).alias(
            "__lost"
        ),
    )
    share = (
        F.expr(
            "CAST((__lost * 2000000 + tokens_before) "
            "DIV (tokens_before * 2) AS BIGINT)"
        ).cast("double")
        / 1_000_000.0
    )
    return agg.select(
        "source",
        "n_docs",
        "tokens_before",
        "tokens_after",
        share.alias("token_loss_share"),
    ).orderBy("source")


# =====================================================================
# Hellinger distance between source vocabularies (q308): H² = 1 −
# Σ√(p_i·q_i) over word distributions of two corpus slices — the
# bounded-metric sibling of q207's JS divergence (Hellinger is a true
# metric; JS isn't without the sqrt). √ terms ROUND-9 into DECIMAL.
# =====================================================================
@q(
    "q308_hellinger_distance",
    """
    WITH toks AS (
      SELECT CASE WHEN source <= 'src15' THEN 'a' ELSE 'b' END AS side,
             unnest(list_filter(string_split_regex(trim(lower(text)),
                                                   '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok,
             SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY tok
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts),
    terms AS (
      SELECT CAST(ROUND(sqrt((CAST(ca AS DOUBLE) / tot.na)
                             * (CAST(cb AS DOUBLE) / tot.nb)), 9)
                  AS DECIMAL(28,9)) AS bc_term
      FROM counts, tot
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM counts) AS n_vocab,
           ROUND(CAST(SUM(bc_term) AS DOUBLE), 6)
             AS bhattacharyya_coef,
           ROUND(sqrt(GREATEST(1.0 - CAST(SUM(bc_term) AS DOUBLE), 0.0)),
                 6) AS hellinger
    FROM terms
    """,
)
def q308(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.col("source") <= "src15", "a").otherwise("b").alias(
            "side"
        ),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum((F.col("side") == "a").cast("int")).alias("ca"),
        F.sum((F.col("side") == "b").cast("int")).alias("cb"),
    ).localCheckpoint(eager=False)  # totals + terms both read it
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    term = F.round(
        F.sqrt(
            (F.col("ca").cast("double") / F.col("na"))
            * (F.col("cb").cast("double") / F.col("nb"))
        ),
        9,
    ).cast("decimal(28,9)")
    agg = counts.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum(term).cast("double").alias("bc"),
    )
    return agg.select(
        "n_vocab",
        F.round(F.col("bc"), 6).alias("bhattacharyya_coef"),
        F.round(
            F.sqrt(F.greatest(1.0 - F.col("bc"), F.lit(0.0))), 6
        ).alias("hellinger"),
    )


# =====================================================================
# Context-limit truncation impact (q309): at limits {128, 512, 2048}
# tokens, how many docs truncate and what share of tokens is lost —
# the context-window planning readout before packing (q42). Constant
# limit spine × one token-count pass; shares in integer space.
# =====================================================================
@q(
    "q309_truncation_impact",
    """
    WITH d AS (
      SELECT len(list_filter(string_split_regex(trim(lower(text)),
                                                '\\s+'),
                 x -> x <> '')) AS n_tok
      FROM documents
    ),
    lims AS (SELECT unnest([128, 512, 2048]) AS lim),
    agg AS (
      SELECT lim,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_tok > lim THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_truncated,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
             CAST(SUM(CASE WHEN n_tok > lim THEN n_tok - lim ELSE 0 END)
                  AS BIGINT) AS tokens_lost
      FROM d, lims GROUP BY lim
    )
    SELECT CAST(lim AS INT) AS context_limit, n_docs, n_truncated,
           CAST((n_truncated * 2000000 + n_docs) // (n_docs * 2)
                AS BIGINT) / 1000000.0 AS pct_docs_truncated,
           CAST((CAST(tokens_lost AS HUGEINT) * 2000000 + tokens_total)
                // (tokens_total * 2) AS BIGINT) / 1000000.0
             AS pct_tokens_lost
    FROM agg ORDER BY context_limit
    """,
)
def q309(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda x: x != "",
        )
    )
    d = docs.select(toks.alias("n_tok"))
    lims = F.explode(F.array(F.lit(128), F.lit(512), F.lit(2048)))
    agg = d.select("n_tok", lims.alias("lim")).groupBy("lim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("n_tok") > F.col("lim")).cast("int"))
        .cast("bigint")
        .alias("n_truncated"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.sum(
            F.when(
                F.col("n_tok") > F.col("lim"),
                F.col("n_tok") - F.col("lim"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tokens_lost"),
    )
    return agg.select(
        F.col("lim").cast("int").alias("context_limit"),
        "n_docs",
        "n_truncated",
        (
            F.expr(
                "CAST((n_truncated * 2000000 + n_docs) DIV (n_docs * 2) "
                "AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        ).alias("pct_docs_truncated"),
        (
            F.expr(
                "CAST((CAST(tokens_lost AS DECIMAL(38,0)) * 2000000 "
                "+ tokens_total) DIV (tokens_total * 2) AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        ).alias("pct_tokens_lost"),
    ).orderBy("context_limit")
