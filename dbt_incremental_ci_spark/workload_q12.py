"""Workload band q365-q381 — round-8 third batch.

Storage-level dedup (content-defined chunking with a rolling-window
boundary rule — the rsync/LBFS trick that dedups shared substrings
exact dedup misses), language modeling (Kneser-Ney smoothed bigram
probabilities, the n-gram LM standard), panel econometrics (two-way
fixed-effects within estimator), survival under competing events
(Aalen-Johansen cumulative incidence), and a spectral corpus audit
(power-iteration top eigenvector of the embedding covariance — the
PCA step without a linear-algebra library).

House determinism rules throughout (workload_base): exact integer /
DECIMAL folds for corpus-sized sums, identically-shaped double
expression trees on both engines for the few genuine float steps
(ln/exp survival device, KN interpolation), rank tiebreaks by id.

No counterpart in the reference repo (relational dbt-CI models only,
SRC/README.md); these extend the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    events_table,
    fan_out,
    q,
    t,
)
from dbt_incremental_ci_spark.operators.cdchunk import (  # noqa: E402
    cdc_chunks,
    cdc_chunks_sql,
)
from dbt_incremental_ci_spark.operators.collocations import _toks  # noqa: E402
from dbt_incremental_ci_spark.operators.ngrams import (  # noqa: E402
    shifted_ngram_arrays,
)
from dbt_incremental_ci_spark.operators.survival import (  # noqa: E402
    competing_risks,
    competing_risks_sql,
)


# =====================================================================
# Content-defined chunk dedup (q365): the storage-level dedup CDC
# (Muthitacharoen et al., LBFS 2001): a chunk boundary falls BEFORE
# position p whenever the rolling 8-char window hash at p satisfies
# hash % 32 == 0 (≈32-char expected chunks) — so shared substrings
# chunk identically regardless of their offset, which is exactly what
# fixed-size blocks cannot do. Census: chunk count, distinct chunks,
# byte savings. The window hash is md5 of the 8-char slice (identical
# in both engines); the explode is corpus×length — the shingle class
# (q53/q353 precedent), map-side-combinable aggregates after.
# =====================================================================
@q(
    "q365_cdc_chunk_dedup",
    f"""
    WITH {cdc_chunks_sql("documents", "doc_id", "text", 8, 32)},
    g AS (
      SELECT h, CAST(count(*) AS BIGINT) AS n,
             CAST(min(ln) AS BIGINT) AS ln
      FROM chunks GROUP BY h
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
    SELECT n_docs,
           CAST(sum(n) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(n * ln) AS BIGINT) AS total_chars,
           CAST(sum(ln) AS BIGINT) AS distinct_chars,
           ROUND(100.0 * (sum(n * ln) - sum(ln))
                 / CAST(sum(n * ln) AS DOUBLE), 6) AS savings_pct
    FROM g, nd GROUP BY n_docs
    """,
)
def q365(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.length("text") >= 8)
    )
    chunks = cdc_chunks(
        t(spark, sf_dir, "documents"), "doc_id", "text", window=8, mask=32
    )
    g = chunks.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("ln").alias("ln"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        g.agg(
            F.sum("n").cast("bigint").alias("n_chunks"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chunks"),
            F.sum(F.col("n") * F.col("ln"))
            .cast("bigint")
            .alias("total_chars"),
            F.sum("ln").cast("bigint").alias("distinct_chars"),
            F.round(
                100.0
                * (F.sum(F.col("n") * F.col("ln")) - F.sum("ln"))
                / F.sum(F.col("n") * F.col("ln")).cast("double"),
                6,
            ).alias("savings_pct"),
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "n_docs",
            "n_chunks",
            "n_distinct_chunks",
            "total_chars",
            "distinct_chars",
            "savings_pct",
        )
    )


# =====================================================================
# Kneser-Ney smoothed bigram LM (q366): interpolated KN with absolute
# discount D = 0.75 —
#   P_KN(w2|w1) = (c(w1w2) − D)/c(w1)
#               + (D·N1+(w1·)/c(w1)) · (N1+(·w2)/N1+(··))
# the continuation-probability backoff that beats Good-Turing for
# n-gram LMs (Kneser & Ney 1995; Chen & Goodman 1998). All five
# sufficient statistics are exact integers from two hash aggregates
# over the shifted-slice bigram explode; the probability is ONE
# identically-shaped double expression on both engines, rounded 6.
# Top-20 bigrams by count (w1, w2 tiebreak); c(w1) is bigram-based
# (Σ_w2 c(w1 w2)) per the standard formulation, so c12 ≤ c1 always
# and c12 − D > 0 (no max(·,0) branch needed at D < 1).
# =====================================================================
@q(
    "q366_kneser_ney_bigram",
    r"""
    WITH tk AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM tk, unnest(generate_series(1, len(toks) - 1)) AS g(i)
      WHERE len(toks) >= 2
    ),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM bg GROUP BY w1, w2
    ),
    left_m AS (
      SELECT w1, CAST(sum(n_pair) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS nfol
      FROM c12 GROUP BY w1
    ),
    right_m AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS npre FROM c12 GROUP BY w2
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM c12),
    top AS (
      SELECT w1, w2, n_pair,
             CAST(row_number() OVER (ORDER BY n_pair DESC, w1, w2)
               AS INT) AS rnk
      FROM c12
    )
    SELECT t.w1, t.w2, t.n_pair, l.c1, l.nfol, r.npre, t.rnk,
           ROUND((t.n_pair - 0.75) / l.c1
                 + (0.75 * l.nfol / l.c1) * (r.npre / CAST(nt.ntypes
                                                     AS DOUBLE)), 6)
             AS pkn
    FROM top t
    JOIN left_m l ON t.w1 = l.w1
    JOIN right_m r ON t.w2 = r.w2
    CROSS JOIN nt
    WHERE t.rnk <= 20
    """,
)
def q366(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = _toks("text")
    bigrams = docs.select(
        F.explode(
            F.when(F.size(toks) >= 2, shifted_ngram_arrays(toks, 2))
            .otherwise(F.array().cast("array<string>"))
        ).alias("__bg")
    )
    c12 = (
        bigrams.select(
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    c12 = c12.localCheckpoint(eager=False)  # four readers below
    left_m = c12.groupBy("w1").agg(
        F.sum("n_pair").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nfol"),
    )
    right_m = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("npre")
    )
    nt = c12.agg(F.count(F.lit(1)).cast("bigint").alias("ntypes"))
    # bigram-type (vocab-bounded) frame: deliberate tiny rank window
    w = Window.orderBy(F.desc("n_pair"), F.asc("w1"), F.asc("w2"))
    top = (
        c12.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 20)
    )
    joined = (
        top.join(left_m, "w1")
        .join(right_m, "w2")
        .crossJoin(F.broadcast(nt))
    )
    pkn = F.round(
        (F.col("n_pair") - 0.75) / F.col("c1")
        + (0.75 * F.col("nfol") / F.col("c1"))
        * (F.col("npre") / F.col("ntypes").cast("double")),
        6,
    )
    return joined.select(
        "w1", "w2", "n_pair", "c1", "nfol", "npre", "rnk",
        pkn.alias("pkn"),
    )


# =====================================================================
# Two-way fixed-effects within estimator (q367): the panel regression
# slope of extended price on quantity with supplier-nation AND
# ship-month fixed effects absorbed by double demeaning
# (x̃ = x − x̄_i − x̄_t + x̄) — the workhorse "control for entity and
# time" estimator. Group means are rounded-6 doubles from exact
# DECIMAL sums; demeaned products are rounded-4 and folded in
# DECIMAL(38,4); the slope/R² are single double expressions over
# those exact sums. Entity/period mean frames are 25- and
# month-bounded → broadcast joins; one corpus pass + one reduce.
# =====================================================================
_Q367_ROWS = """(
  SELECT s.s_nationkey AS ent,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
           AS per,
         CAST(l.l_quantity AS DOUBLE) AS x,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS y
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
)"""


@q(
    "q367_fixed_effects",
    f"""
    WITH rows_ AS {_Q367_ROWS},
    em AS (
      SELECT ent,
             ROUND(CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS xe,
             ROUND(CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS ye
      FROM rows_ GROUP BY ent
    ),
    pm AS (
      SELECT per,
             ROUND(CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS xp,
             ROUND(CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS yp
      FROM rows_ GROUP BY per
    ),
    gm AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS xg,
             ROUND(CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2)))
                     AS DOUBLE) / count(*), 6) AS yg
      FROM rows_
    ),
    dm AS (
      SELECT ROUND(r.x - em.xe - pm.xp + gm.xg, 6) AS xt,
             ROUND(r.y - em.ye - pm.yp + gm.yg, 6) AS yt
      FROM rows_ r
      JOIN em ON r.ent = em.ent
      JOIN pm ON r.per = pm.per
      CROSS JOIN gm
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(xt * yt, 4) AS DECIMAL(38,4)))
               AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(xt * xt, 4) AS DECIMAL(38,4)))
               AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(yt * yt, 4) AS DECIMAL(38,4)))
               AS DOUBLE) AS syy
      FROM dm
    ),
    cnt AS (
      SELECT CAST(count(DISTINCT ent) AS BIGINT) AS n_entities,
             CAST(count(DISTINCT per) AS BIGINT) AS n_periods
      FROM rows_
    )
    SELECT n, n_entities, n_periods,
           ROUND(sxy / sxx, 6) AS slope,
           ROUND((sxy * sxy) / (sxx * syy), 6) AS within_r2
    FROM s, cnt
    """,
)
def q367(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    su = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rows = li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey).select(
        F.col("s_nationkey").alias("ent"),
        (
            F.year("l_shipdate") * 12 + F.month("l_shipdate")
        ).cast("bigint").alias("per"),
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("y"),
    )
    # the decimal folds below are the measured cost (profiled at
    # sf0.1: a plain count pass reads 0.47 s, the same pass with two
    # DECIMAL(38,2) sums 1.25 s) and the local scan is single-split —
    # fan the narrow 4-column frame out across cores (no-op on a
    # cluster-sized input)
    rows = fan_out(rows)

    # One (ent, per) cell rollup replaces FIVE full passes over the
    # joined lineitem frame (em, pm, gm, countDistinct — guide §2.3
    # "aggregate before you shuffle" / §1.2 algorithm-first): the
    # DECIMAL(38,2) sums are exact and associative, so per-cell sums
    # roll up to bit-identical per-entity / per-period / grand sums,
    # and the cell frame is entities × months (~2.1k rows at any
    # scale), lazily checkpointed once and shared by all four
    # readers. The corpus is now touched exactly twice: the cell
    # build and the demeaning reduce.
    cells = (
        rows.groupBy("ent", "per")
        .agg(
            F.sum(F.round(F.col("x"), 2).cast("decimal(38,2)")).alias("__sx"),
            F.sum(F.round(F.col("y"), 2).cast("decimal(38,2)")).alias("__sy"),
            F.count(F.lit(1)).alias("__n"),
        )
        .localCheckpoint(eager=False)
    )

    def means(keys: list[str], xn: str, yn: str):
        return cells.groupBy(*keys).agg(
            F.round(
                F.sum("__sx").cast("double") / F.sum("__n"), 6
            ).alias(xn),
            F.round(
                F.sum("__sy").cast("double") / F.sum("__n"), 6
            ).alias(yn),
        )

    em = means(["ent"], "xe", "ye")
    pm = means(["per"], "xp", "yp")
    gm = means([], "xg", "yg")
    # fuse the three mean frames into ONE (ent, per)-keyed broadcast
    # (entities × months ≈ 2.1k rows) so the demeaning pass pays a
    # single broadcast build + join instead of three sequential
    # broadcast rounds (guide §2.4: each broadcast is its own job on
    # the critical path; the values joined are bit-identical)
    meta = em.crossJoin(F.broadcast(pm)).crossJoin(F.broadcast(gm))
    dm = (
        rows.join(F.broadcast(meta), ["ent", "per"])
        .select(
            F.round(
                F.col("x") - F.col("xe") - F.col("xp") + F.col("xg"), 6
            ).alias("xt"),
            F.round(
                F.col("y") - F.col("ye") - F.col("yp") + F.col("yg"), 6
            ).alias("yt"),
        )
    )
    s = dm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.round(F.col("xt") * F.col("yt"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("sxy"),
        F.sum(
            F.round(F.col("xt") * F.col("xt"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("sxx"),
        F.sum(
            F.round(F.col("yt") * F.col("yt"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("syy"),
    )
    cnt = cells.agg(
        F.countDistinct("ent").cast("bigint").alias("n_entities"),
        F.countDistinct("per").cast("bigint").alias("n_periods"),
    )
    return s.crossJoin(F.broadcast(cnt)).select(
        "n",
        "n_entities",
        "n_periods",
        F.round(F.col("sxy") / F.col("sxx"), 6).alias("slope"),
        F.round(
            (F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")),
            6,
        ).alias("within_r2"),
    )


# =====================================================================
# Competing-risks cumulative incidence (q368): time from each user's
# first event to their first PURCHASE (cause 1) or first ERROR
# (cause 2), whichever comes first (tie → purchase), censored at the
# last observed event — Aalen-Johansen CIFs per integer day
# (operators/survival.competing_risks; the q228 life-table class:
# the corpus reduces to one user-keyed aggregate, every window after
# runs on the observation-window-bounded duration frame).
# =====================================================================
_Q368_SUBJECTS = """(
  WITH per_user AS (
    SELECT user_id,
           min(epoch_us(ts)) AS t0,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS tp,
           min(CASE WHEN event_type = 'error'
                    THEN epoch_us(ts) END) AS te,
           max(epoch_us(ts)) AS tl
    FROM events GROUP BY 1
  )
  SELECT CASE
           WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
             THEN (tp - t0) // 86400000000
           WHEN te IS NOT NULL
             THEN (te - t0) // 86400000000
           ELSE (tl - t0) // 86400000000
         END AS duration,
         CASE
           WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
           WHEN te IS NOT NULL THEN 2
           ELSE 0
         END AS cause
  FROM per_user
)"""


@q(
    "q368_competing_risks",
    competing_risks_sql(_Q368_SUBJECTS, "duration", "cause"),
)
def q368(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts: bigint nanoseconds
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        ).alias("te"),
        F.max("ts").alias("tl"),
    )
    first_p = F.col("tp").isNotNull() & (
        F.col("te").isNull() | (F.col("tp") <= F.col("te"))
    )
    subjects = per_user.select(
        F.when(
            first_p,
            F.expr("(tp - t0) DIV 86400000000000"),
        )
        .when(
            F.col("te").isNotNull(),
            F.expr("(te - t0) DIV 86400000000000"),
        )
        .otherwise(F.expr("(tl - t0) DIV 86400000000000"))
        .alias("duration"),
        F.when(first_p, 1)
        .when(F.col("te").isNotNull(), 2)
        .otherwise(0)
        .alias("cause"),
    )
    return competing_risks(subjects, "duration", "cause")


# =====================================================================
# Power-iteration top eigenvector (q369): the leading eigenpair of
# the 16×16 embedding covariance (q276's exact DECIMAL moments) from
# TWO pinned power iterations off the all-ones start — v1 = M·1
# normalized, v2 = M·v1, λ̂ = v1ᵀv2 (Rayleigh, v1 unit), loadings =
# v2 normalized. Every matrix entry and vector element is rounded-6
# before the next exact DECIMAL fold, so the whole iteration replays
# bit-for-bit in SQL; all post-covariance frames are 16/256 rows
# (model-sized). The PCA direction without any linalg library —
# what you whiten/project against at 100 TB.
# =====================================================================
_Q369_DIMS = 16


@q(
    "q369_power_iter_eigen",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    x AS (
      SELECT vec_id, i,
             CAST(ROUND(v[i], 6) AS DECIMAL(18,6)) AS xi
      FROM e, (SELECT unnest(generate_series(1, {_Q369_DIMS})) AS i)
      WHERE len(v) >= {_Q369_DIMS}
    ),
    m AS (
      SELECT a.i AS di, b.i AS dj,
             ROUND(CAST(SUM(CAST(a.xi * b.xi AS DECIMAL(37,12)))
                     AS DOUBLE) / count(*)
                   - (CAST(SUM(a.xi) AS DOUBLE) / count(*))
                     * (CAST(SUM(b.xi) AS DOUBLE) / count(*)),
                   6) AS cov
      FROM x a JOIN x b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    v1r AS (
      SELECT di,
             CAST(SUM(CAST(cov AS DECIMAL(38,6))) AS DOUBLE) AS r
      FROM m GROUP BY di
    ),
    n1 AS (
      SELECT sqrt(CAST(SUM(CAST(ROUND(r * r, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS nrm
      FROM v1r
    ),
    v1 AS (
      SELECT di, ROUND(r / nrm, 6) AS u FROM v1r, n1
    ),
    v2r AS (
      SELECT m.di,
             CAST(SUM(CAST(ROUND(m.cov * v1.u, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS r
      FROM m JOIN v1 ON m.dj = v1.di
      GROUP BY m.di
    ),
    lam AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(v2r.r * v1.u, 10)
                     AS DECIMAL(38,10))) AS DOUBLE), 6) AS eigenvalue
      FROM v2r JOIN v1 ON v2r.di = v1.di
    ),
    n2 AS (
      SELECT sqrt(CAST(SUM(CAST(ROUND(r * r, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS nrm
      FROM v2r
    ),
    ld AS (
      SELECT CAST(di AS INT) AS dim, ROUND(r / nrm, 6) AS loading
      FROM v2r, n2
    )
    SELECT dim, loading, eigenvalue, rnk FROM (
      SELECT dim, loading, eigenvalue,
             CAST(row_number() OVER (ORDER BY abs(loading) DESC, dim)
               AS INT) AS rnk
      FROM ld, lam
    ) WHERE rnk <= 8
    """,
)
def q369(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = (
        emb.filter(F.size("embedding") >= _Q369_DIMS)
        .select(
            "vec_id",
            F.posexplode(F.slice("embedding", 1, _Q369_DIMS)).alias(
                "__p", "__val"
            ),
        )
        .select(
            "vec_id",
            (F.col("__p") + 1).alias("i"),
            F.round(F.col("__val").cast("double"), 6)
            .cast("decimal(18,6)")
            .alias("xi"),
        )
        .localCheckpoint(eager=False)  # both matrix sides read it
    )
    a = x.select("vec_id", F.col("i").alias("di"), F.col("xi").alias("xa"))
    b = x.select("vec_id", F.col("i").alias("dj"), F.col("xi").alias("xb"))
    nd = F.count(F.lit(1)).cast("double")
    m = (
        a.join(b, "vec_id")
        .groupBy("di", "dj")
        .agg(
            F.round(
                F.sum(
                    (F.col("xa") * F.col("xb")).cast("decimal(37,12)")
                ).cast("double")
                / nd
                - (F.sum("xa").cast("double") / nd)
                * (F.sum("xb").cast("double") / nd),
                6,
            ).alias("cov")
        )
        .localCheckpoint(eager=False)  # v1 and v2 both read it
    )
    v1r = m.groupBy("di").agg(
        F.sum(F.col("cov").cast("decimal(38,6)")).cast("double").alias("r")
    )
    n1 = v1r.agg(
        F.sqrt(
            F.sum(
                F.round(F.col("r") * F.col("r"), 12).cast("decimal(38,12)")
            ).cast("double")
        ).alias("nrm")
    )
    v1 = v1r.crossJoin(F.broadcast(n1)).select(
        "di", F.round(F.col("r") / F.col("nrm"), 6).alias("u")
    )
    v2r = (
        m.join(
            F.broadcast(v1.select(F.col("di").alias("dj"), "u")), "dj"
        )
        .groupBy("di")
        .agg(
            F.sum(
                F.round(F.col("cov") * F.col("u"), 10).cast(
                    "decimal(38,10)"
                )
            )
            .cast("double")
            .alias("r")
        )
    ).localCheckpoint(eager=False)  # lambda, norm, loadings all read it
    lam = (
        v2r.join(F.broadcast(v1), "di")
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("r") * F.col("u"), 10).cast(
                        "decimal(38,10)"
                    )
                ).cast("double"),
                6,
            ).alias("eigenvalue")
        )
    )
    n2 = v2r.agg(
        F.sqrt(
            F.sum(
                F.round(F.col("r") * F.col("r"), 12).cast("decimal(38,12)")
            ).cast("double")
        ).alias("nrm")
    )
    ld = v2r.crossJoin(F.broadcast(n2)).select(
        F.col("di").cast("int").alias("dim"),
        F.round(F.col("r") / F.col("nrm"), 6).alias("loading"),
    )
    # 16-row frame: deliberate tiny rank window
    w = Window.orderBy(F.abs(F.col("loading")).desc(), F.asc("dim"))
    return (
        ld.crossJoin(F.broadcast(lam))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 8)
        .select("dim", "loading", "eigenvalue", "rnk")
    )


# =====================================================================
# Audio period detection (q370): per REAL decoded WAV of the q333
# slice, the lag in [2,16] maximizing the exact integer
# autocorrelation Σ s_i·s_{i+lag} — the spectral-free pitch/period
# estimator (multimodal.audio_autocorr_lag). The q333 sawtooth has
# period gcd-structure in its (d·7 + 13i) generator, so best lags
# vary by doc; the oracle regenerates every (lag, product) pair from
# the sample formula and replays the argmax — a decoder that drops,
# reorders, or sign-flips samples moves a product and fails the hash.
# =====================================================================
_Q370_CAP = 500  # the q333 audio audit slice


@q(
    "q370_audio_autocorr",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id, 64 + doc_id % 64 AS n
      FROM documents WHERE doc_id < {_Q370_CAP}
    ),
    prods AS (
      SELECT media_id, n, lag,
             sum(((media_id * 7 + i * 13) % 2001 - 1000)
                 * ((media_id * 7 + (i + lag) * 13) % 2001 - 1000))
               AS r
      FROM ids,
           unnest(generate_series(2, 16)) AS gl(lag),
           unnest(generate_series(0, n - 1)) AS gi(i)
      WHERE i + lag <= n - 1
      GROUP BY media_id, n, lag
    ),
    best AS (
      SELECT media_id, n, lag, r,
             row_number() OVER (PARTITION BY media_id
                                ORDER BY r DESC, lag) AS rn
      FROM prods
    )
    SELECT media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(lag AS INT) AS best_lag,
           CAST(r AS BIGINT) AS best_autocorr
    FROM best WHERE rn = 1
    """,
)
def q370(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.workload_q9 import _q333_payloads
    from dbt_incremental_ci_spark.operators import multimodal

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q370_CAP)
    )
    return multimodal.audio_autocorr_lag(
        _q333_payloads(docs), min_lag=2, max_lag=16
    )


# =====================================================================
# Cross-source chunk contamination (q371): q320 counts whole-document
# duplicates across sources; this drops to SUB-document granularity —
# for every source pair, the number of distinct CDC chunks (q365's
# content-defined split) they share. Catches partial copying /
# boilerplate bleeding between sources that whole-doc hashing misses.
# Shape: distinct (chunk, source) projection, hash self-join on the
# chunk key with source_a < source_b — fan-out per chunk bounded by
# sources² (≤400), output ≤ C(|sources|,2) rows.
# =====================================================================
@q(
    "q371_chunk_contamination",
    f"""
    WITH {cdc_chunks_sql("documents", "doc_id", "text", 8, 32)},
    cs AS (
      SELECT DISTINCT c.h, d2.source
      FROM chunks c JOIN documents d2 ON c.id = d2.doc_id
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_chunks
    FROM cs a JOIN cs b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q371(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    chunks = cdc_chunks(docs, "doc_id", "text", window=8, mask=32)
    cs = (
        chunks.join(docs.select("doc_id", "source"), "doc_id")
        .select("h", "source")
        .distinct()
    )
    a = cs.select(F.col("h"), F.col("source").alias("source_a"))
    b = cs.select(F.col("h"), F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_chunks"))
    )


# =====================================================================
# Instrumental-variable Wald estimator (q372): the causal effect of
# clicking on purchase value when clicking is confounded, using the
# user-parity instrument z = user_id % 2 — LATE = (ȳ₁−ȳ₀)/(x̄₁−x̄₀)
# (Wald 1940; Angrist-Imbens-Rubin LATE). Complements the causal band
# (CEM q293 / DR-OPE q230 / CUPED q247 / QTE q322) with the
# instrument-based identification none of them provide. One user-
# keyed hash agg → one 2-cell reduce; every mean is a double division
# of exact DECIMAL/bigint sums, identical trees both engines.
# =====================================================================
@q(
    "q372_iv_wald",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS z,
             CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value, 2) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT z, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             sum(y) AS sy
      FROM per_user GROUP BY z
    ),
    wide AS (
      SELECT
        max(CASE WHEN z = 1 THEN n END) AS n1,
        max(CASE WHEN z = 0 THEN n END) AS n0,
        max(CASE WHEN z = 1 THEN sx END) AS sx1,
        max(CASE WHEN z = 0 THEN sx END) AS sx0,
        max(CASE WHEN z = 1 THEN sy END) AS sy1,
        max(CASE WHEN z = 0 THEN sy END) AS sy0
      FROM cells
    )
    SELECT n1, n0,
           ROUND(CAST(sy1 AS DOUBLE) / n1
                 - CAST(sy0 AS DOUBLE) / n0, 6) AS itt_effect,
           ROUND(CAST(sx1 AS DOUBLE) / n1
                 - CAST(sx0 AS DOUBLE) / n0, 6) AS first_stage,
           CASE WHEN CAST(sx1 AS DOUBLE) / n1
                     - CAST(sx0 AS DOUBLE) / n0 <> 0
                THEN ROUND((CAST(sy1 AS DOUBLE) / n1
                            - CAST(sy0 AS DOUBLE) / n0)
                           / (CAST(sx1 AS DOUBLE) / n1
                              - CAST(sx0 AS DOUBLE) / n0), 6)
           END AS late_wald
    FROM wide
    """,
)
def q372(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value"), 2).cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("y"),
    ).withColumn("z", F.col("user_id") % 2)
    cells = per_user.groupBy("z").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
    )
    wide = cells.agg(
        F.max(F.when(F.col("z") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("z") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("z") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("z") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("z") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("z") == 0, F.col("sy"))).alias("sy0"),
    )
    y1 = F.col("sy1").cast("double") / F.col("n1")
    y0 = F.col("sy0").cast("double") / F.col("n0")
    x1 = F.col("sx1").cast("double") / F.col("n1")
    x0 = F.col("sx0").cast("double") / F.col("n0")
    return wide.select(
        "n1",
        "n0",
        F.round(y1 - y0, 6).alias("itt_effect"),
        F.round(x1 - x0, 6).alias("first_stage"),
        # a zero first stage (e.g. every user clicked) -> LATE
        # undefined, NULL on both engines instead of a div-by-zero
        F.when(
            (x1 - x0) != 0, F.round((y1 - y0) / (x1 - x0), 6)
        ).alias("late_wald"),
    )


# =====================================================================
# Difference-in-differences (q373): the two-period, two-group causal
# workhorse missing from the causal band (CEM/DR-OPE/CUPED/QTE/IV):
# treat = odd users, post = events in the second half of the
# observation window (split at the midpoint timestamp, a corpus
# scalar); outcome = per-(user, period) purchase value. DiD =
# (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre) — the
# parallel-trends estimator. One user-period hash agg → a 4-cell
# reduce; every mean is a double division of exact DECIMAL sums.
# =====================================================================
@q(
    "q373_diff_in_diff",
    """
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
      FROM events
    ),
    per AS (
      SELECT user_id, user_id % 2 AS treat,
             CASE WHEN epoch_us(ts) * 2 >= lo + hi THEN 1 ELSE 0 END
               AS post,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value, 2) AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END AS v
      FROM events, bounds
    ),
    up AS (
      SELECT user_id, treat, post, sum(v) AS y
      FROM per GROUP BY 1, 2, 3
    ),
    cells AS (
      SELECT treat, post, CAST(count(*) AS BIGINT) AS n, sum(y) AS sy
      FROM up GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        max(CASE WHEN treat = 1 AND post = 1 THEN CAST(sy AS DOUBLE)
            / n END) AS tp,
        max(CASE WHEN treat = 1 AND post = 0 THEN CAST(sy AS DOUBLE)
            / n END) AS tr,
        max(CASE WHEN treat = 0 AND post = 1 THEN CAST(sy AS DOUBLE)
            / n END) AS cp,
        max(CASE WHEN treat = 0 AND post = 0 THEN CAST(sy AS DOUBLE)
            / n END) AS cr,
        CAST(sum(n) AS BIGINT) AS n_user_periods
      FROM cells
    )
    SELECT n_user_periods,
           ROUND(tp - tr, 6) AS treat_delta,
           ROUND(cp - cr, 6) AS control_delta,
           ROUND((tp - tr) - (cp - cr), 6) AS did_estimate
    FROM wide
    """,
)
def q373(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)  # ts: bigint nanoseconds
    bounds = ev.agg(
        F.min("ts").alias("__lo"), F.max("ts").alias("__hi")
    )
    per = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        (F.col("user_id") % 2).alias("treat"),
        F.when(
            F.col("ts") * 2 >= F.col("__lo") + F.col("__hi"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value"), 2).cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("v"),
    )
    up = per.groupBy("user_id", "treat", "post").agg(
        F.sum("v").alias("y")
    )
    cells = up.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").alias("sy"),
    )

    def cell(tr: int, po: int):
        return F.max(
            F.when(
                (F.col("treat") == tr) & (F.col("post") == po),
                F.col("sy").cast("double") / F.col("n"),
            )
        )

    wide = cells.agg(
        cell(1, 1).alias("tp"),
        cell(1, 0).alias("tr"),
        cell(0, 1).alias("cp"),
        cell(0, 0).alias("cr"),
        F.sum("n").cast("bigint").alias("n_user_periods"),
    )
    return wide.select(
        "n_user_periods",
        F.round(F.col("tp") - F.col("tr"), 6).alias("treat_delta"),
        F.round(F.col("cp") - F.col("cr"), 6).alias("control_delta"),
        F.round(
            (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr")), 6
        ).alias("did_estimate"),
    )


# =====================================================================
# Geometric median per embedding class (q374): the Weiszfeld robust
# centroid — v_{t+1} = Σ(x_i/d_i)/Σ(1/d_i), d_i = ‖x_i − v_t‖ — run
# for TWO pinned iterations from the class mean over the first 16
# dims. The mean is what every centroid op here uses (q238/q357);
# the geometric median is its outlier-robust replacement (one
# corrupted embedding can drag a mean arbitrarily far; it moves the
# median by at most its weight share) — so delta = gm − mean is a
# per-dimension contamination signal. Per-term rounding (d at 9 dp,
# weight terms at 9 dp, coordinates at 6 dp per iteration) makes the
# whole fixed-point sequence replay exactly in DuckDB; rows at
# d = 0 are excluded from both sums (the standard Weiszfeld fix).
# Shape: two corpus passes (one per iteration), each a broadcast
# join against the k×16 estimate frame + one hash agg; all
# post-corpus frames are model-sized.
# =====================================================================
_Q374_DIMS = 16


def _q374_iter_sql(prev: str, out: str) -> str:
    """One Weiszfeld scaling: x joined to the ``prev`` estimate,
    per-row distance, weighted coordinate means into ``out``."""
    return f"""
    {out}_d AS (
      SELECT x.lbl, x.vid,
             ROUND(sqrt(CAST(SUM(CAST(ROUND((x.xi - p.v)
                                            * (x.xi - p.v), 12)
                     AS DECIMAL(38,12))) AS DOUBLE)), 9) AS dd
      FROM x JOIN {prev} p ON x.lbl = p.lbl AND x.dim = p.dim
      GROUP BY x.lbl, x.vid
    ),
    {out} AS (
      SELECT x.lbl, x.dim,
             ROUND(CAST(SUM(CAST(ROUND(CAST(x.xi AS DOUBLE) / d.dd, 9)
                     AS DECIMAL(38,9))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(1.0 / d.dd, 9)
                     AS DECIMAL(38,9))) AS DOUBLE), 6) AS v
      FROM x JOIN {out}_d d ON x.lbl = d.lbl AND x.vid = d.vid
      WHERE d.dd > 0
      GROUP BY x.lbl, x.dim
    )"""


@q(
    "q374_geometric_median",
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    x AS (
      SELECT vec_id AS vid, label AS lbl, i - 1 AS dim,
             ROUND(v[i], 6) AS xi
      FROM e, (SELECT unnest(generate_series(1, {_Q374_DIMS})) AS i)
      WHERE len(v) >= {_Q374_DIMS}
    ),
    v0 AS (
      SELECT lbl, dim,
             ROUND(CAST(SUM(CAST(xi AS DECIMAL(38,6))) AS DOUBLE)
                   / count(*), 6) AS v
      FROM x GROUP BY lbl, dim
    ),
    {_q374_iter_sql("v0", "v1")},
    {_q374_iter_sql("v1", "v2")}
    SELECT CAST(v2.lbl AS INT) AS label, CAST(v2.dim AS INT) AS dim,
           v2.v AS gmedian, v0.v AS mean,
           ROUND(v2.v - v0.v, 6) AS delta
    FROM v2 JOIN v0 ON v2.lbl = v0.lbl AND v2.dim = v0.dim
    """,
)
def q374(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = (
        emb.filter(F.size("embedding") >= _Q374_DIMS)
        .select(
            F.col("vec_id").alias("vid"),
            F.col("label").alias("lbl"),
            F.posexplode(F.slice("embedding", 1, _Q374_DIMS)).alias(
                "dim", "__val"
            ),
        )
        .select(
            "vid",
            "lbl",
            "dim",
            F.round(F.col("__val").cast("double"), 6).alias("xi"),
        )
        .localCheckpoint(eager=False)  # three readers (v0 + 2 passes)
    )
    v0 = x.groupBy("lbl", "dim").agg(
        F.round(
            F.sum(F.col("xi").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("v")
    ).localCheckpoint(eager=False)  # iteration input + final join

    def weiszfeld(prev: DataFrame) -> DataFrame:
        d = (
            x.join(F.broadcast(prev), ["lbl", "dim"])
            .groupBy("lbl", "vid")
            .agg(
                F.round(
                    F.sqrt(
                        F.sum(
                            F.round(
                                (F.col("xi") - F.col("v"))
                                * (F.col("xi") - F.col("v")),
                                12,
                            ).cast("decimal(38,12)")
                        ).cast("double")
                    ),
                    9,
                ).alias("dd")
            )
        )
        return (
            x.join(d.where(F.col("dd") > 0), ["lbl", "vid"])
            .groupBy("lbl", "dim")
            .agg(
                (
                    F.sum(
                        F.round(
                            F.col("xi").cast("double") / F.col("dd"), 9
                        ).cast("decimal(38,9)")
                    ).cast("double")
                    / F.sum(
                        F.round(F.lit(1.0) / F.col("dd"), 9).cast(
                            "decimal(38,9)"
                        )
                    ).cast("double")
                ).alias("__raw")
            )
            .select(
                "lbl", "dim", F.round(F.col("__raw"), 6).alias("v")
            )
        )

    v1 = weiszfeld(v0).localCheckpoint(eager=False)
    v2 = weiszfeld(v1)
    return (
        v2.select("lbl", "dim", F.col("v").alias("gmedian"))
        .join(
            F.broadcast(v0.select("lbl", "dim", F.col("v").alias("mean"))),
            ["lbl", "dim"],
        )
        .select(
            F.col("lbl").cast("int").alias("label"),
            F.col("dim").cast("int").alias("dim"),
            "gmedian",
            "mean",
            F.round(F.col("gmedian") - F.col("mean"), 6).alias("delta"),
        )
    )


# =====================================================================
# Freedman-Diaconis adaptive histogram (q375): bin width from the
# data itself — h = 2·IQR / ∛n — instead of q145's fixed 20 bins.
# Everything stays EXACT-INTEGER: prices in cents, the IQR in
# quarter-cents (the (n−1)·q positions land on exact binary quarters,
# so IQR·4 is an integer recoverable by round), the cube root as the
# exact integer ⌊∛n⌋ (libm pow is NOT cross-engine deterministic at
# the ulp — the float estimate is corrected by ±1 integer compares),
# and the width by half-up integer DIV. The IQR rides the scalable
# exact-quantile machinery (ranks.exact_quantiles — no single-task
# sort); binning is one map-only pass + a hash agg; output is the
# FD-optimal O(∛n) bin census with exact dollar edges.
# =====================================================================
from dbt_incremental_ci_spark.operators.ranks import (  # noqa: E402
    exact_quantiles_sql,
)

_Q375_QQ = exact_quantiles_sql(
    "(SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 "
    "AS BIGINT) AS c FROM lineitem "
    "WHERE l_extendedprice IS NOT NULL)",
    "c",
    [0.25, 0.75],
)


@q(
    "q375_fd_histogram",
    f"""
    WITH cents AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT) AS c
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    qq AS ({_Q375_QQ}),
    w AS (
      SELECT max(CASE WHEN q = 0.25 THEN quantile END) AS q25,
             max(CASE WHEN q = 0.75 THEN quantile END) AS q75,
             max(n) AS n
      FROM qq
    ),
    k0 AS (
      SELECT *, CAST(power(CAST(n AS DOUBLE), 1.0 / 3) AS BIGINT) AS kf
      FROM w
    ),
    k AS (
      SELECT *,
             kf + (CASE WHEN (kf + 1) * (kf + 1) * (kf + 1) <= n
                   THEN 1 ELSE 0 END)
                - (CASE WHEN kf * kf * kf > n THEN 1 ELSE 0 END)
               AS icbrt,
             CAST(ROUND((q75 - q25) * 4, 0) AS BIGINT) AS iqr_qc
      FROM k0
    ),
    h AS (
      SELECT greatest(1, (2 * iqr_qc + 2 * icbrt)
                         // (4 * icbrt)) AS h_cents
      FROM k
    ),
    lo AS (SELECT min(c) AS mn FROM cents)
    SELECT CAST((c - mn) // h_cents AS BIGINT) AS bin,
           ROUND((mn + ((c - mn) // h_cents) * h_cents) / 100.0, 2)
             AS lo_dollars,
           CAST(max(h_cents) AS BIGINT) AS h_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM cents, h, lo
    GROUP BY 1, 2
    """,
)
def q375(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.ranks import exact_quantiles

    li = t(spark, sf_dir, "lineitem")
    cents = li.where(F.col("l_extendedprice").isNotNull()).select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c")
    )
    qq = exact_quantiles(cents, "c", [0.25, 0.75])
    # Round-12 (the exact_quantiles driver-scalar lesson): the width
    # chain w → icbrt → iqr → h was a ladder of 1-row frames riding a
    # broadcast round; every value in it is a SCALAR of the quantile
    # output, so it is one driver-bound read + exact Python integer
    # arithmetic. Exactness: icbrt's ±1 integer correction makes
    # ⌊∛n⌋ independent of pow's ulp (the same argument the Spark
    # expression relied on); (q75−q25)·4 is an exact integer by the
    # quarter-cent grid construction, so the half-up round is exact;
    # the rest is int DIV. Identical h_cents, one broadcast round
    # fewer in the binning pass.
    import math as _math

    wrow = qq.agg(
        F.max(F.when(F.col("q") == 0.25, F.col("quantile"))).alias("q25"),
        F.max(F.when(F.col("q") == 0.75, F.col("quantile"))).alias("q75"),
        F.max("n").alias("n"),
        # driver-bound: 1 row — two quantile doubles + n
    ).first()
    if wrow["n"] is None:
        # empty input: the binning groupBy below runs over zero rows —
        # the width value is never observed; keep the plan shape
        h_cents = 1
    else:
        n = int(wrow["n"])
        kf = int(float(n) ** (1.0 / 3))
        icbrt = (
            kf
            + (1 if (kf + 1) ** 3 <= n else 0)
            - (1 if kf**3 > n else 0)
        )
        iqr_qc = int(_math.floor((wrow["q75"] - wrow["q25"]) * 4 + 0.5))
        h_cents = max(1, (2 * iqr_qc + 2 * icbrt) // (4 * icbrt))
    lo = cents.agg(F.min("c").alias("mn"))
    binned = cents.crossJoin(F.broadcast(lo)).withColumn(
        "h_cents", F.lit(h_cents).cast("bigint")
    )
    bin_ = F.expr("(c - mn) DIV h_cents")
    return binned.groupBy(
        bin_.cast("bigint").alias("bin"),
        F.round(
            (F.col("mn") + bin_ * F.col("h_cents")) / 100.0, 2
        ).alias("lo_dollars"),
    ).agg(
        F.max("h_cents").cast("bigint").alias("h_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# =====================================================================
# Bloom-filter FPR curve (q376): measured vs estimated false-positive
# rate across three filter sizes (k = 4 salts fixed) — completes the
# sketch-accuracy trio next to q252 (count-min) and q291 (HLL).
# Members = doc_id % 3 != 0, probes = the true NON-members, so every
# might_contain hit is a false positive by construction. The
# theoretical plug-in uses the MEASURED bit density: fpr ≈ (bits/m)^k
# written as explicit x·x·x·x (libm pow is not ulp-deterministic
# cross-engine; four multiplications are). Bits-set and probe counts
# are exact integers; rates are half-up micro DIVs. Per-m work: one
# n·k explode into an ≤m-row distinct + a broadcast probe join.
# =====================================================================
def _q376_block(m: int) -> str:
    from dbt_incremental_ci_spark.operators.bloom import position_sql

    member_pos = "\n        UNION ALL ".join(
        f"SELECT {position_sql('doc_id', m, 'fprc', i)} AS bit_pos "
        "FROM members"
        for i in range(4)
    )
    probe_pos = "\n        UNION ALL ".join(
        f"SELECT doc_id, {position_sql('doc_id', m, 'fprc', i)} "
        "AS bit_pos FROM probes"
        for i in range(4)
    )
    return f"""
    SELECT {m} AS m, bs.bits_set, pr.n_probes, pr.n_fp
    FROM (
      SELECT CAST(count(*) AS BIGINT) AS bits_set FROM (
        SELECT DISTINCT bit_pos FROM ({member_pos})
      )
    ) bs, (
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
             CAST(sum(CASE WHEN mc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fp
      FROM (
        SELECT doc_id,
               count(*) = sum(CASE WHEN b.bit_pos IS NOT NULL
                              THEN 1 ELSE 0 END) AS mc
        FROM ({probe_pos}) pp
        LEFT JOIN (SELECT DISTINCT bit_pos FROM ({member_pos})) b
          USING (bit_pos)
        GROUP BY doc_id
      )
    ) pr
    """


_Q376_MS = [512, 2048, 8192]


def _q376_oracle() -> str:
    blocks = "\n    UNION ALL\n".join(_q376_block(m) for m in _Q376_MS)
    return f"""
    WITH members AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
    probes AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    raw AS (
    {blocks}
    )
    SELECT CAST(m AS INT) AS m, CAST(4 AS INT) AS k, bits_set,
           n_probes, n_fp,
           ROUND(CAST(bits_set AS DOUBLE) / m, 6) AS load_factor,
           CAST((n_fp * 2000000 + n_probes) // (2 * n_probes)
                AS DOUBLE) / 1e6 AS fpr_measured,
           ROUND((CAST(bits_set AS DOUBLE) / m)
                 * (CAST(bits_set AS DOUBLE) / m)
                 * (CAST(bits_set AS DOUBLE) / m)
                 * (CAST(bits_set AS DOUBLE) / m), 9) AS fpr_estimate
    FROM raw
    """


@q("q376_bloom_fpr_curve", _q376_oracle())
def q376(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import bloom

    docs = t(spark, sf_dir, "documents").select("doc_id")
    members = docs.filter(F.col("doc_id") % 3 != 0)
    probes = docs.filter(F.col("doc_id") % 3 == 0)
    outs = []
    for m in _Q376_MS:
        bits = bloom.bloom_build(members, m=m, k=4, salt="fprc")
        bs = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
        probed = bloom.bloom_might_contain(
            bits, probes, m=m, k=4, salt="fprc"
        )
        pr = probed.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum(F.col("might_contain").cast("int"))
            .cast("bigint")
            .alias("n_fp"),
        )
        outs.append(
            bs.crossJoin(F.broadcast(pr)).select(
                F.lit(m).cast("int").alias("m"),
                F.lit(4).cast("int").alias("k"),
                "bits_set",
                "n_probes",
                "n_fp",
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    lf = F.col("bits_set").cast("double") / F.col("m")
    return u.select(
        "m",
        "k",
        "bits_set",
        "n_probes",
        "n_fp",
        F.round(lf, 6).alias("load_factor"),
        F.expr(
            "CAST((n_fp * 2000000 + n_probes) DIV (2 * n_probes)"
            " AS DOUBLE) / 1e6"
        ).alias("fpr_measured"),
        F.round(lf * lf * lf * lf, 9).alias("fpr_estimate"),
    )


# =====================================================================
# Leave-one-source-out rank stability (q377): is the corpus-wide
# top-10 term ranking an artifact of one source? For every held-out
# source, the top-10 recomputed from total − that source's counts
# (NO second corpus pass — the (term × source) count frame already
# contains every scenario), reported as overlap@10 with the full
# ranking. The q319 LOSO idea applied to rankings; low overlap for a
# source = that source dominates the vocabulary (a mixture red flag).
# Frames: one corpus hash agg → vocab×|sources| candidates; per-source
# rank windows partition by the held-out source.
# =====================================================================
@q(
    "q377_loso_rank_stability",
    r"""
    WITH tk AS (
      SELECT source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    ts AS (
      SELECT source, w AS term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(toks) AS w FROM tk)
      GROUP BY source, w
    ),
    tot AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM ts GROUP BY term),
    full_top AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY ct DESC, term) AS rn
        FROM tot
      ) WHERE rn <= 10
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    loso AS (
      SELECT s.source, t.term,
             t.ct - COALESCE(x.c, 0) AS cm
      FROM srcs s CROSS JOIN tot t
      LEFT JOIN ts x ON x.source = s.source AND x.term = t.term
    ),
    loso_top AS (
      SELECT source, term FROM (
        SELECT source, term,
               row_number() OVER (PARTITION BY source
                                  ORDER BY cm DESC, term) AS rn
        FROM loso
      ) WHERE rn <= 10
    )
    SELECT lt.source,
           CAST(sum(CASE WHEN ft.term IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS overlap_at_10,
           ROUND(sum(CASE WHEN ft.term IS NOT NULL THEN 1 ELSE 0 END)
                 / 10.0, 6) AS stability
    FROM loso_top lt LEFT JOIN full_top ft ON lt.term = ft.term
    GROUP BY lt.source
    """,
)
def q377(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.text import tokens as _tok

    docs = t(spark, sf_dir, "documents")
    ts = (
        docs.select(
            "source",
            F.explode(
                _tok(F.trim(F.lower(F.col("text"))))
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # totals + per-source scenarios
    )
    tot = ts.groupBy("term").agg(F.sum("c").cast("bigint").alias("ct"))
    # vocab-bounded frame: deliberate tiny rank window
    w_full = Window.orderBy(F.desc("ct"), F.asc("term"))
    full_top = (
        tot.withColumn("rn", F.row_number().over(w_full))
        .where(F.col("rn") <= 10)
        .select("term")
    )
    srcs = docs.select("source").distinct()
    loso = (
        srcs.crossJoin(tot)
        .join(ts, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.col("ct") - F.coalesce(F.col("c"), F.lit(0))).alias("cm"),
        )
    )
    w_s = Window.partitionBy("source").orderBy(F.desc("cm"), F.asc("term"))
    loso_top = (
        loso.withColumn("rn", F.row_number().over(w_s))
        .where(F.col("rn") <= 10)
        .select("source", "term")
    )
    return (
        loso_top.join(
            F.broadcast(full_top.withColumn("__hit", F.lit(1))),
            "term",
            "left",
        )
        .groupBy("source")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("overlap_at_10"),
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / 10.0, 6
            ).alias("stability"),
        )
    )


# =====================================================================
# Sessionization-gap sensitivity curve (q378): the q182 session
# metrics recomputed at 10/30/60-minute inactivity gaps in ONE pass —
# the parameter-sensitivity census (q353's shingle curve for events)
# that picks the gap before a pipeline bakes it in. Constant ×3
# fan-out via a gap spine crossJoin; windows partition by (gap, user).
# =====================================================================
@q(
    "q378_session_gap_curve",
    """
    WITH gaps AS (SELECT unnest([600, 1800, 3600]) AS gap),
    flagged AS (
      SELECT g.gap, e.user_id,
             epoch_ns(e.ts) // 1000000000 AS sec, e.event_id,
             CASE WHEN lag(e.ts) OVER (PARTITION BY g.gap, e.user_id
                                       ORDER BY e.ts, e.event_id)
                    IS NULL THEN 1
                  WHEN date_diff('second',
                       lag(e.ts) OVER (PARTITION BY g.gap, e.user_id
                                       ORDER BY e.ts, e.event_id),
                       e.ts) > g.gap THEN 1
                  ELSE 0 END AS is_new
      FROM events e CROSS JOIN gaps g
    ),
    sess AS (
      SELECT gap, user_id, sec,
             sum(is_new) OVER (PARTITION BY gap, user_id
                               ORDER BY sec, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM flagged
    ),
    per AS (
      SELECT gap, user_id, sid, count(*) AS n_ev,
             max(sec) - min(sec) AS dur
      FROM sess GROUP BY gap, user_id, sid
    )
    SELECT CAST(gap AS INT) AS gap_sec,
           CAST(count(*) AS BIGINT) AS n_sessions,
           ROUND(sum(n_ev) / CAST(count(*) AS DOUBLE), 6)
             AS avg_events_per_session,
           ROUND(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
           ROUND(sum(dur) / CAST(count(*) AS DOUBLE), 6)
             AS avg_session_sec
    FROM per GROUP BY gap
    """,
)
def q378(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).withColumn(
        "sec", F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    )
    gaps = ev.sparkSession.createDataFrame(
        [(600,), (1800,), (3600,)], "gap int"
    )
    e = ev.crossJoin(F.broadcast(gaps))
    w = Window.partitionBy("gap", "user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("sec").over(w)
    is_new = (
        F.when(prev_sec.isNull(), 1)
        .when(F.col("sec") - prev_sec > F.col("gap"), 1)
        .otherwise(0)
    )
    ws = (
        Window.partitionBy("gap", "user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = e.withColumn("__new", is_new).withColumn(
        "sid", F.sum("__new").over(ws)
    )
    per = sess.groupBy("gap", "user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("sec") - F.min("sec")).alias("dur"),
    )
    return per.groupBy(F.col("gap").cast("int").alias("gap_sec")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(
            F.sum("n_ev") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_events_per_session"),
        F.round(
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.sum("dur") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_session_sec"),
    )


# =====================================================================
# Fightin' Words distinctive terms (q379): Monroe, Colaresi &
# Quinn (2008) — log-odds-ratio with a Dirichlet prior and its
# asymptotic variance, THE corpus-comparison method that fixes what
# raw log-odds and tf-idf both get wrong (rare-word explosion /
# frequent-word suppression). Corpora: even vs odd doc_id halves;
# z(w) = [ln-odds_1(w) − ln-odds_2(w)] / √(1/(c1+a) + 1/(c2+a)),
# a = 0.5. Sufficient statistics are exact integers from one hash
# agg; each ln/√ rides the ROUND-9 grid before the one combining
# expression (house ln rule), z rounds to 6. Top-15 per direction
# over the (c1+c2 ≥ 20)-filtered vocab-bounded frame.
# =====================================================================
@q(
    "q379_fightin_words",
    r"""
    WITH tk AS (
      SELECT doc_id % 2 AS grp,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    cnt AS (
      SELECT grp, w AS term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT grp, unnest(toks) AS w FROM tk)
      GROUP BY grp, w
    ),
    wide AS (
      SELECT term,
             CAST(COALESCE(max(CASE WHEN grp = 0 THEN c END), 0)
               AS BIGINT) AS c1,
             CAST(COALESCE(max(CASE WHEN grp = 1 THEN c END), 0)
               AS BIGINT) AS c2
      FROM cnt GROUP BY term
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS vsz
      FROM wide
    ),
    z AS (
      SELECT term, c1, c2,
             ROUND((ROUND(ln((c1 + 0.5)
                           / (n1 + 0.5 * vsz - c1 - 0.5)), 9)
                    - ROUND(ln((c2 + 0.5)
                             / (n2 + 0.5 * vsz - c2 - 0.5)), 9))
                   / ROUND(sqrt(1.0 / (c1 + 0.5)
                                + 1.0 / (c2 + 0.5)), 9), 6) AS z
      FROM wide, tot WHERE c1 + c2 >= 20
    )
    SELECT * FROM (
      SELECT 'even' AS direction, term, c1, c2, z,
             CAST(row_number() OVER (ORDER BY z DESC, term) AS INT)
               AS rnk
      FROM z
    ) WHERE rnk <= 15
    UNION ALL
    SELECT * FROM (
      SELECT 'odd' AS direction, term, c1, c2, z,
             CAST(row_number() OVER (ORDER BY z ASC, term) AS INT)
               AS rnk
      FROM z
    ) WHERE rnk <= 15
    """,
)
def q379(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.text import tokens as _tok

    docs = t(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            (F.col("doc_id") % 2).alias("grp"),
            F.explode(_tok(F.trim(F.lower(F.col("text"))))).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wide = cnt.groupBy("term").agg(
        F.coalesce(F.max(F.when(F.col("grp") == 0, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c1"),
        F.coalesce(F.max(F.when(F.col("grp") == 1, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c2"),
    ).localCheckpoint(eager=False)  # totals + z both read it
    tot = wide.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("vsz"),
    )
    zf = (
        wide.where(F.col("c1") + F.col("c2") >= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "c1",
            "c2",
            F.round(
                (
                    F.round(
                        F.log(
                            (F.col("c1") + 0.5)
                            / (
                                F.col("n1")
                                + 0.5 * F.col("vsz")
                                - F.col("c1")
                                - 0.5
                            )
                        ),
                        9,
                    )
                    - F.round(
                        F.log(
                            (F.col("c2") + 0.5)
                            / (
                                F.col("n2")
                                + 0.5 * F.col("vsz")
                                - F.col("c2")
                                - 0.5
                            )
                        ),
                        9,
                    )
                )
                / F.round(
                    F.sqrt(
                        1.0 / (F.col("c1") + 0.5)
                        + 1.0 / (F.col("c2") + 0.5)
                    ),
                    9,
                ),
                6,
            ).alias("z"),
        )
    )
    # vocab-bounded frame: deliberate tiny rank windows
    w_even = Window.orderBy(F.desc("z"), F.asc("term"))
    w_odd = Window.orderBy(F.asc("z"), F.asc("term"))
    even = (
        zf.withColumn("rnk", F.row_number().over(w_even).cast("int"))
        .where(F.col("rnk") <= 15)
        .select(F.lit("even").alias("direction"), "term", "c1", "c2", "z", "rnk")
    )
    odd = (
        zf.withColumn("rnk", F.row_number().over(w_odd).cast("int"))
        .where(F.col("rnk") <= 15)
        .select(F.lit("odd").alias("direction"), "term", "c1", "c2", "z", "rnk")
    )
    return even.unionByName(odd)


# =====================================================================
# Dedup-threshold transitivity audit (q380): near-duplication at a
# sound threshold should be (nearly) transitive — a ~ b and b ~ c but
# NOT a ~ c means the threshold sits inside a similarity gradient and
# connected-component "clusters" will chain unrelated docs. Wedges
# from the q331 pair set (banded candidates, exact Jaccard ≥ 0.7),
# closure checked by anti-probing the pair set; reports the global
# closure rate. Fan-out bounded by node degree (the q331 histogram is
# the companion diagnostic).
#
# Oracle convention, wedge-squared (round-8 ADVICE item 3): the Spark
# pair set is banding + signature-estimate prefilter (probabilistic
# recall) vs DuckDB's exact all-pairs, and the wedge self-join SQUARES
# any missed pair's effect on counts. The recall argument still holds:
# auto-tuned banding admits pairs down to J≈(1/b)^(1/r)≈0.5 and the
# estimate prefilter cuts at threshold−0.2 (>3σ for 64 hashes), so a
# true J≥0.7 pair is missed with p≪1e-3; amplification by the ≤degree
# wedge fan-out keeps the expected count divergence ≪1 at any SF where
# degrees are sub-thousand. Belt-and-braces, the shipped SFs are
# verified EXACTLY: tests/test_r8_band2_ops.py::
# test_q380_pair_set_matches_exact_oracle asserts the Spark pair SET
# (not just counts) equals DuckDB's exact all-pairs set at sf0.001,
# and the sf0.01 correctness gate matches all four output values.
# =====================================================================
@q(
    "q380_dedup_transitivity",
    """
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= 0.7
    ),
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    wedges AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1 JOIN und e2 ON e1.v = e2.u
      WHERE e1.u < e2.v
    ),
    closed AS (
      SELECT w.a, w.b, w.c,
             CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS cl
      FROM wedges w
      LEFT JOIN pairs p ON p.id_a = w.a AND p.id_b = w.c
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT) AS n_wedges,
           CAST(sum(cl) AS BIGINT) AS n_closed,
           CAST(CASE WHEN count(*) = 0 THEN NULL
                ELSE (sum(cl) * 2000000 + count(*)) // (2 * count(*))
                END AS DOUBLE) / 1e6 AS closure_rate
    FROM closed
    """,
)
def q380(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    pairs = (
        dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)  # wedge sides + closure probe
    )
    und = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    wedges = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .where(F.col("e1.u") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    closed = wedges.join(
        pairs.select(
            F.col("id_a").alias("a"),
            F.col("id_b").alias("c"),
            F.lit(1).alias("__cl"),
        ),
        ["a", "c"],
        "left",
    )
    npairs = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    agg = closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        F.sum(F.coalesce(F.col("__cl"), F.lit(0)))
        .cast("bigint")
        .alias("n_closed"),
    )
    return npairs.crossJoin(F.broadcast(agg)).selectExpr(
        "n_pairs",
        "n_wedges",
        "n_closed",
        "CAST(CASE WHEN n_wedges = 0 THEN NULL"
        " ELSE (n_closed * 2000000 + n_wedges) DIV (2 * n_wedges)"
        " END AS DOUBLE) / 1e6 AS closure_rate",
    )


# =====================================================================
# Qini uplift curve (q381): the standard uplift-model evaluation
# (Radcliffe 2007) missing from the causal band — users ranked by a
# targeting score (the props.k signal), cumulative incremental
# purchases at each decile: qini(d) = Y_t(d) − Y_c(d)·N_t(d)/N_c(d).
# Treatment = user parity (the q372/q373 instrument), outcome = any
# purchase. Deciles are INTEGER rank arithmetic on the two-phase
# user-frame total order (no quantile interpolation); cumulative
# sums run on the 10-row decile frame; the one ratio per row is a
# single double expression over exact integers, rounded 6.
# =====================================================================
@q(
    "q381_qini_uplift",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS treat,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y,
             max(CAST(json_extract(props, '$.k') AS BIGINT)) AS score
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS nu
      FROM per_user
    ),
    dec AS (
      SELECT CAST(((rn - 1) * 10) // nu AS INT) AS decile, treat, y
      FROM ranked
    ),
    cells AS (
      SELECT decile,
             CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
             CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT)
               AS yt,
             CAST(sum(CASE WHEN treat = 0 THEN y ELSE 0 END) AS BIGINT)
               AS yc
      FROM dec GROUP BY decile
    ),
    cum AS (
      SELECT decile,
             sum(nt) OVER w AS nt_c, sum(nc) OVER w AS nc_c,
             sum(yt) OVER w AS yt_c, sum(yc) OVER w AS yc_c
      FROM cells
      WINDOW w AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile, CAST(nt_c AS BIGINT) AS nt_cum,
           CAST(nc_c AS BIGINT) AS nc_cum,
           CAST(yt_c AS BIGINT) AS yt_cum,
           CAST(yc_c AS BIGINT) AS yc_cum,
           ROUND(yt_c - yc_c * (CAST(nt_c AS DOUBLE)
                                / CAST(nc_c AS DOUBLE)), 6) AS qini
    FROM cum
    """,
)
def q381(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.ranks import (
        two_phase_row_number,
    )

    ev = events_table(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
        F.max(
            F.get_json_object("props", "$.k").cast("bigint")
        ).alias("score"),
    ).withColumn("treat", F.col("user_id") % 2)
    ranked = two_phase_row_number(
        per_user, [F.desc("score"), F.asc("user_id")], out_col="rn"
    )
    nu = per_user.agg(F.count(F.lit(1)).alias("__nu"))
    dec = ranked.crossJoin(F.broadcast(nu)).selectExpr(
        "CAST(((rn - 1) * 10) DIV __nu AS INT) AS decile", "treat", "y"
    )
    cells = dec.groupBy("decile").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("yt"),
        F.sum(F.when(F.col("treat") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("yc"),
    )
    # 10-row decile frame: deliberate tiny cumulative window
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        "decile",
        F.sum("nt").over(w).cast("bigint").alias("nt_cum"),
        F.sum("nc").over(w).cast("bigint").alias("nc_cum"),
        F.sum("yt").over(w).cast("bigint").alias("yt_cum"),
        F.sum("yc").over(w).cast("bigint").alias("yc_cum"),
    ).select(
        "decile",
        "nt_cum",
        "nc_cum",
        "yt_cum",
        "yc_cum",
        F.round(
            F.col("yt_cum")
            - F.col("yc_cum")
            * (
                F.col("nt_cum").cast("double")
                / F.col("nc_cum").cast("double")
            ),
            6,
        ).alias("qini"),
    )
