"""Workload band q382+ — round-9 additions.

LM-based corpus quality scoring (per-document mean Kneser-Ney bigram
probability — the perplexity-filter shape on the deterministic
integer grid), dedup-aware train/val/test split leakage (the
contamination audit every eval pipeline needs before trusting a
held-out score), and top-2 PCA explained variance via deflated power
iteration (the dimensionality-audit number on top of q369's leading
eigenpair).

House determinism rules throughout (workload_base): exact integer /
DECIMAL folds for corpus-sized sums, identically-shaped double
expression trees on both engines for the few genuine float steps,
rank tiebreaks by id, md5-derived hashes for anything pseudo-random.

No counterpart in the reference repo (relational dbt-CI models only,
SRC/README.md); these extend the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.collocations import _toks
from dbt_incremental_ci_spark.operators.ngrams import shifted_ngram_arrays
from dbt_incremental_ci_spark.workload_base import q, t

# =====================================================================
# LM document quality score (q382): the perplexity-filter shape —
# train the q366 Kneser-Ney bigram LM on the corpus itself, score
# every document by its MEAN bigram probability, report per-source
# distribution stats (the "which source is noisiest under the LM"
# audit that decides mixture weights). Determinism: P_KN is the q366
# expression (one identically-shaped double tree over five exact
# integer stats), floor-lifted to the 1e-6 integer grid per bigram
# TYPE; per-doc and per-source means are integer half-up divisions of
# exact integer sums — no float accumulation anywhere.
# Scale shape: bigram explode (the shingle class) → bigram-type hash
# agg for the LM (vocab²-bounded, ≪ corpus tokens); scoring is ONE
# equi-join of the corpus bigram stream against the type table
# (standard LM-scoring shuffle, map-side combinable per-doc agg);
# per-source reduce is category-bounded. Docs with <2 tokens carry no
# bigram and are excluded from n_docs (documented).
# =====================================================================
@q(
    "q382_lm_doc_quality",
    r"""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source, toks[i] AS w1, toks[i + 1] AS w2
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
    ptab AS (
      SELECT c.w1, c.w2,
             CAST(floor(ROUND((c.n_pair - 0.75) / l.c1
                   + (0.75 * l.nfol / l.c1)
                     * (r.npre / CAST(nt.ntypes AS DOUBLE)), 6) * 1e6
                   + 0.5) AS BIGINT) AS si
      FROM c12 c
      JOIN left_m l ON c.w1 = l.w1
      JOIN right_m r ON c.w2 = r.w2
      CROSS JOIN nt
    ),
    ds AS (
      SELECT b.doc_id, b.source,
             CAST(count(*) AS BIGINT) AS n_bg,
             CAST(sum(p.si) AS BIGINT) AS s_si
      FROM bg b JOIN ptab p ON b.w1 = p.w1 AND b.w2 = p.w2
      GROUP BY b.doc_id, b.source
    ),
    dm AS (
      SELECT doc_id, source,
             (2 * s_si + n_bg) // (2 * n_bg) AS mi
      FROM ds
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2 * sum(mi) + count(*)) // (2 * count(*)) AS DOUBLE)
             / 1e6 AS mean_lm_score,
           CAST(min(mi) AS DOUBLE) / 1e6 AS min_lm_score,
           CAST(max(mi) AS DOUBLE) / 1e6 AS max_lm_score
    FROM dm GROUP BY source ORDER BY source
    """,
)
def q382(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = _toks("text")
    bg = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.when(F.size(toks) >= 2, shifted_ngram_arrays(toks, 2))
                .otherwise(F.array().cast("array<string>"))
            ).alias("__bg"),
        )
        .select(
            "doc_id",
            "source",
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
    )
    # LM sufficient statistics (q366): all bigram-TYPE-bounded frames
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .localCheckpoint(eager=False)  # four readers below
    )
    left_m = c12.groupBy("w1").agg(
        F.sum("n_pair").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nfol"),
    )
    right_m = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("npre")
    )
    nt = c12.agg(F.count(F.lit(1)).cast("bigint").alias("ntypes"))
    pkn = F.round(
        (F.col("n_pair") - 0.75) / F.col("c1")
        + (0.75 * F.col("nfol") / F.col("c1"))
        * (F.col("npre") / F.col("ntypes").cast("double")),
        6,
    )
    ptab = (
        c12.join(left_m, "w1")
        .join(right_m, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            F.floor(pkn * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("si"),
        )
    )
    # scoring: corpus bigram stream ⋈ type table (every doc bigram is
    # in the LM by construction — trained on the same corpus), then
    # map-side-combinable per-doc and per-source reduces; the bigram
    # explode is re-derived rather than checkpointed (map-only from
    # the parquet scan — cheaper to recompute than to materialize a
    # corpus-tokens-sized frame)
    ds = (
        bg.join(ptab, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bg"),
            F.sum("si").cast("bigint").alias("s_si"),
        )
    )
    dm = ds.selectExpr(
        "source", "(2 * s_si + n_bg) DIV (2 * n_bg) AS mi"
    )
    return (
        dm.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("mi").cast("bigint").alias("__s"),
            F.min("mi").alias("__mn"),
            F.max("mi").alias("__mx"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "CAST((2 * __s + n_docs) DIV (2 * n_docs) AS DOUBLE) / 1e6"
            " AS mean_lm_score",
            "CAST(__mn AS DOUBLE) / 1e6 AS min_lm_score",
            "CAST(__mx AS DOUBLE) / 1e6 AS max_lm_score",
        )
        .orderBy("source")
    )


# =====================================================================
# Dedup-aware split leakage audit (q383): assign every document to
# train/val/test by a deterministic md5 hash split (8/1/1 — the
# standard leakage-free assignment), then count near-duplicate pairs
# (the q331 banded pair set, exact char-5-shingle Jaccard ≥ 0.7;
# recall convention per q331/q380, pair-set equality verified at
# sf0.001 in tests) that CROSS split boundaries — a train↔test
# near-dup inflates every held-out metric. Output: the 3×3
# upper-triangular split-pair matrix with each cell's share of all
# pairs (1e-6 half-up grid). Scale shape: the pair set is banded
# (never all-pairs); split assignment is a pure expression on the id
# columns — no extra join; the matrix reduce is 6-bounded.
# =====================================================================
_Q383_SPLITS = ["train", "val", "test"]


def _q383_split_sql(col: str) -> str:
    return f"""CASE
      WHEN ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))::BIGINT
           % 10 < 8 THEN 0
      WHEN ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))::BIGINT
           % 10 = 8 THEN 1
      ELSE 2 END"""


@q(
    "q383_split_leakage",
    f"""
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
    lab AS (
      SELECT least({_q383_split_sql('id_a')}, {_q383_split_sql('id_b')})
               AS lo,
             greatest({_q383_split_sql('id_a')},
                      {_q383_split_sql('id_b')}) AS hi
      FROM pairs
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
    cell AS (
      SELECT lo, hi, CAST(count(*) AS BIGINT) AS n_pairs
      FROM lab GROUP BY lo, hi
    )
    SELECT CASE lo WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test'
             END AS split_a,
           CASE hi WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test'
             END AS split_b,
           n_pairs,
           CAST(CASE WHEN lo <> hi THEN 1 ELSE 0 END AS INT)
             AS is_leak,
           CAST((n_pairs * 2000000 + tot.n) // (2 * tot.n) AS DOUBLE)
             / 1e6 AS pair_share
    FROM cell CROSS JOIN tot
    ORDER BY lo, hi
    """,
)
def q383(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.7
    ).select("id_a", "id_b")

    def split_idx(col: str) -> F.Column:
        m = (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1, 4), 16, 10
            ).cast("bigint")
            % 10
        )
        return F.when(m < 8, 0).when(m == 8, 1).otherwise(2)

    lab = pairs.select(
        F.least(split_idx("id_a"), split_idx("id_b")).alias("lo"),
        F.greatest(split_idx("id_a"), split_idx("id_b")).alias("hi"),
    )
    cell = lab.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    tot = lab.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    name = "CASE %s WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END"
    return (
        cell.crossJoin(F.broadcast(tot))
        .selectExpr(
            f"{name % 'lo'} AS split_a",
            f"{name % 'hi'} AS split_b",
            "n_pairs",
            "CAST(CASE WHEN lo <> hi THEN 1 ELSE 0 END AS INT) AS is_leak",
            "CAST((n_pairs * 2000000 + n) DIV (2 * n) AS DOUBLE) / 1e6"
            " AS pair_share",
            "lo",
            "hi",
        )
        .orderBy("lo", "hi")
        .drop("lo", "hi")
    )


# =====================================================================
# Top-2 PCA explained variance (q384): extends q369's leading
# eigenpair with ONE Hotelling deflation — M₂ = M − λ₁·u₁u₁ᵀ on the
# 16×16 covariance (256-row model frame), two more pinned power
# iterations off the all-ones start for (λ₂, u₂), and the
# dimensionality-audit numbers: explainedᵢ = λᵢ / trace(M). Every
# matrix entry, vector element, and deflation product is rounded-6
# before the next exact DECIMAL fold, so the whole two-eigenpair
# sequence replays bit-for-bit in SQL (q369 convention). All
# post-covariance frames are 16/256 rows — model-sized; the one
# corpus-scale job is the covariance hash agg.
# =====================================================================
_Q384_DIMS = 16


@q(
    "q384_pca2_explained",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    x AS (
      SELECT vec_id, i,
             CAST(ROUND(v[i], 6) AS DECIMAL(18,6)) AS xi
      FROM e, (SELECT unnest(generate_series(1, {_Q384_DIMS})) AS i)
      WHERE len(v) >= {_Q384_DIMS}
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
    tr AS (
      SELECT ROUND(CAST(SUM(CAST(cov AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS trace
      FROM m WHERE di = dj
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
    v1 AS (SELECT di, ROUND(r / nrm, 6) AS u FROM v1r, n1),
    v2r AS (
      SELECT m.di,
             CAST(SUM(CAST(ROUND(m.cov * v1.u, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS r
      FROM m JOIN v1 ON m.dj = v1.di
      GROUP BY m.di
    ),
    lam1 AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(v2r.r * v1.u, 10)
                     AS DECIMAL(38,10))) AS DOUBLE), 6) AS lam
      FROM v2r JOIN v1 ON v2r.di = v1.di
    ),
    n2 AS (
      SELECT sqrt(CAST(SUM(CAST(ROUND(r * r, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS nrm
      FROM v2r
    ),
    u1 AS (SELECT di, ROUND(r / nrm, 6) AS u FROM v2r, n2),
    m2 AS (
      SELECT m.di, m.dj,
             ROUND(m.cov - lam1.lam * a.u * b.u, 6) AS cov
      FROM m
      JOIN u1 a ON m.di = a.di
      JOIN u1 b ON m.dj = b.di
      CROSS JOIN lam1
    ),
    w1r AS (
      SELECT di,
             CAST(SUM(CAST(cov AS DECIMAL(38,6))) AS DOUBLE) AS r
      FROM m2 GROUP BY di
    ),
    wn1 AS (
      SELECT sqrt(CAST(SUM(CAST(ROUND(r * r, 12) AS DECIMAL(38,12)))
               AS DOUBLE)) AS nrm
      FROM w1r
    ),
    w1 AS (SELECT di, ROUND(r / nrm, 6) AS u FROM w1r, wn1),
    w2r AS (
      SELECT m2.di,
             CAST(SUM(CAST(ROUND(m2.cov * w1.u, 10) AS DECIMAL(38,10)))
               AS DOUBLE) AS r
      FROM m2 JOIN w1 ON m2.dj = w1.di
      GROUP BY m2.di
    ),
    lam2 AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(w2r.r * w1.u, 10)
                     AS DECIMAL(38,10))) AS DOUBLE), 6) AS lam
      FROM w2r JOIN w1 ON w2r.di = w1.di
    )
    SELECT component, eigenvalue,
           ROUND(eigenvalue / trace, 6) AS explained_ratio,
           ROUND(cum / trace, 6) AS cum_ratio
    FROM (
      SELECT 1 AS component, lam1.lam AS eigenvalue,
             lam1.lam AS cum, tr.trace
      FROM lam1, tr
      UNION ALL
      SELECT 2, lam2.lam, lam1.lam + lam2.lam, tr.trace
      FROM lam1, lam2, tr
    ) ORDER BY component
    """,
)
def q384(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = (
        emb.filter(F.size("embedding") >= _Q384_DIMS)
        .select(
            "vec_id",
            F.posexplode(F.slice("embedding", 1, _Q384_DIMS)).alias(
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
        .localCheckpoint(eager=False)  # 256 rows; many readers
    )

    def _fold6(df, grp, col, out):
        return df.groupBy(grp).agg(
            F.sum(F.col(col).cast("decimal(38,6)")).cast("double").alias(out)
        )

    def _norm(df, col):
        return df.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col(col) * F.col(col), 12).cast(
                        "decimal(38,12)"
                    )
                ).cast("double")
            ).alias("nrm")
        )

    def _matvec(mat, unit):
        # one pinned power step: r = mat · u with round-10 products
        return (
            mat.join(
                F.broadcast(unit.select(F.col("di").alias("dj"), "u")),
                "dj",
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
        )

    def _rayleigh(rvec, unit, out):
        return (
            rvec.join(F.broadcast(unit), "di")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("r") * F.col("u"), 10).cast(
                            "decimal(38,10)"
                        )
                    ).cast("double"),
                    6,
                ).alias(out)
            )
        )

    def _unit(rvec):
        n = _norm(rvec, "r")
        return rvec.crossJoin(F.broadcast(n)).select(
            "di", F.round(F.col("r") / F.col("nrm"), 6).alias("u")
        )

    tr = m.where(F.col("di") == F.col("dj")).agg(
        F.round(
            F.sum(F.col("cov").cast("decimal(38,6)")).cast("double"), 6
        ).alias("trace")
    )
    # eigenpair 1 (q369): v1 = normalize(M·1), u1 = normalize(M·v1),
    # λ1 = Rayleigh(M·v1, v1)
    v1 = _unit(_fold6(m, "di", "cov", "r"))
    v2r = _matvec(m, v1).localCheckpoint(eager=False)  # λ1 + u1 read it
    lam1 = _rayleigh(v2r, v1, "lam")
    u1 = _unit(v2r)
    # Hotelling deflation on the 256-row model frame, then the same
    # two pinned iterations for eigenpair 2
    m2 = (
        m.join(F.broadcast(u1.select(F.col("di"), F.col("u").alias("ua"))), "di")
        .join(
            F.broadcast(
                u1.select(F.col("di").alias("dj"), F.col("u").alias("ub"))
            ),
            "dj",
        )
        .crossJoin(F.broadcast(lam1))
        .select(
            "di",
            "dj",
            F.round(
                F.col("cov") - F.col("lam") * F.col("ua") * F.col("ub"), 6
            ).alias("cov"),
        )
        .localCheckpoint(eager=False)  # w1 and w2 both read it
    )
    w1 = _unit(_fold6(m2, "di", "cov", "r"))
    w2r = _matvec(m2, w1)
    lam2 = _rayleigh(w2r, w1, "lam")
    one = (
        lam1.crossJoin(F.broadcast(tr))
        .selectExpr(
            "1 AS component",
            "lam AS eigenvalue",
            "lam AS cum",
            "trace",
        )
    )
    two = (
        lam2.select(F.col("lam").alias("lam2"))
        .crossJoin(F.broadcast(lam1))
        .crossJoin(F.broadcast(tr))
        .selectExpr(
            "2 AS component",
            "lam2 AS eigenvalue",
            "lam + lam2 AS cum",
            "trace",
        )
    )
    return (
        one.unionByName(two)
        .select(
            "component",
            "eigenvalue",
            F.round(F.col("eigenvalue") / F.col("trace"), 6).alias(
                "explained_ratio"
            ),
            F.round(F.col("cum") / F.col("trace"), 6).alias("cum_ratio"),
        )
        .orderBy("component")
    )


# =====================================================================
# Context-window packing audit (q385): the pre-training batching
# question — how much of each source survives a 2048-token context
# budget, and how many packed windows does it fill? Exact integers
# only: per source, docs / whitespace tokens / docs over budget /
# tokens lost to truncation / the packed-window lower bound
# ceil(usable / 2048) / the fill ratio of those windows on the 1e-6
# half-up grid. (True first-fit packing is inherently sequential;
# the ceil lower bound and truncation loss are the scale-stable
# numbers a planner actually uses.) One corpus pass, category-bounded
# reduce.
# =====================================================================
_Q385_CTX = 2048


@q(
    "q385_packing_audit",
    rf"""
    WITH tk AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(trim(lower(text)),
                  '\s+'), t -> t <> '')) AS BIGINT) AS ntok
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN ntok > {_Q385_CTX} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_over_budget,
             CAST(sum(CASE WHEN ntok > {_Q385_CTX}
                      THEN ntok - {_Q385_CTX} ELSE 0 END) AS BIGINT)
               AS truncated_tokens,
             CAST(sum(CASE WHEN ntok > {_Q385_CTX} THEN {_Q385_CTX}
                      ELSE ntok END) AS BIGINT) AS usable_tokens
      FROM tk GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_over_budget, truncated_tokens,
           (usable_tokens + {_Q385_CTX - 1}) // {_Q385_CTX} AS windows_lb,
           CASE WHEN usable_tokens > 0 THEN
           CAST((usable_tokens * 2000000
                 + ((usable_tokens + {_Q385_CTX - 1}) // {_Q385_CTX})
                   * {_Q385_CTX})
                // (2 * ((usable_tokens + {_Q385_CTX - 1})
                         // {_Q385_CTX}) * {_Q385_CTX})
             AS DOUBLE) / 1e6 END AS fill_ratio
    FROM s ORDER BY source
    """,
)
def q385(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    ctx = _Q385_CTX
    tk = docs.select(
        "source", F.size(_toks("text")).cast("bigint").alias("ntok")
    )
    s = tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("ntok") > ctx, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_budget"),
        F.sum(
            F.when(F.col("ntok") > ctx, F.col("ntok") - ctx).otherwise(0)
        )
        .cast("bigint")
        .alias("truncated_tokens"),
        F.sum(F.least(F.col("ntok"), F.lit(ctx).cast("bigint")))
        .cast("bigint")
        .alias("usable_tokens"),
    )
    return s.selectExpr(
        "source",
        "n_docs",
        "n_tokens",
        "n_over_budget",
        "truncated_tokens",
        f"(usable_tokens + {ctx - 1}) DIV {ctx} AS windows_lb",
        # zero-token source guard (round-9 ADVICE item 5): windows_lb=0
        # makes the divisor 0 — Spark DIV yields NULL but DuckDB '//'
        # raises; CASE to NULL on BOTH engines before the division
        f"CASE WHEN usable_tokens > 0 THEN"
        f" CAST((usable_tokens * 2000000"
        f" + ((usable_tokens + {ctx - 1}) DIV {ctx}) * {ctx})"
        f" DIV (2 * ((usable_tokens + {ctx - 1}) DIV {ctx}) * {ctx})"
        f" AS DOUBLE) / 1e6 END AS fill_ratio",
    ).orderBy("source")


# =====================================================================
# Good-Turing unseen mass + Chao1 vocabulary estimate (q386): the
# corpus-coverage audit — what probability mass belongs to words the
# corpus has NEVER seen (Good-Turing: P0 = N1/N, the singleton share)
# and how big is the true vocabulary (Chao1: V + N1²/(2·N2)) — the
# two standard "is this corpus big enough / still growing" numbers
# (Gale & Sampson 1995; Chao 1984). Per source. Exact integer
# sufficient statistics (token count, vocab size, singleton/doubleton
# type counts) from two hash aggs; both ratios on the 1e-6 half-up
# integer grid; Chao1 NULL where N2 = 0 (estimator undefined).
# =====================================================================
@q(
    "q386_good_turing_mass",
    r"""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split_regex(
               trim(lower(text)), '\s+'), t -> t <> '')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    ),
    s AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM cnt GROUP BY source
    )
    SELECT source, n_tokens, vocab, n1, n2,
           CAST((n1 * 2000000 + n_tokens) // (2 * n_tokens) AS DOUBLE)
             / 1e6 AS p_unseen,
           CASE WHEN n2 > 0 THEN
             CAST(vocab AS DOUBLE)
             + CAST((n1 * n1 * 1000000 + n2) // (2 * n2) AS DOUBLE)
               / 1e6
           END AS chao1_vocab
    FROM s ORDER BY source
    """,
)
def q386(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(_toks("text")).alias("tok")
    )
    cnt = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    return s.selectExpr(
        "source",
        "n_tokens",
        "vocab",
        "n1",
        "n2",
        "CAST((n1 * 2000000 + n_tokens) DIV (2 * n_tokens) AS DOUBLE)"
        " / 1e6 AS p_unseen",
        "CASE WHEN n2 > 0 THEN CAST(vocab AS DOUBLE)"
        " + CAST((n1 * n1 * 1000000 + n2) DIV (2 * n2) AS DOUBLE) / 1e6"
        " END AS chao1_vocab",
    ).orderBy("source")


# =====================================================================
# Temperature-scaled mixture weights (q387): the multilingual/
# multi-source sampling standard (α = 0.5 — upsample small sources,
# damp the head): w_s ∝ n_s^α over per-source token counts, vs the
# raw proportional share. Determinism: sqrt is IEEE-exact-rounded in
# both engines; each sqrt is rounded-6 and lifted to the 1e-6 integer
# grid BEFORE the cross-source sum, so the normalizing constant is an
# exact integer (float sum order never matters); both shares are
# half-up integer divisions. Category-bounded everything after the
# one corpus pass.
# =====================================================================
@q(
    "q387_mixture_weights",
    r"""
    WITH tk AS (
      SELECT source,
             CAST(sum(len(list_filter(string_split_regex(
                  trim(lower(text)), '\s+'), t -> t <> '')))
               AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    g AS (
      SELECT source, n_tokens,
             CAST(floor(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6) * 1e6
                        + 0.5) AS BIGINT) AS sq6
      FROM tk
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS nt,
             CAST(sum(sq6) AS BIGINT) AS st
      FROM g
    )
    SELECT source, n_tokens,
           CAST((n_tokens * 2000000 + tot.nt) // (2 * tot.nt)
             AS DOUBLE) / 1e6 AS raw_share,
           CAST((sq6 * 2000000 + tot.st) // (2 * tot.st) AS DOUBLE)
             / 1e6 AS temperature_share
    FROM g CROSS JOIN tot
    ORDER BY source
    """,
)
def q387(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tk = docs.groupBy("source").agg(
        F.sum(F.size(_toks("text")).cast("bigint"))
        .cast("bigint")
        .alias("n_tokens")
    )
    g = tk.select(
        "source",
        "n_tokens",
        F.floor(
            F.round(F.sqrt(F.col("n_tokens").cast("double")), 6)
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("sq6"),
    )
    tot = g.agg(
        F.sum("n_tokens").cast("bigint").alias("nt"),
        F.sum("sq6").cast("bigint").alias("st"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_tokens",
            "CAST((n_tokens * 2000000 + nt) DIV (2 * nt) AS DOUBLE)"
            " / 1e6 AS raw_share",
            "CAST((sq6 * 2000000 + st) DIV (2 * st) AS DOUBLE) / 1e6"
            " AS temperature_share",
        )
        .orderBy("source")
    )


# =====================================================================
# Dedup retention plan (q388): what dedup actually DOES to the corpus
# — group near-duplicates into connected components (large-star/
# small-star over the q331 banded pair set), keep ONE representative
# per component by the standard "longest text, id tiebreak" rule
# (richer than q52's min-id survivor), and report the per-source
# retention ledger: docs before/after, drop count, and the kept share
# of characters on the 1e-6 grid (how much DATA survives, not just
# how many docs). Component fan-out is the q52/q320 machinery; the
# keep-rule is one per-component max_by; reduces are source-bounded.
# =====================================================================
@q(
    "q388_dedup_retention",
    """
    WITH RECURSIVE sh AS (
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
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    lab AS (
      SELECT d.doc_id, d.source,
             CAST(strlen(d.text) AS BIGINT) AS nchars,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    keep AS (
      SELECT component,
             (SELECT l2.doc_id FROM lab l2
              WHERE l2.component = lab.component
              ORDER BY l2.nchars DESC, l2.doc_id ASC LIMIT 1) AS kept_id
      FROM lab GROUP BY component
    ),
    marked AS (
      SELECT l.source, l.nchars,
             CASE WHEN l.doc_id = k.kept_id THEN 1 ELSE 0 END AS kept
      FROM lab l JOIN keep k ON l.component = k.component
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
           CAST((sum(kept * nchars) * 2000000 + sum(nchars))
                // (2 * sum(nchars)) AS DOUBLE) / 1e6
             AS kept_char_share
    FROM marked GROUP BY source ORDER BY source
    """,
)
def q388(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators import components as cc
    from dbt_incremental_ci_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.7
    ).select("id_a", "id_b")
    comp = cc.dedup_components(
        docs.select("doc_id"), pairs, "doc_id"
    ).select("doc_id", "component")
    lab = docs.select(
        "doc_id", "source", F.length("text").cast("bigint").alias("nchars")
    ).join(comp, "doc_id")
    # keep-rule: longest text per component, doc_id tiebreak — a
    # per-component top-1 window (frame bounded by component size)
    w = Window.partitionBy("component").orderBy(
        F.desc("nchars"), F.asc("doc_id")
    )
    marked = lab.withColumn(
        "kept",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("kept"))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(F.col("kept") * F.col("nchars"))
            .cast("bigint")
            .alias("__kc"),
            F.sum("nchars").cast("bigint").alias("__tc"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_kept",
            "n_dropped",
            "CAST((__kc * 2000000 + __tc) DIV (2 * __tc) AS DOUBLE)"
            " / 1e6 AS kept_char_share",
        )
        .orderBy("source")
    )


# =====================================================================
# Corpus snapshot drift (q389): the recurring-crawl monitoring
# numbers — treat the even/odd doc_id halves as two corpus snapshots
# and report vocabulary Jaccard overlap, the OOV token share of
# snapshot B against A's vocabulary (how much of the new crawl the
# old tokenizer has never seen), and the total-variation distance of
# the two unigram distributions over the top-50 combined terms (the
# head-mass shift). All drift numbers are exact-integer: per-term
# probabilities on the 1e-6 half-up grid over full snapshot totals,
# TV = Σ|pa−qb| / 2 on those integers; no logs, no float sums. The
# rank window runs on the count≥5 vocab-bounded frame (q364
# convention).
# =====================================================================
@q(
    "q389_snapshot_drift",
    r"""
    WITH tok AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS snap,
             unnest(list_filter(string_split_regex(trim(lower(text)),
                    '\s+'), t -> t <> '')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT snap, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY snap, tok
    ),
    piv AS (
      SELECT tok,
             CAST(COALESCE(sum(CASE WHEN snap = 'a' THEN c END), 0)
               AS BIGINT) AS ca,
             CAST(COALESCE(sum(CASE WHEN snap = 'b' THEN c END), 0)
               AS BIGINT) AS cb
      FROM cnt GROUP BY tok
    ),
    vstats AS (
      SELECT CAST(count(*) FILTER (WHERE ca > 0) AS BIGINT) AS va,
             CAST(count(*) FILTER (WHERE cb > 0) AS BIGINT) AS vb,
             CAST(count(*) FILTER (WHERE ca > 0 AND cb > 0) AS BIGINT)
               AS vboth,
             CAST(sum(CASE WHEN ca = 0 THEN cb ELSE 0 END) AS BIGINT)
               AS oov_b,
             CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb
      FROM piv
    ),
    top AS (
      SELECT ca, cb,
             row_number() OVER (ORDER BY ca + cb DESC, tok) AS rnk
      FROM piv WHERE ca + cb >= 5
    ),
    tv AS (
      SELECT CAST(sum(abs((ca * 2000000 + v.na) // (2 * v.na)
                        - (cb * 2000000 + v.nb) // (2 * v.nb)))
               AS BIGINT) AS sabs
      FROM top, vstats v WHERE rnk <= 50
    )
    SELECT v.va AS vocab_a, v.vb AS vocab_b,
           CAST((v.vboth * 2000000 + (v.va + v.vb - v.vboth))
                // (2 * (v.va + v.vb - v.vboth)) AS DOUBLE) / 1e6
             AS vocab_jaccard,
           CAST((v.oov_b * 2000000 + v.nb) // (2 * v.nb) AS DOUBLE)
             / 1e6 AS oov_token_share_b,
           CAST(tv.sabs AS DOUBLE) / 2e6 AS tv_distance_top50
    FROM vstats v, tv
    """,
)
def q389(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("snap"),
        F.explode(_toks("text")).alias("tok"),
    )
    cnt = tok.groupBy("snap", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    piv = (
        cnt.groupBy("tok")
        .agg(
            F.coalesce(F.sum(F.when(F.col("snap") == "a", F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias("ca"),
            F.coalesce(F.sum(F.when(F.col("snap") == "b", F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias("cb"),
        )
        .localCheckpoint(eager=False)  # vstats + top both read it
    )
    vstats = piv.agg(
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).cast("bigint").alias("va"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).cast("bigint").alias("vb"),
        F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("vboth"),
        F.sum(F.when(F.col("ca") == 0, F.col("cb")).otherwise(0))
        .cast("bigint")
        .alias("oov_b"),
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    # count>=5 vocab-bounded rank window (q364 convention)
    w = Window.orderBy(F.desc(F.col("ca") + F.col("cb")), F.asc("tok"))
    top = (
        piv.where(F.col("ca") + F.col("cb") >= 5)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 50)
    )
    tv = top.crossJoin(F.broadcast(vstats)).selectExpr(
        "abs((ca * 2000000 + na) DIV (2 * na)"
        " - (cb * 2000000 + nb) DIV (2 * nb)) AS d"
    ).agg(F.sum("d").cast("bigint").alias("sabs"))
    return vstats.crossJoin(F.broadcast(tv)).selectExpr(
        "va AS vocab_a",
        "vb AS vocab_b",
        "CAST((vboth * 2000000 + (va + vb - vboth))"
        " DIV (2 * (va + vb - vboth)) AS DOUBLE) / 1e6 AS vocab_jaccard",
        "CAST((oov_b * 2000000 + nb) DIV (2 * nb) AS DOUBLE) / 1e6"
        " AS oov_token_share_b",
        "CAST(sabs AS DOUBLE) / 2e6 AS tv_distance_top50",
    )


# =====================================================================
# Quality-threshold retention curve (q390): the curation planning
# chart — rank every document by Flesch reading ease (the q195
# readability score; NULL-score docs last, doc_id tiebreak), cut into
# integer-rank deciles (two-phase total order, q381 convention), and
# report per decile how many documents and tokens survive plus the
# cumulative token share: "if we keep only the top-k quality deciles,
# how much data is left". Exact integer token sums; cumulative window
# on the 10-row decile frame; share on the 1e-6 half-up grid.
# =====================================================================
@q(
    "q390_quality_retention",
    r"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+')) AS words,
             GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
               AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS syllables,
             CAST(len(list_filter(string_split_regex(trim(lower(text)),
                  '\s+'), t -> t <> '')) AS BIGINT) AS ntok
      FROM documents
    ),
    s AS (
      SELECT doc_id, ntok,
             CASE WHEN words > 0
                  THEN ROUND(206.835
                             - 1.015 * (CAST(words AS DOUBLE) / sentences)
                             - 84.6 * (CAST(syllables AS DOUBLE) / words),
                             3)
             END AS flesch,
             CASE WHEN words > 0 THEN 0 ELSE 1 END AS fnull
      FROM c
    ),
    r AS (
      SELECT ntok,
             row_number() OVER (ORDER BY fnull, flesch DESC, doc_id)
               AS rn,
             (SELECT count(*) FROM s) AS n
      FROM s
    ),
    cells AS (
      SELECT CAST(((rn - 1) * 10) // n AS INT) AS decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM r GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM cells)
    SELECT decile, n_docs, n_tokens,
           CAST((SUM(n_tokens) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) * 2000000 + tot.tt)
                // (2 * tot.tt) AS DOUBLE) / 1e6 AS cum_token_share
    FROM cells, tot ORDER BY decile
    """,
)
def q390(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators.ranks import (
        two_phase_row_number,
    )
    from dbt_incremental_ci_spark.operators.text import (
        flesch_reading_ease,
    )

    docs = t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.size(_toks("text")).cast("bigint").alias("ntok"),
        flesch_reading_ease("text").alias("flesch"),
    ).withColumn(
        "fnull", F.when(F.col("flesch").isNull(), 1).otherwise(0)
    )
    ranked = two_phase_row_number(
        s,
        [F.asc("fnull"), F.desc("flesch"), F.asc("doc_id")],
        out_col="rn",
    )
    n = s.agg(F.count(F.lit(1)).alias("__n"))
    cells = (
        ranked.crossJoin(F.broadcast(n))
        .selectExpr("CAST(((rn - 1) * 10) DIV __n AS INT) AS decile", "ntok")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = cells.agg(F.sum("n_tokens").cast("bigint").alias("tt"))
    # 10-row decile frame: deliberate tiny cumulative window
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("__cum"),
            "tt",
        )
        .selectExpr(
            "decile",
            "n_docs",
            "n_tokens",
            "CAST((__cum * 2000000 + tt) DIV (2 * tt) AS DOUBLE) / 1e6"
            " AS cum_token_share",
        )
        .orderBy("decile")
    )
