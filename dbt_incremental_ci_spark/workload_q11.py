"""Workload band q357-q364 — round-8 second batch.

Cluster-quality and segmentation analytics (simplified silhouette,
RFM quintile segmentation), the bucketed interval-overlap range join
(session concurrency), privacy release (ε-DP clipped mean, the
sum/count companion to q355's histogram), multimodal depth on the
REAL in-sandbox codecs (perceptual average-hash dedup candidates,
scene-change keyframe selection, storage shard planning off exact
encoder byte formulas), and corpus vocabulary health (Church-Gale
term burstiness / variance-to-mean stopword census).

House determinism rules throughout (workload_base docstring): exact
integer / DECIMAL sufficient statistics for every corpus-sized fold,
rounded-6 cosines on the embstats micro-grid, hash-derived Laplace
noise on the ROUND-9 grid (the q355 recipe), id tiebreaks on every
rank, and the integer-DIV rule for quintile scores.

No counterpart in the reference repo (its workload is the dbt-CI
relational star schema, SRC/README.md); these extend the
training-data-pipeline operator surface as first-class components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    events_table,
    q,
    t,
)
from dbt_incremental_ci_spark.operators import multimodal  # noqa: E402
from dbt_incremental_ci_spark.operators.embstats import (  # noqa: E402
    simplified_silhouette,
    simplified_silhouette_sql,
)
from dbt_incremental_ci_spark.operators.intervals import (  # noqa: E402
    overlap_pairs,
)
from dbt_incremental_ci_spark.operators.ranks import (  # noqa: E402
    two_phase_row_number,
)
from dbt_incremental_ci_spark.operators.text import tokens  # noqa: E402
from dbt_incremental_ci_spark.workload_q9 import (  # noqa: E402
    _q310_payloads,
    _q333_payloads,
    _q335_payloads,
    _Q310_CAP,
    _Q335_CAP,
)


# =====================================================================
# Simplified silhouette (q357): centroid-based cluster-quality score
# per embedding label — the linear-time variant of Rousseeuw's
# silhouette (the classic is all-pairs quadratic), with the
# negative-silhouette share as the "label bleed" diagnostic. Rides
# the q238 collected-model MAP-ONLY scoring machinery; the corpus
# never shuffles for the model.
# =====================================================================
@q(
    "q357_simplified_silhouette",
    simplified_silhouette_sql("embeddings", "embedding", "vec_id", "label"),
)
def q357(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return simplified_silhouette(emb, "embedding", "vec_id", "label")


# =====================================================================
# RFM segmentation (q358): the classic recency/frequency/monetary
# quintile census over purchase events. Quintile scores are INTEGER
# rank arithmetic (score = 5 − ((rank−1)·5) DIV n — exact in both
# engines, no quantile interpolation); every rank is a user-frame
# total order computed with the ranks.py two-phase machinery (no
# data-sized single-partition exchange); monetary sums are exact
# DECIMAL(18,2). Output ≤ 125 segment cells.
# =====================================================================
@q(
    "q358_rfm_segments",
    """
    WITH pur AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
             CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    per AS (
      SELECT user_id, max(sec) AS last_sec,
             CAST(count(*) AS BIGINT) AS freq, sum(v) AS mon
      FROM pur GROUP BY user_id
    ),
    mx AS (SELECT max(last_sec) AS m FROM per),
    ranked AS (
      SELECT user_id, freq, mon,
             (m - last_sec) // 86400 AS rec_days,
             row_number() OVER (ORDER BY (m - last_sec) // 86400,
                                user_id) AS rr,
             row_number() OVER (ORDER BY freq DESC, user_id) AS rf,
             row_number() OVER (ORDER BY mon DESC, user_id) AS rm,
             count(*) OVER () AS nu
      FROM per, mx
    )
    SELECT CAST(5 - ((rr - 1) * 5) // nu AS INT) AS r_score,
           CAST(5 - ((rf - 1) * 5) // nu AS INT) AS f_score,
           CAST(5 - ((rm - 1) * 5) // nu AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_users,
           ROUND(CAST(sum(mon) AS DOUBLE), 2) AS monetary_total
    FROM ranked
    GROUP BY 1, 2, 3
    """,
)
def q358(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("sec"),
        F.round(F.col("value"), 2).cast("decimal(18,2)").alias("v"),
    )
    per = pur.groupBy("user_id").agg(
        F.max("sec").alias("last_sec"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("v").alias("mon"),
    )
    mx = per.agg(F.max("last_sec").alias("__m"))
    base = per.crossJoin(F.broadcast(mx)).withColumn(
        "rec_days", F.expr("(__m - last_sec) DIV 86400")
    )
    r1 = two_phase_row_number(
        base, [F.asc("rec_days"), F.asc("user_id")], out_col="rr"
    )
    r2 = two_phase_row_number(
        r1, [F.desc("freq"), F.asc("user_id")], out_col="rf"
    )
    r3 = two_phase_row_number(
        r2, [F.desc("mon"), F.asc("user_id")], out_col="rm"
    )
    nu = per.agg(F.count(F.lit(1)).alias("__nu"))
    scored = r3.crossJoin(F.broadcast(nu)).selectExpr(
        "CAST(5 - ((rr - 1) * 5) DIV __nu AS INT) AS r_score",
        "CAST(5 - ((rf - 1) * 5) DIV __nu AS INT) AS f_score",
        "CAST(5 - ((rm - 1) * 5) DIV __nu AS INT) AS m_score",
        "mon",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.sum("mon").cast("double"), 2).alias("monetary_total"),
    )


# =====================================================================
# Session concurrency via the interval-overlap range join (q359):
# gap-sessionize a fixed user sample (q182's 30-minute rule,
# user_id % 10 = 0), then find every cross-user pair of overlapping
# session intervals with operators/intervals.overlap_pairs — the
# bucketed range join (hour buckets, pair counted once at the later
# start's bucket; no all-pairs product reaches the planner). Same-user
# pairs are impossible by construction (gap sessions are disjoint).
# The oracle runs the plain theta self-join. Census by hour-of-day.
# =====================================================================
@q(
    "q359_session_overlap",
    """
    WITH flagged AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS sec, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL THEN 1
                  WHEN date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM events WHERE user_id % 10 = 0
    ),
    sess AS (
      SELECT user_id, sec,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY sec, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM flagged
    ),
    iv AS (
      SELECT user_id * 1000000 + sid AS id,
             min(sec) AS s, max(sec) + 1 AS e
      FROM sess GROUP BY user_id, sid
    ),
    pr AS (
      SELECT greatest(a.s, b.s) AS ov_s,
             least(a.e, b.e) AS ov_e
      FROM iv a JOIN iv b
        ON a.id < b.id AND a.s < b.e AND b.s < a.e
    )
    SELECT CAST((ov_s % 86400) // 3600 AS INT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov_e - ov_s) AS BIGINT) AS total_overlap_sec,
           ROUND(sum(ov_e - ov_s) / CAST(count(*) AS DOUBLE), 6)
             AS avg_overlap_sec
    FROM pr GROUP BY 1
    """,
)
def q359(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).filter(
        F.col("user_id") % 10 == 0
    ).withColumn("sec", F.expr("CAST(ts DIV 1000000000 AS BIGINT)"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("sec").over(w)
    is_new = (
        F.when(prev_sec.isNull(), 1)
        .when(F.col("sec") - prev_sec > 1800, 1)
        .otherwise(0)
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.withColumn("__new", is_new).withColumn(
        "sid", F.sum("__new").over(ws)
    )
    # session ordinal < 1e6 per user at any shipped SF (events per
    # user are bounded); a 100 TB deployment widens the id factor
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("sec").alias("start"), (F.max("sec") + 1).alias("end")
    ).select(
        (F.col("user_id") * 1000000 + F.col("sid")).alias("iv_id"),
        "start",
        "end",
    )
    pairs = overlap_pairs(
        iv, id_col="iv_id", start_col="start", end_col="end",
        bucket_width=3600,
    )
    return pairs.groupBy(
        F.expr("CAST((ov_start % 86400) DIV 3600 AS INT)").alias(
            "hour_of_day"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("overlap").cast("bigint").alias("total_overlap_sec"),
        F.round(
            F.sum("overlap") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_overlap_sec"),
    )


# =====================================================================
# ε-DP clipped mean release (q360): per-source mean of n_chars with
# per-record clipping at C=800 — noisy-sum / noisy-count with
# Laplace(C/ε_s) and Laplace(1/ε_n), ε_s = ε_n = 0.5 (sequential
# composition: the release costs ε = 1). Noise is the q355
# deterministic hash-Laplace (inverse CDF on the house md5 uniform,
# strictly interior, ROUND-9 before the add). True stats kept
# alongside for the audit. Cells are source-bounded; the clip +
# sum is one exact-integer hash aggregate.
# =====================================================================
@q(
    "q360_dp_clipped_mean",
    """
    WITH cells AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(least(n_chars, 800)) AS BIGINT) AS clip_sum
      FROM documents GROUP BY source
    ),
    noised AS (
      SELECT source, n, clip_sum,
             (('0x' || substr(md5(source || ':dpcs'), 1, 8))::BIGINT
              + 0.5) / 4294967296.0 AS us,
             (('0x' || substr(md5(source || ':dpcn'), 1, 8))::BIGINT
              + 0.5) / 4294967296.0 AS un
      FROM cells
    ),
    rel AS (
      SELECT source, n, clip_sum,
             ROUND(CASE WHEN us < 0.5 THEN 1600.0 * ln(2.0 * us)
                   ELSE -1600.0 * ln(2.0 * (1.0 - us)) END, 9)
               AS noise_sum,
             ROUND(CASE WHEN un < 0.5 THEN 2.0 * ln(2.0 * un)
                   ELSE -2.0 * ln(2.0 * (1.0 - un)) END, 9) AS noise_n
      FROM noised
    )
    SELECT source, n,
           ROUND(clip_sum / CAST(n AS DOUBLE), 6) AS true_clipped_mean,
           ROUND((clip_sum + noise_sum) / (n + noise_n), 6)
             AS released_mean,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM rel ORDER BY source
    """,
)
def q360(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    cells = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.least(F.col("n_chars"), F.lit(800)))
        .cast("bigint")
        .alias("clip_sum"),
    )

    def lap(salt: str, scale: float):
        u32 = F.conv(
            F.substring(
                F.md5(F.concat(F.col("source"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        u = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
        return F.round(
            F.when(u < 0.5, F.lit(scale) * F.log(2.0 * u)).otherwise(
                F.lit(-scale) * F.log(2.0 * (F.lit(1.0) - u))
            ),
            9,
        )

    return cells.select(
        "source",
        "n",
        F.round(F.col("clip_sum") / F.col("n").cast("double"), 6).alias(
            "true_clipped_mean"
        ),
        F.round(
            (F.col("clip_sum") + lap(":dpcs", 1600.0))
            / (F.col("n") + lap(":dpcn", 2.0)),
            6,
        ).alias("released_mean"),
        F.lit(1.0).cast("double").alias("epsilon"),
    ).orderBy("source")


# =====================================================================
# Perceptual average-hash dedup candidates (q361): aHash over the
# REAL decoded q310 image slice — 8×8 luminance grid from the decoded
# pixels, bit = cell brighter than the grid mean (strict integer
# compare), 64-bit hash as two 32-bit halves. Census: per popcount,
# image count and the number of hash values shared by ≥2 images
# (exact dup-candidate groups — the production blocking key for
# near-dup image dedup). The oracle regenerates the sampled grid from
# the pixel formula, so a row-flip / channel-swap / index-remap bug
# in decode OR hashing shifts bits and fails the hash.
# =====================================================================
@q(
    "q361_image_ahash",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    cells AS (
      SELECT media_id, yy * 8 + xx AS i,
             ((media_id + 7 * ((xx * w) // 8) + 13 * ((yy * h) // 8))
              % 256
              + (3 * media_id + 5 * ((xx * w) // 8) + ((yy * h) // 8))
              % 256
              + (((xx * w) // 8) * ((yy * h) // 8) + media_id) % 256)
               AS gray
      FROM ids,
           unnest(generate_series(0, 7)) AS gy(yy),
           unnest(generate_series(0, 7)) AS gx(xx)
    ),
    tot AS (
      SELECT media_id, sum(gray) AS total FROM cells GROUP BY media_id
    ),
    hashes AS (
      SELECT c.media_id,
             CAST(sum(CASE WHEN c.gray * 64 > t.total AND c.i >= 32
                      THEN (CAST(1 AS BIGINT) << (c.i - 32))
                      ELSE 0 END) AS BIGINT) AS hash_hi,
             CAST(sum(CASE WHEN c.gray * 64 > t.total AND c.i < 32
                      THEN (CAST(1 AS BIGINT) << c.i)
                      ELSE 0 END) AS BIGINT) AS hash_lo,
             CAST(sum(CASE WHEN c.gray * 64 > t.total
                      THEN 1 ELSE 0 END) AS INT) AS popcount
      FROM cells c JOIN tot t ON c.media_id = t.media_id
      GROUP BY c.media_id
    ),
    groups AS (
      SELECT popcount, hash_hi, hash_lo, count(*) AS ng
      FROM hashes GROUP BY 1, 2, 3
    )
    SELECT popcount,
           CAST(sum(ng) AS BIGINT) AS n_images,
           CAST(sum(CASE WHEN ng >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_hashes
    FROM groups GROUP BY popcount
    """,
)
def q361(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )
    ah = multimodal.image_ahash(_q310_payloads(docs), grid=8)
    groups = ah.groupBy("popcount", "hash_hi", "hash_lo").agg(
        F.count(F.lit(1)).alias("__ng")
    )
    return groups.groupBy("popcount").agg(
        F.sum("__ng").cast("bigint").alias("n_images"),
        F.sum(F.when(F.col("__ng") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_hashes"),
    )


# =====================================================================
# Scene-change keyframe selection (q362): per video of the REAL q335
# AVI slice, the frame maximizing the exact L1 pixel distance to its
# predecessor (frame-ascending tiebreak). The oracle regenerates BOTH
# frames of every consecutive pair from the pixel formula and replays
# the argmax — a decoder that drops/reorders frames or mangles a
# channel moves the L1 sums and fails the hash.
# =====================================================================
@q(
    "q362_video_keyframe",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             3 + doc_id % 3 AS nf
      FROM documents WHERE doc_id < {_Q335_CAP}
    ),
    diffs AS (
      SELECT media_id, nf, f,
             sum(abs((media_id + 7 * x + 13 * y + 17 * f) % 256
                     - (media_id + 7 * x + 13 * y + 17 * (f - 1)) % 256)
               + abs((3 * media_id + 5 * x + y + 29 * f) % 256
                     - (3 * media_id + 5 * x + y + 29 * (f - 1)) % 256)
               + abs((x * y + media_id + 23 * f) % 256
                     - (x * y + media_id + 23 * (f - 1)) % 256))
               AS l1
      FROM ids,
           unnest(generate_series(1, nf - 1)) AS gf(f),
           unnest(generate_series(0, w - 1)) AS gx(x),
           unnest(generate_series(0, h - 1)) AS gy(y)
      GROUP BY media_id, nf, f
    ),
    best AS (
      SELECT media_id, nf, f, l1,
             row_number() OVER (PARTITION BY media_id
                                ORDER BY l1 DESC, f) AS rn
      FROM diffs
    )
    SELECT media_id, CAST(nf AS INT) AS n_frames,
           CAST(CASE WHEN l1 = 0 THEN 0 ELSE f END AS INT)
             AS keyframe_idx,
           CAST(l1 AS BIGINT) AS max_l1
    FROM best WHERE rn = 1
    """,
)
def q362(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q335_CAP)
    )
    return multimodal.video_keyframe(_q335_payloads(docs))


# =====================================================================
# Media storage shard plan (q363): per modality, exact payload byte
# totals and the shard layout a 256 KiB-target writer would produce —
# the "how many output files will this corpus be" ops census. Spark
# measures length(content) on the REAL encoded payloads; the oracle
# computes every byte from the container formats' closed-form size
# formulas (BMP 54+h·stride, PPM 11+3wh at single-digit dims,
# WAV 44+2n, AVI 224+nf·(8+stride·h) — verified against the
# encoders), so a header/padding/layout change in any encoder fails
# the hash. At 100 TB the target is 512 MB and the math is identical.
# =====================================================================
_Q363_TARGET = 262144  # 256 KiB test-scale shard target


@q(
    "q363_media_shard_plan",
    f"""
    WITH img AS (
      SELECT 'image' AS modality,
             CASE WHEN doc_id % 2 = 0
                  THEN 54 + (3 + doc_id % 4)
                       * (((3 * (4 + doc_id % 5) + 3) // 4) * 4)
                  ELSE 11 + 3 * (4 + doc_id % 5) * (3 + doc_id % 4)
             END AS bytes
      FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    aud AS (
      SELECT 'audio' AS modality, 44 + 2 * (64 + doc_id % 64) AS bytes
      FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    vid AS (
      SELECT 'video' AS modality,
             224 + (3 + doc_id % 3)
             * (8 + (((3 * (4 + doc_id % 5) + 3) // 4) * 4)
                * (3 + doc_id % 4)) AS bytes
      FROM documents WHERE doc_id < {_Q335_CAP}
    ),
    allm AS (
      SELECT * FROM img UNION ALL SELECT * FROM aud
      UNION ALL SELECT * FROM vid
    )
    SELECT modality, CAST(count(*) AS BIGINT) AS n_payloads,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(max(bytes) AS BIGINT) AS max_bytes,
           CAST((sum(bytes) + {_Q363_TARGET} - 1) // {_Q363_TARGET}
                AS BIGINT) AS n_shards,
           ROUND(sum(bytes) * 100.0
                 / (((sum(bytes) + {_Q363_TARGET} - 1)
                     // {_Q363_TARGET}) * {_Q363_TARGET}), 6)
             AS fill_pct
    FROM allm GROUP BY modality
    """,
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )
    vdocs = docs.where(F.col("doc_id") < _Q335_CAP)
    allm = (
        _q310_payloads(docs)
        .select(F.lit("image").alias("modality"), "content")
        .unionAll(
            _q333_payloads(docs).select(
                F.lit("audio").alias("modality"), "content"
            )
        )
        .unionAll(
            _q335_payloads(vdocs).select(
                F.lit("video").alias("modality"), "content"
            )
        )
        .select("modality", F.length("content").alias("bytes"))
    )
    tgt = F.lit(_Q363_TARGET)
    agg = allm.groupBy("modality").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.max("bytes").cast("bigint").alias("max_bytes"),
    )
    shards = F.expr(
        f"(total_bytes + {_Q363_TARGET} - 1) DIV {_Q363_TARGET}"
    )
    return agg.select(
        "modality",
        "n_payloads",
        "total_bytes",
        "max_bytes",
        shards.cast("bigint").alias("n_shards"),
        F.round(
            F.col("total_bytes") * 100.0 / (shards * tgt), 6
        ).alias("fill_pct"),
    )


# =====================================================================
# Church-Gale term burstiness (q364): variance-to-mean ratio of
# per-document term counts (zeros included via the sufficient-stats
# identity vmr = (N·Σc² − cf²)/(N·cf)) plus the per-containing-doc
# mean cf/df — the clumping census that separates topical terms
# (bursty) from function words (Poisson-flat); the classic stopword /
# boilerplate detector signal. One (doc,term) hash agg then one
# term-keyed agg; products run in DECIMAL(38,0) so the integer
# identity is exact in both engines at any corpus size. Top 20 by
# VMR (term-ascending tiebreak) among terms with df ≥ 20; the rank
# runs on the df-filtered vocab-bounded frame.
# =====================================================================
@q(
    "q364_term_burstiness",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    per AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(toks) AS w FROM tk)
      GROUP BY doc_id, w
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    st AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS cf,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM per GROUP BY term
    ),
    v AS (
      SELECT term, df, cf,
             ROUND(CAST(CAST(n_docs AS DECIMAL(19,0))
                        * CAST(s2 AS DECIMAL(19,0))
                        - CAST(cf AS DECIMAL(19,0))
                          * CAST(cf AS DECIMAL(19,0)) AS DOUBLE)
                   / CAST(CAST(n_docs AS DECIMAL(19,0))
                          * CAST(cf AS DECIMAL(19,0)) AS DOUBLE), 6)
               AS vmr,
             ROUND(cf / CAST(df AS DOUBLE), 6) AS burstiness
      FROM st, nd WHERE df >= 20
    )
    SELECT term, df, cf, burstiness, vmr, rnk FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY vmr DESC, term)
                     AS INT) AS rnk
      FROM v
    ) WHERE rnk <= 20
    """,
)
def q364(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(tokens(F.trim(F.lower(F.col("text"))))).alias("term"),
    )
    per = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = per.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("cf"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    v = (
        st.where(F.col("df") >= 20)
        .crossJoin(F.broadcast(nd))
        .select(
            "term",
            "df",
            "cf",
            F.round(F.col("cf") / F.col("df").cast("double"), 6).alias(
                "burstiness"
            ),
            F.round(
                (
                    dec("n_docs") * dec("s2") - dec("cf") * dec("cf")
                ).cast("double")
                / (dec("n_docs") * dec("cf")).cast("double"),
                6,
            ).alias("vmr"),
        )
    )
    # vocab-bounded frame (df >= 20 terms): deliberate tiny window
    w = Window.orderBy(F.desc("vmr"), F.asc("term"))
    return (
        v.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 20)
        .select("term", "df", "cf", "burstiness", "vmr", "rnk")
    )
