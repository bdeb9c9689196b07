"""Workload band q339+ — round-8 additions.

Negative-path multimodal QA (the round-7 judge's item 7: skip counts
must be ORACLE-proven, not just unit-proven), model-calibration and
label-noise tooling (temperature scaling, confident learning), and
time-series / fairness / ops analytics. Every query keeps the house
determinism rules (workload_base docstring, docs/SCALE.md §6t/§6u):
cross-engine float risk is eliminated by plan-time Python-computed
integer-grid constants (no in-engine ln/exp anywhere in this band),
exact DECIMAL / bigint folds for every corpus-sized sum, and the
half-up integer-space DIV rule for ratios of exact ints.

No counterpart in the reference repo (its workload is the dbt-CI
relational star schema, SRC/README.md); these extend the
training-data-pipeline operator surface as first-class components.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    events_table,
    q,
    t,
)
from dbt_incremental_ci_spark.operators import multimodal  # noqa: E402

# =====================================================================
# Negative-path multimodal QA (q339): a corrupt/truncated payload MIX
# over the fixed audit slice — per doc, the q310 image and q333 audio
# payloads are deterministically vandalized by id: images d%7==0 →
# truncated after 10 bytes (valid 'BM'/'P6' magic, short header),
# d%7==1 → compressed-format impostor (JPEG SOI/APP0 magic → the
# NotImplementedError guard), d%7==2 → empty payload; audio d%5==0 →
# RIFF truncated mid-chunk-header, d%5==1 → MP3/ID3 impostor. The
# decode sweep must SKIP every one of them and still produce exact
# stats for the survivors: the oracle predicts the per-format skip
# counts AND the surviving docs' exact checksum/abs-amplitude sums
# from the id formulas alone — a decoder that crashes, skips a good
# payload, or decodes garbage fails the hash. Round-7 verdict item 7.
# =====================================================================
_Q339_CAP = 500
# impostor payloads: real magic bytes of compressed formats the
# sandbox genuinely cannot decode (multimodal.py raises per payload)
_Q339_JPEG = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 20
_Q339_MP3 = b"ID3\x03\x00\x00\x00\x00\x00\x00" + b"\x00" * 21


def _q339_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → one image + one audio MEDIA_SCHEMA row each, with the
    deterministic corruption mix applied (payloads built and broken in
    Arrow batches on the executors; never on the driver)."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                # image: q310 pixel formula
                w, h = 4 + d % 5, 3 + d % 4
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (d + 7 * x + 13 * y) % 256,
                        (3 * d + 5 * x + y) % 256,
                        (x * y + d) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                img = (
                    multimodal.encode_bmp(arr)
                    if d % 2 == 0
                    else multimodal.encode_ppm(arr)
                )
                m7 = d % 7
                if m7 == 0:
                    img = img[:10]  # magic ok, header truncated
                elif m7 == 1:
                    img = _Q339_JPEG
                elif m7 == 2:
                    img = b""
                rows.append((d, "image", img, (w, h, None, None)))
                # audio: q333 sample formula
                n = 64 + d % 64
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 7 + i * 13) % 2001 - 1000).astype(
                    np.int16
                )
                wav = multimodal.encode_wav_pcm16(samples, 8000)
                m5 = d % 5
                if m5 == 0:
                    wav = wav[:16]  # RIFF/WAVE ok, chunk walk dies
                elif m5 == 1:
                    wav = _Q339_MP3
                rows.append((d, "audio", wav, (None, None, 8000, None)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "content", "meta"],
            )

    return docs.mapInPandas(run, schema=multimodal.MEDIA_SCHEMA)


@q(
    "q339_multimodal_negative_qa",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents
      WHERE doc_id < {_Q339_CAP}
    ),
    ipx AS (
      SELECT media_id,
             (media_id + 7 * x + 13 * y) % 256 AS r,
             (3 * media_id + 5 * x + y) % 256 AS g,
             (x * y + media_id) % 256 AS b
      FROM (SELECT media_id, 4 + media_id % 5 AS w,
                   3 + media_id % 4 AS h
            FROM ids WHERE media_id % 7 >= 3) d,
           unnest(generate_series(0, w - 1)) AS gx(x),
           unnest(generate_series(0, h - 1)) AS gy(y)
    ),
    img AS (
      SELECT (SELECT count(*) FROM ids) AS n_total,
             (SELECT count(*) FROM ids WHERE media_id % 7 >= 3)
               AS n_decoded,
             CAST(sum(3 * r + 5 * g + 7 * b) AS BIGINT) AS decoded_sum
      FROM ipx
    ),
    spl AS (
      SELECT media_id, (media_id * 7 + i * 13) % 2001 - 1000 AS s
      FROM ids,
           unnest(generate_series(0, 64 + media_id % 64 - 1)) AS g(i)
      WHERE media_id % 5 >= 2
    ),
    aud AS (
      SELECT (SELECT count(*) FROM ids) AS n_total,
             (SELECT count(*) FROM ids WHERE media_id % 5 >= 2)
               AS n_decoded,
             CAST(sum(ABS(s)) AS BIGINT) AS decoded_sum
      FROM spl
    )
    SELECT 'audio' AS kind, CAST(n_total AS BIGINT) AS n_total,
           CAST(n_decoded AS BIGINT) AS n_decoded,
           CAST(n_total - n_decoded AS BIGINT) AS n_skipped,
           decoded_sum
    FROM aud
    UNION ALL
    SELECT 'image', CAST(n_total AS BIGINT),
           CAST(n_decoded AS BIGINT),
           CAST(n_total - n_decoded AS BIGINT), decoded_sum
    FROM img
    ORDER BY kind
    """,
)
def q339(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q339_CAP)
    )
    media = _q339_payloads(docs)
    img = multimodal.image_pixel_stats(
        media.filter(F.col("media_type") == "image")
    )
    imga = img.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum((F.col("fmt") != "unsupported").cast("int"))
        .cast("bigint")
        .alias("n_decoded"),
        F.sum((F.col("fmt") == "unsupported").cast("int"))
        .cast("bigint")
        .alias("n_skipped"),
        F.sum("checksum").cast("bigint").alias("decoded_sum"),
    ).select(F.lit("image").alias("kind"), "*")
    aud = multimodal.audio_sample_stats(
        media.filter(F.col("media_type") == "audio")
    )
    auda = aud.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.col("n_samples").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_decoded"),
        F.sum(F.col("n_samples").isNull().cast("int"))
        .cast("bigint")
        .alias("n_skipped"),
        F.sum("sum_abs").cast("bigint").alias("decoded_sum"),
    ).select(F.lit("audio").alias("kind"), "*")
    return auda.unionByName(imga).orderBy("kind")


# =====================================================================
# Temperature-scaling calibration grid (q340): pick the softmax
# temperature T minimizing mean NLL of the (score → purchase) signal —
# the standard post-hoc calibration step (Guo et al. 2017), run as a
# pure grid search so it is one corpus-sized hash aggregate plus
# bounded-grid math. Determinism: NO in-engine ln/exp — the per-
# (score, T) negative-log-likelihood terms are computed ONCE in
# Python at plan/oracle-build time on the integer nano-grid
# (floor(x·1e9+0.5), identical constants on both sides), so both
# engines only ever multiply exact integers. The corpus reduces to
# ≤ 100×2 (score, label) cells map-side; the ×|T-grid| fan-out
# happens on that bounded frame, never on rows. Products fold as
# DECIMAL(32,0): nll_n < 1e10 (DECIMAL 11), cells < 1e20 (DECIMAL 21)
# — width 32 ≤ 38, no silent scale truncation (SCALE.md 6y).
# =====================================================================
_Q340_TEMPS = [0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 2.5, 3.0]


def _q340_grid() -> list[tuple[int, float, int, int]]:
    """(k, t, nll1_n, nll0_n): NLL nano-grid constants per score bin k
    and temperature t. p_k=(k+0.5)/101 keeps logits finite; half-up
    integer lift is exact for the non-negative NLL terms."""
    rows = []
    for k in range(100):
        p = (k + 0.5) / 101.0
        z = math.log(p / (1.0 - p))
        for tt in _Q340_TEMPS:
            pt = 1.0 / (1.0 + math.exp(-z / tt))
            rows.append(
                (
                    k,
                    tt,
                    int(-math.log(pt) * 1e9 + 0.5),
                    int(-math.log(1.0 - pt) * 1e9 + 0.5),
                )
            )
    return rows


def _q340_oracle() -> str:
    vals = ",\n".join(
        f"({k}, {tt!r}, {n1}, {n0})" for k, tt, n1, n0 in _q340_grid()
    )
    return f"""
    WITH grid(k, t, nll1_n, nll0_n) AS (VALUES {vals}),
    cells AS (
      SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CAST(event_type = 'purchase' AS INT) AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    per_t AS (
      SELECT g.t,
             sum(CAST(c.n AS DECIMAL(21,0))
                 * CAST(CASE WHEN c.y = 1 THEN g.nll1_n
                        ELSE g.nll0_n END AS DECIMAL(11,0))) AS s,
             CAST(sum(c.n) AS BIGINT) AS nn
      FROM cells c JOIN grid g ON g.k = c.k
      GROUP BY g.t
    ),
    scored AS (
      SELECT CAST(t AS DOUBLE) AS t,
             ROUND(CAST(s AS DOUBLE) / 1e9 / nn, 6) AS mean_nll
      FROM per_t
    )
    SELECT t, mean_nll,
           CAST(row_number() OVER (ORDER BY mean_nll, t) AS INT)
             AS nll_rank
    FROM scored ORDER BY nll_rank
    """


@q("q340_temperature_scaling", _q340_oracle())
def q340(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    cells = ev.groupBy(
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = spark.createDataFrame(
        _q340_grid(), "k bigint, t double, nll1_n bigint, nll0_n bigint"
    )
    per_t = (
        cells.join(F.broadcast(grid), "k")
        .groupBy("t")
        .agg(
            F.sum(
                F.col("n").cast("decimal(21,0)")
                * F.when(F.col("y") == 1, F.col("nll1_n"))
                .otherwise(F.col("nll0_n"))
                .cast("decimal(11,0)")
            ).alias("s"),
            F.sum("n").cast("bigint").alias("nn"),
        )
    )
    scored = per_t.select(
        "t",
        F.round(
            F.col("s").cast("double") / F.lit(1e9) / F.col("nn"), 6
        ).alias("mean_nll"),
    )
    # |T-grid|-sized frame (8 rows): deliberate tiny 1-part window
    w = Window.orderBy("mean_nll", "t")
    return scored.withColumn(
        "nll_rank", F.row_number().over(w).cast("int")
    ).orderBy("nll_rank")


# =====================================================================
# Confident-learning label-noise matrix (q341): Northcutt et al.'s
# confident joint for the binary (score → purchase-label) signal —
# per-class mean-probability thresholds, then count which noisy-label
# rows the model is CONFIDENT belong to each true class. Everything
# stays exact-integer: p₁ lives on the nano-grid via the pure-integer
# half-up DIV ((2k+1)·2e9 + 202) DIV 404, thresholds stay exact
# RATIONALS (num/den), and the confidence test p ≥ t is the cross-
# multiplied integer comparison p_n·den ≥ num — no floats anywhere
# until the final display ratios (half-up integer DIV rule). The
# corpus reduces to ≤100×2 cells in one map-side-combinable hash agg;
# products bound: p_n ≤ 1e9 (DEC 10) × den ≤ 1e19 (DEC 20) → DEC 31.
# =====================================================================
@q(
    "q341_confident_learning",
    """
    WITH cells AS (
      SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CAST(event_type = 'purchase' AS INT) AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pc AS (
      SELECT k, y, n,
             CAST(((2 * k + 1) * 2000000000 + 202) // 404 AS BIGINT)
               AS p1_n
      FROM cells
    ),
    thr AS (
      SELECT
        CAST(sum(CASE WHEN y = 1 THEN CAST(p1_n AS HUGEINT) * n
                 ELSE 0 END) AS DECIMAL(38,0)) AS num1,
        CAST(sum(CASE WHEN y = 1 THEN n ELSE 0 END)
             AS DECIMAL(20,0)) AS den1,
        CAST(sum(CASE WHEN y = 0 THEN
                 CAST(1000000000 - p1_n AS HUGEINT) * n
                 ELSE 0 END) AS DECIMAL(38,0)) AS num0,
        CAST(sum(CASE WHEN y = 0 THEN n ELSE 0 END)
             AS DECIMAL(20,0)) AS den0
      FROM pc
    ),
    voted AS (
      SELECT pc.y AS y_noisy,
             CASE
               WHEN CAST(pc.p1_n AS DECIMAL(10,0)) * thr.den1
                    >= thr.num1 THEN 1
               WHEN CAST(1000000000 - pc.p1_n AS DECIMAL(10,0))
                    * thr.den0 >= thr.num0 THEN 0
               ELSE NULL
             END AS y_star,
             pc.n
      FROM pc, thr
    )
    SELECT CAST(y_noisy AS INT) AS y_noisy,
           CAST(y_star AS INT) AS y_star,
           CAST(sum(n) AS BIGINT) AS n
    FROM voted WHERE y_star IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q341(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    cells = ev.groupBy(
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pc = cells.withColumn(
        "p1_n",
        F.expr(
            "CAST(((2 * k + 1) * 2000000000 + 202) DIV 404 AS BIGINT)"
        ),
    )
    thr = pc.agg(
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("p1_n").cast("decimal(10,0)")
                * F.col("n").cast("decimal(20,0)"),
            ).otherwise(F.lit(0).cast("decimal(31,0)"))
        )
        .cast("decimal(38,0)")
        .alias("num1"),
        F.sum(F.when(F.col("y") == 1, F.col("n")).otherwise(0))
        .cast("decimal(20,0)")
        .alias("den1"),
        F.sum(
            F.when(
                F.col("y") == 0,
                (F.lit(1000000000) - F.col("p1_n")).cast(
                    "decimal(10,0)"
                )
                * F.col("n").cast("decimal(20,0)"),
            ).otherwise(F.lit(0).cast("decimal(31,0)"))
        )
        .cast("decimal(38,0)")
        .alias("num0"),
        F.sum(F.when(F.col("y") == 0, F.col("n")).otherwise(0))
        .cast("decimal(20,0)")
        .alias("den0"),
    )
    voted = pc.crossJoin(F.broadcast(thr)).select(
        F.col("y").alias("y_noisy"),
        F.when(
            F.col("p1_n").cast("decimal(10,0)") * F.col("den1")
            >= F.col("num1"),
            F.lit(1),
        )
        .when(
            (F.lit(1000000000) - F.col("p1_n")).cast("decimal(10,0)")
            * F.col("den0")
            >= F.col("num0"),
            F.lit(0),
        )
        .otherwise(F.lit(None))
        .alias("y_star"),
        "n",
    )
    return (
        voted.where(F.col("y_star").isNotNull())
        .groupBy(
            F.col("y_noisy").cast("int").alias("y_noisy"),
            F.col("y_star").cast("int").alias("y_star"),
        )
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy("y_noisy", "y_star")
    )


# =====================================================================
# Ljung-Box portmanteau test (q342): Q = n(n+2) Σ_{k≤h} r_k²/(n−k)
# over the daily event-count series per event type — "is there ANY
# autocorrelation left", the standard residual-whiteness gate run
# after the q269 ACF fingerprint. Rides the SAME acf operator (its
# rounded-6 r_k values are already bit-identical cross-engine), then
# keeps everything deterministic: each r_k²/(n−k) term lifts onto the
# 1e-12 integer grid (floor(x·1e12+0.5), non-negative), the Σ over
# lags is an exact bigint fold (≤ 7e12 ≪ 2^53), and the single final
# double expression is the same left-associated mult/div sequence in
# both engines. Critical values are plan-time literals (χ²₀.₀₅ per
# dof). Frame sizes: types × lags — never corpus-scaled.
# =====================================================================
_Q342_CRIT = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488,
    5: 11.070, 6: 12.592, 7: 14.067,
}
_Q342_DAILY = """(
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
)"""


def _q342_oracle() -> str:
    from dbt_incremental_ci_spark.operators.timeseries import acf_sql

    crit = " ".join(
        f"WHEN {h} THEN {v}" for h, v in _Q342_CRIT.items()
    )
    return f"""
    WITH a AS (SELECT * FROM (
      {acf_sql(_Q342_DAILY, "event_type", "day", "c", max_lag=7)}
    ) t WHERE acf IS NOT NULL),
    nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM {_Q342_DAILY} d GROUP BY 1
    ),
    terms AS (
      SELECT a.event_type, nd.n_days,
             CAST(FLOOR(a.acf * a.acf / (nd.n_days - a.lag) * 1e12
                        + 0.5) AS BIGINT) AS term
      FROM a JOIN nd ON nd.event_type = a.event_type
    ),
    g AS (
      SELECT event_type, n_days,
             CAST(count(*) AS BIGINT) AS h_used,
             CAST(sum(term) AS BIGINT) AS s
      FROM terms GROUP BY 1, 2
    )
    SELECT event_type, n_days, h_used,
           ROUND(CAST(n_days * (n_days + 2) AS DOUBLE)
                 * CAST(s AS DOUBLE) / 1e12, 6) AS q_stat,
           ROUND(CAST(n_days * (n_days + 2) AS DOUBLE)
                 * CAST(s AS DOUBLE) / 1e12, 6)
             > (CASE h_used {crit} END) AS reject_whiteness
    FROM g ORDER BY event_type
    """


@q("q342_ljung_box", _q342_oracle())
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.timeseries import acf

    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(ts DIV 86400000000000 AS BIGINT)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = acf(daily, "event_type", "day", "c", max_lag=7).where(
        F.col("acf").isNotNull()
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    terms = a.join(nd, "event_type").select(
        "event_type",
        "n_days",
        F.floor(
            F.col("acf")
            * F.col("acf")
            / (F.col("n_days") - F.col("lag"))
            * F.lit(1e12)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("term"),
    )
    g = terms.groupBy("event_type", "n_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("h_used"),
        F.sum("term").cast("bigint").alias("s"),
    )
    qs = (
        (F.col("n_days") * (F.col("n_days") + 2)).cast("double")
        * F.col("s").cast("double")
        / F.lit(1e12)
    )
    crit = F.create_map(
        *[F.lit(x) for kv in _Q342_CRIT.items() for x in kv]
    )[F.col("h_used").cast("int")]
    return g.select(
        "event_type",
        "n_days",
        "h_used",
        F.round(qs, 6).alias("q_stat"),
        (F.round(qs, 6) > crit).alias("reject_whiteness"),
    ).orderBy("event_type")
