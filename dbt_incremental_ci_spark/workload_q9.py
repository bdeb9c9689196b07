"""q310+: round-7 build additions — the real-image-decode proof band
(the r06 verdict item-4 path: BMP/PPM decode is now REAL in-sandbox,
so the pixel pipeline gets a full value oracle) plus this round's
operator batches.

Split-module registration contract: see ``workload`` (the hub) and
``workload_base`` (registries + determinism rules).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.workload_base import (
    events_table,
    q,
    t,
)

# =====================================================================
# Real image decode proof (q310): synthesize a deterministic gradient
# image per document on the FIXED audit slice (doc_id < 500 — QA
# samples don't grow with the corpus, §6o), encode it as a REAL
# on-disk format (BMP 24-bit for even ids — exercising bottom-up row
# order, BGR channel order and 4-byte row padding — and binary PPM P6
# for odd ids, top-down RGB unpadded), decode with the pure-numpy
# decoder (operators/multimodal.decode_image), and report EXACT
# integer channel sums + a weighted pixel checksum. The oracle never
# sees a byte of image data: it recomputes the sums from the pixel
# FORMULA in closed form, so any decoder defect (row flip, channel
# swap, padding slip) shifts the sums and fails the hash — a true
# differential proof of the codec, not a round-trip tautology.
# Every output column is an exact integer; no float rounding anywhere.
# ref: multimodal stubs removed per VERDICT r06 item 4.
# =====================================================================
from dbt_incremental_ci_spark.operators import multimodal  # noqa: E402

_Q310_CAP = 500


def _q310_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → MEDIA_SCHEMA rows with real BMP/PPM payloads, built in
    Arrow batches on the executors (payloads never touch the driver)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
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
                payload = (
                    multimodal.encode_bmp(arr)
                    if d % 2 == 0
                    else multimodal.encode_ppm(arr)
                )
                rows.append((d, "image", payload, (w, h, None, None)))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "content", "meta"]
            )

    return docs.mapInPandas(run, schema=multimodal.MEDIA_SCHEMA)


@q(
    "q310_image_decode_stats",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    dims AS (
      SELECT media_id,
             CAST(4 + media_id % 5 AS BIGINT) AS w,
             CAST(3 + media_id % 4 AS BIGINT) AS h
      FROM ids
    ),
    px AS (
      SELECT media_id, w, h,
             (media_id + 7 * x + 13 * y) % 256 AS r,
             (3 * media_id + 5 * x + y) % 256 AS g,
             (x * y + media_id) % 256 AS b
      FROM dims,
           unnest(generate_series(0, w - 1)) AS gx(x),
           unnest(generate_series(0, h - 1)) AS gy(y)
    )
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(3 * r + 5 * g + 7 * b) AS BIGINT) AS checksum
    FROM px
    GROUP BY media_id
    """,
)
def q310(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )
    return multimodal.image_pixel_stats(_q310_payloads(docs))


# =====================================================================
# Real resize proof (q311): the q310 payloads pushed through the REAL
# nearest-neighbor resize (decode → index remap → PPM re-encode) and
# re-decoded for exact integer stats. The oracle recomputes the
# resized pixels in closed form from the index map
# (src_x = X*w DIV W, src_y = Y*h DIV H — the exact arithmetic
# resize_images uses), so resample-grid bugs (off-by-one, transposed
# axes, wrong rounding) shift the sums and fail the hash. All-integer
# output; volume = fixed audit slice × 6×5 pixels.
# =====================================================================
_Q311_W, _Q311_H = 6, 5


@q(
    "q311_image_resize_stats",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    dims AS (
      SELECT media_id,
             CAST(4 + media_id % 5 AS BIGINT) AS w,
             CAST(3 + media_id % 4 AS BIGINT) AS h
      FROM ids
    ),
    px AS (
      SELECT media_id,
             ((gx.xx * w) // {_Q311_W}) AS x,
             ((gy.yy * h) // {_Q311_H}) AS y,
             w, h
      FROM dims,
           unnest(generate_series(0, {_Q311_W - 1})) AS gx(xx),
           unnest(generate_series(0, {_Q311_H - 1})) AS gy(yy)
    ),
    rgb AS (
      SELECT media_id,
             (media_id + 7 * x + 13 * y) % 256 AS r,
             (3 * media_id + 5 * x + y) % 256 AS g,
             (x * y + media_id) % 256 AS b
      FROM px
    )
    SELECT media_id,
           'ppm' AS fmt,
           {_Q311_W} AS width,
           {_Q311_H} AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(3 * r + 5 * g + 7 * b) AS BIGINT) AS checksum
    FROM rgb
    GROUP BY media_id
    """,
)
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )
    resized = multimodal.resize_images(
        _q310_payloads(docs), _Q311_W, _Q311_H
    )
    return multimodal.image_pixel_stats(resized).select(
        "media_id",
        "fmt",
        F.lit(_Q311_W).cast("int").alias("width"),
        F.lit(_Q311_H).cast("int").alias("height"),
        "n_pixels",
        "sum_r",
        "sum_g",
        "sum_b",
        "checksum",
    )


# =====================================================================
# Cross-format pixel-content dedup (q312): the same pixel array
# encoded as BMP by half the ids and PPM by the other half has 500
# DISTINCT payload byte-digests but only 50 distinct PIXEL digests —
# exact image dedup must content-address the DECODED tensor, not the
# container bytes (the multimodal twin of q26's text exact-dedup).
# Payload seed = media_id DIV 10, so ids 10s..10s+9 share one image
# across both containers. Engine: decode → sha256(raw RGB bytes) →
# hash groupBy (digest opaque, so clusters are reported by their MIN
# member id — oracle reproduces clusters from the seed arithmetic
# without seeing a byte).
# =====================================================================
def _q312_payloads(docs: DataFrame) -> DataFrame:
    import numpy as np

    def run(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                s = d // 10
                w, h = 4 + s % 5, 3 + s % 4
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (s + 7 * x + 13 * y) % 256,
                        (3 * s + 5 * x + y) % 256,
                        (x * y + s) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payload = (
                    multimodal.encode_bmp(arr)
                    if d % 2 == 0
                    else multimodal.encode_ppm(arr)
                )
                rows.append((d, "image", payload, (w, h, None, None)))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "content", "meta"]
            )

    return docs.mapInPandas(run, schema=multimodal.MEDIA_SCHEMA)


@q(
    "q312_image_pixel_dedup",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id // 10 AS pix_group
      FROM documents WHERE doc_id < {_Q310_CAP}
    )
    SELECT CAST(min(media_id) AS BIGINT) AS cluster_rep,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(count(DISTINCT media_id % 2) AS BIGINT) AS n_formats
    FROM ids
    GROUP BY pix_group
    ORDER BY cluster_rep
    """,
)
def q312(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )

    def digest(batches):
        for pdf in batches:
            ids, digs = [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                arr = multimodal.decode_image(bytes(b))
                ids.append(mid)
                digs.append(
                    hashlib.sha256(
                        arr.shape[1].to_bytes(4, "big")
                        + arr.shape[0].to_bytes(4, "big")
                        + arr.tobytes()
                    ).hexdigest()
                )
            yield pd.DataFrame({"media_id": ids, "pixel_digest": digs})

    hashed = _q312_payloads(docs).mapInPandas(
        digest, schema="media_id long, pixel_digest string"
    )
    return (
        hashed.groupBy("pixel_digest")
        .agg(
            F.min("media_id").cast("bigint").alias("cluster_rep"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.count_distinct(F.col("media_id") % 2)
            .cast("bigint")
            .alias("n_formats"),
        )
        .drop("pixel_digest")
        .orderBy("cluster_rep")
    )


# =====================================================================
# Corpus channel histogram (q313): 8-bin (value DIV 32) per-channel
# intensity histogram over every DECODED pixel in the q310 corpus —
# the exposure/clipping audit a vision-data pipeline runs before
# training. Per-image partial bin counts from the Arrow decode pass,
# then one mergeable (channel, bin) hash agg — 24 output rows at any
# corpus size (the register-sketch shape). Oracle: closed form.
# =====================================================================
@q(
    "q313_channel_histogram",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_Q310_CAP}
    ),
    dims AS (
      SELECT media_id,
             CAST(4 + media_id % 5 AS BIGINT) AS w,
             CAST(3 + media_id % 4 AS BIGINT) AS h
      FROM ids
    ),
    px AS (
      SELECT media_id, w, h,
             (media_id + 7 * x + 13 * y) % 256 AS r,
             (3 * media_id + 5 * x + y) % 256 AS g,
             (x * y + media_id) % 256 AS b
      FROM dims,
           unnest(generate_series(0, w - 1)) AS gx(x),
           unnest(generate_series(0, h - 1)) AS gy(y)
    ),
    chan AS (
      SELECT 'r' AS channel, r // 32 AS bin FROM px
      UNION ALL SELECT 'g', g // 32 FROM px
      UNION ALL SELECT 'b', b // 32 FROM px
    )
    SELECT channel, CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM chan GROUP BY channel, bin
    ORDER BY channel, bin
    """,
)
def q313(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _Q310_CAP)
    )

    def partial_bins(batches):
        for pdf in batches:
            rows = []
            for b in pdf["content"]:
                arr = multimodal.decode_image(bytes(b))
                bins = arr.astype(np.int64) // 32
                for ci, ch in enumerate(("r", "g", "b")):
                    counts = np.bincount(
                        bins[:, :, ci].ravel(), minlength=8
                    )
                    rows.extend(
                        (ch, int(bi), int(c))
                        for bi, c in enumerate(counts)
                        if c
                    )
            yield pd.DataFrame(rows, columns=["channel", "bin", "n"])

    partials = _q310_payloads(docs).mapInPandas(
        partial_bins, schema="channel string, bin int, n long"
    )
    return (
        partials.groupBy("channel", "bin")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy("channel", "bin")
    )


# =====================================================================
# Cochran-Armitage trend (q314): is the return rate linearly trending
# across the ordered quantity scores 1..50? One per-score hash agg →
# 5 exact DECIMAL(38) sums → one closed-form z. The variance product
# R(N-R)(NC-B²) reaches ~8e29 at sf1 — DECIMAL(38,0)/HUGEINT, the
# q303 overflow rule.
# =====================================================================
from dbt_incremental_ci_spark.operators.epitests import (  # noqa: E402
    cochran_armitage_trend,
    cochran_armitage_trend_sql,
    mantel_haenszel_or,
    mantel_haenszel_or_sql,
)


@q(
    "q314_cochran_armitage",
    cochran_armitage_trend_sql(
        "lineitem", "l_quantity", "l_returnflag = 'R'"
    ),
)
def q314(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return cochran_armitage_trend(
        li, "l_quantity", F.col("l_returnflag") == "R"
    )


# =====================================================================
# Mantel-Haenszel pooled odds ratio (q315): purchase odds for the
# even-user cohort vs odd, stratified by the JSON prop k-quintile —
# crude OR next to the MH-pooled OR is the standard confounding
# readout (q232's Simpson audit at the odds-ratio level). Strata come
# through get_json_object, so the JSON path is exercised inside an
# inference query. Per-stratum rational terms ROUND-9 into
# DECIMAL(38,9) before the exact sum (srm rule).
# =====================================================================
@q(
    "q315_mantel_haenszel",
    mantel_haenszel_or_sql(
        "events",
        "CAST(json_extract(props, '$.k') AS BIGINT) // 20",
        "user_id % 2 = 0",
        "event_type = 'purchase'",
    ),
)
def q315(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return mantel_haenszel_or(
        ev,
        (
            F.get_json_object("props", "$.k").cast("bigint") / 20
        ).cast("bigint"),
        F.col("user_id") % 2 == 0,
        F.col("event_type") == "purchase",
    )
