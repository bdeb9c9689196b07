"""DSIR-style data selection with importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score each raw document by how much more likely its hashed-unigram
features are under a TARGET corpus distribution than under the RAW
corpus distribution, then keep the top-scoring slice.

The reference engine has no data-selection surface (SURVEY.md §2 —
this is charter extension work); the relational decomposition here is
the point:

- Features are md5-hashed token buckets (same convention as
  ``operators/classifier.token_bucket`` — first 32 md5 bits mod B), so
  the feature space is a CONSTANT-sized table of B buckets, not a
  vocabulary-sized one.
- Both corpus passes are map-side-combined aggregates producing
  B-row tables; the per-bucket log-ratio table that scoring joins
  against is therefore always broadcastable — the scoring join never
  shuffles the corpus on anything but its own token explode.
- Add-alpha smoothing keeps every bucket's ratio finite even when a
  bucket is empty on one side.
- Determinism across engines: each token's log-ratio contribution is
  rounded to DECIMAL(18,10) before the per-doc sum (decimal sums are
  order-independent), and the final score is rounded before ranking
  with an id tiebreaker.

At 100 TB: two corpus-sized token explodes (target pass + scoring
pass) with map-side combine, one broadcast join of a B-row weights
table, one top-k rank. No all-pairs, no data-sized broadcast, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.classifier import _tokens, token_bucket


def bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(bucket, c) hashed-unigram counts — a B-row table."""
    return (
        df.select(
            F.explode(_tokens(text_col)).alias("__tk")
        )
        .select(token_bucket(F.col("__tk"), n_buckets, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_logratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    n_buckets: int = 64,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Per-bucket ln(p_target / p_raw) with add-alpha smoothing:
    p[b] = (c[b] + alpha) / (total + alpha·B). Returns exactly B rows
    (missing buckets materialize with c=0 via a generated spine)."""
    spine = (
        target.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
    )
    tc = bucket_counts(target, text_col, n_buckets, salt)
    rc = bucket_counts(raw, text_col, n_buckets, salt)
    joined = (
        spine.join(tc.withColumnRenamed("c", "ct"), "bucket", "left")
        .join(rc.withColumnRenamed("c", "cr"), "bucket", "left")
        .fillna(0, ["ct", "cr"])
    )
    tot = joined.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    a, ab = float(alpha), float(alpha) * n_buckets
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("ct") + a) / (F.col("tt") + ab))
            - F.log((F.col("cr") + a) / (F.col("tr") + ab))
        ).alias("logratio"),
    )


def importance_scores(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """Per-doc summed log importance weight over the B-row ``weights``
    (bucket, logratio) table. Output: (id, n_tokens, logweight)."""
    tok = raw.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("__tk")
    ).select(
        id_col, token_bucket(F.col("__tk"), n_buckets, salt).alias("bucket")
    )
    return (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("logratio").cast("decimal(18,10)")).alias("__lw"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("__lw").cast("double"), 6).alias("logweight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Rank raw docs by target-likeness; keep flag marks the top k.
    Output: (id, n_tokens, logweight, rnk, keep)."""
    w = bucket_logratio(target, raw, text_col, n_buckets, alpha, salt)
    scored = importance_scores(raw, w, id_col, text_col, n_buckets, salt)
    # Global rank without a single-task window: the two-phase shape
    # from sampling.epoch_shuffle_rank — range-partition on the sort
    # key, local row_numbers, broadcast O(partitions) offsets.
    spark = raw.sparkSession
    n = spark.sparkContext.defaultParallelism
    # localCheckpoint: same RNG-boundary double-evaluation hazard as
    # sampling.epoch_shuffle_rank — see the comment there.
    ranged = scored.repartitionByRange(
        n, F.col("logweight").desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    lw = Window.partitionBy("__pid").orderBy(
        F.desc("logweight"), F.asc(id_col)
    )
    local = ranged.withColumn("__local", F.row_number().over(lw))
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__t"))
    tw = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(tw), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn("rnk", (F.col("__local") + F.col("__off")).cast("int"))
        .withColumn("keep", F.col("rnk") <= k)
        .drop("__pid", "__local", "__off")
    )
