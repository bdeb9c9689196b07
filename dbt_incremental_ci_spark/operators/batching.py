"""Length-bucketed batch assembly — the padding-efficiency step of an
LLM training-data pipeline: group documents into power-of-two token-
length buckets, order each bucket deterministically, and cut it into
fixed-size batches so every batch pads to its bucket length instead of
the corpus maximum.

Scale design: the naive plan is one window per bucket — but bucket
cardinality is ~log(max_len), so at 100 TB each bucket partition is a
single data-sized task. This operator instead ranks with the house
two-phase shape (same as ``sampling.epoch_shuffle_rank`` /
``packing.global_cumsum``): range-partition on (bucket, variate, id),
local row_numbers per (physical partition, bucket), then broadcast the
O(partitions × buckets) offset table. Batch membership is then pure
arithmetic on the rank — no data-sized single task anywhere.

Determinism: ordering inside a bucket is the md5 variate of the id
(key-stable, partition-independent, reshuffled per salt), so batch
assignments are reproducible run-over-run — the property RNG shuffles
lose on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.sampling import hash_uniform
from dbt_incremental_ci_spark.operators.text import token_count


def pow2_bucket(n: Column) -> Column:
    """Smallest power of two >= n (n clamped to >=1): the padded
    sequence length of n-token rows. log2 of an exact power of two is
    exact in IEEE doubles, so ceil() never misrounds at boundaries."""
    clamped = F.greatest(n, F.lit(1))
    return F.pow(F.lit(2.0), F.ceil(F.log2(clamped))).cast("int")


def length_bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8,
    salt: str = "batch",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, bucket_len, batch_id, pad_waste): batch_id is
    dense 0-based within each bucket; pad_waste = bucket_len −
    n_tokens is the padding this bucketing pays per row."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
    ).withColumn("bucket_len", pow2_bucket(F.col("n_tokens")))
    # localCheckpoint: same RNG-boundary double-evaluation hazard as
    # sampling.epoch_shuffle_rank — see the comment there.
    ranged = (
        base.withColumn("__u", hash_uniform(id_col, salt))
        .repartitionByRange(n, "bucket_len", F.col("__u"), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    lw = Window.partitionBy("__pid", "bucket_len").orderBy("__u", id_col)
    local = ranged.withColumn("__local", F.row_number().over(lw))
    totals = ranged.groupBy("__pid", "bucket_len").agg(
        F.count(F.lit(1)).alias("__t")
    )
    # O(partitions × buckets) rows — the unpartitioned-by-data window
    # here is deliberate and tiny.
    tw = (
        Window.partitionBy("bucket_len")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = totals.select(
        "__pid",
        "bucket_len",
        F.coalesce(F.sum("__t").over(tw), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(off), ["__pid", "bucket_len"])
        .withColumn(
            "batch_id",
            F.floor((F.col("__local") + F.col("__off") - 1) / batch_size).cast(
                "bigint"
            ),
        )
        .withColumn("pad_waste", F.col("bucket_len") - F.col("n_tokens"))
        .select(id_col, "n_tokens", "bucket_len", "batch_id", "pad_waste")
    )
