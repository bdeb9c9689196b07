"""Mergeable MinHash registers over the engine's md5 hash — the
set-similarity sketch as a REAGGREGATABLE measure, the same warehouse
contract the HLL register columns satisfy (``hll.py``): per-shard
sketches roll up to the corpus sketch by an elementwise ``min``, so
incremental batches never rescan history.

This complements the xxhash64 MinHash dedup pipeline (``dedup.py``):
that one optimizes single-pass candidate generation; this one
optimizes the STORAGE story — signatures persisted per
shard/partition merge losslessly (min is idempotent, commutative,
associative), and the m independent hash functions are per-perm
salted md5 u32s, so a DuckDB oracle reproduces every register
bit-for-bit (the q174 HLL-merge proof pattern).

Scale: one distinct (set, token) aggregate, an m-row broadcast
spine (rows × m map fan-out — the sketch's stated price), one
(set, perm)-keyed min. Registers per set = m rows; merges shuffle
only register frames, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_md5_registers(
    df: DataFrame,
    set_col: str,
    token_col: str,
    m: int = 32,
    salt: str = "mmh",
) -> DataFrame:
    """Per-(set, perm) MinHash registers: ``h = min over tokens of
    u32(md5(token:perm:salt))``. Output: ``(set_col, j, h)`` —
    exactly m rows per non-empty set."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    spark = df.sparkSession
    spine = spark.createDataFrame([(j,) for j in range(m)], "j int")
    toks = df.select(
        F.col(set_col).alias("__s"),
        F.col(token_col).cast("string").alias("__t"),
    ).where(F.col("__t").isNotNull()).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("__t"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                    F.lit(":" + salt),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        toks.crossJoin(F.broadcast(spine))
        .groupBy(F.col("__s").alias(set_col), "j")
        .agg(F.min(h).alias("h"))
    )


def minhash_merge(registers: DataFrame, set_col: str) -> DataFrame:
    """Merge per-shard register frames (any union of
    :func:`minhash_md5_registers` outputs over row-disjoint slices of
    the same sets): elementwise min per (set, perm)."""
    return registers.groupBy(set_col, "j").agg(F.min("h").alias("h"))


def minhash_merge_proof(
    df: DataFrame,
    set_col: str,
    token_col: str,
    shard_col: str,
    m: int = 32,
    salt: str = "mmh",
) -> DataFrame:
    """Shard-merge exactness proof: sketch each shard independently,
    merge the shard registers, and compare against sketching the
    whole input directly — per set, every one of the m registers must
    agree (``n_agree = n_perms``). ``sig_sum`` (exact integer sum of
    the merged registers) gives the oracle a value-level fingerprint
    of the signature itself. Output: ``(set_col, n_perms, n_agree,
    sig_sum)``.
    """
    per_shard = minhash_md5_registers(
        df.withColumn(
            "__shardset",
            F.concat(
                F.col(shard_col).cast("string"),
                F.lit("\x01"),
                F.col(set_col).cast("string"),
            ),
        ),
        "__shardset",
        token_col,
        m=m,
        salt=salt,
    )
    merged = (
        per_shard.select(
            F.split("__shardset", "\x01")[1].alias("__set"), "j", "h"
        )
        .groupBy("__set", "j")
        .agg(F.min("h").alias("h_merged"))
    )
    direct = minhash_md5_registers(df, set_col, token_col, m=m, salt=salt)
    j = merged.join(
        direct.select(
            F.col(set_col).cast("string").alias("__set"),
            "j",
            F.col("h").alias("h_direct"),
        ),
        ["__set", "j"],
    )
    return (
        j.groupBy(F.col("__set").alias(set_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            F.sum(
                (F.col("h_merged") == F.col("h_direct")).cast("int")
            ).cast("bigint").alias("n_agree"),
            F.sum("h_merged").cast("bigint").alias("sig_sum"),
        )
    )


def minhash_merge_proof_sql(
    rows: str,
    set_col: str,
    token_col: str,
    shard_col: str,
    m: int = 32,
    salt: str = "mmh",
) -> str:
    """DuckDB twin of :func:`minhash_merge_proof`; ``rows`` is a
    parenthesized row-set subquery."""
    def regs(set_expr: str) -> str:
        return f"""(
      SELECT s, j,
             min(('0x' || substr(md5(t || ':' || CAST(j AS VARCHAR)
                 || ':{salt}'), 1, 8))::BIGINT) AS h
      FROM (SELECT DISTINCT {set_expr} AS s,
                   CAST({token_col} AS VARCHAR) AS t
            FROM {rows} WHERE {token_col} IS NOT NULL)
      CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS j)
      GROUP BY s, j
    )"""

    shard_set = (
        f"(CAST({shard_col} AS VARCHAR) || chr(1) "
        f"|| CAST({set_col} AS VARCHAR))"
    )
    return f"""
    WITH per_shard AS (SELECT * FROM {regs(shard_set)}),
    merged AS (
      SELECT string_split(s, chr(1))[2] AS st, j,
             min(h) AS h_merged
      FROM per_shard GROUP BY 1, 2
    ),
    direct AS (
      SELECT CAST(s AS VARCHAR) AS st, j, h AS h_direct
      FROM {regs(f"CAST({set_col} AS VARCHAR)")}
    )
    SELECT merged.st AS {set_col},
           CAST(count(*) AS BIGINT) AS n_perms,
           CAST(sum(CAST((h_merged = h_direct) AS INT)) AS BIGINT)
             AS n_agree,
           CAST(sum(h_merged) AS BIGINT) AS sig_sum
    FROM merged JOIN direct ON merged.st = direct.st
                            AND merged.j = direct.j
    GROUP BY 1
    """
