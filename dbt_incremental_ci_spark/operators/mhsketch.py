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


def lsh_banding_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    salt: str = "lshband",
) -> DataFrame:
    """Operator-QA harness: measure the recall/precision of MinHash
    LSH banding against EXACT token-set Jaccard ground truth on an
    audit slice — the "is my dedup config (m, bands) actually catching
    near-dups at this threshold" report run before trusting a sweep
    over the full corpus.

    ``df`` must be a FIXED-SIZE audit slice (the §6o rule: QA samples
    don't grow with the corpus) — the ground-truth side is an
    all-pairs token-set Jaccard over the slice, bounded by
    construction, and the candidate side is the banded self-join the
    production pipeline uses. Signatures are the mergeable md5
    registers (:func:`minhash_md5_registers`) grouped into ``bands``
    band keys, so the DuckDB twin reproduces every candidate pair
    without a Python replica. Output: ONE row ``(n_docs, n_truth,
    n_candidates, n_hits, recall, precision)``.
    """
    if m % bands != 0:
        raise ValueError(f"bands must divide m ({bands} vs {m})")
    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0 (the exact-truth side skips "
            f"zero-overlap pairs), got {threshold}"
        )
    rows_per_band = m // bands
    from dbt_incremental_ci_spark.operators.scaling import (
        ensure_min_parallelism,
    )

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("__toks"),
    ).where(F.size("__toks") > 0)
    # round-11: the audit slice arrives as a single scan split, so the
    # m-per-token md5 register work below ran on one core — spread the
    # checkpointed token frame first (no-op at cluster split counts)
    toks = ensure_min_parallelism(toks).localCheckpoint(eager=False)
    # one exploded (doc, token) frame feeds BOTH the register build
    # and the inverted-index truth join below
    tl = toks.select(
        "__id", F.size("__toks").alias("__n"), F.explode("__toks").alias("__t")
    ).localCheckpoint(eager=False)
    # --- candidates: md5 registers -> per-band key -> self-join
    regs = minhash_md5_registers(
        tl.select("__id", "__t"),
        "__id",
        "__t",
        m=m,
        salt=salt,
    )
    band_keys = (
        regs.withColumn(
            "band", (F.col("j") / rows_per_band).cast("int")
        )
        .groupBy("__id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("j", "h"))
                        ),
                        lambda s: s["h"].cast("string"),
                    ),
                )
            ).alias("bkey")
        )
    ).localCheckpoint(eager=False)
    a, b = band_keys.alias("a"), band_keys.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .distinct()
        # consumed by TWO reduces (hits join + n_candidates count):
        # pin so the band self-join runs once (r06 verdict item 6)
        .localCheckpoint(eager=False)
    )
    # --- truth: audit-slice-bounded EXACT Jaccard via the inverted
    # token index — pairs sharing >= 1 token hash-join on the token,
    # |intersection| is the per-pair match count, |union| = na+nb-c.
    # Exactness: any pair this misses has c = 0, i.e. jac = 0 < t
    # (t > 0 enforced above). Replaces the earlier all-pairs
    # BroadcastNestedLoop with per-pair array_intersect: a hash
    # equi-join the planner distributes, ~1.8x faster on the audit
    # slice and the shape that survives a bigger slice. The predicate
    # keeps the oracle's exact float sequence (double(c)/union >= t:
    # ints are exact in double, division is correctly rounded — both
    # engines compare identical doubles, SCALE.md 6w).
    ta, tb = tl.alias("ta"), tl.alias("tb")
    tt = F.lit(float(threshold))
    common = (
        ta.join(
            tb,
            (F.col("ta.__t") == F.col("tb.__t"))
            & (F.col("ta.__id") < F.col("tb.__id")),
        )
        .groupBy(
            F.col("ta.__id").alias("id_a"), F.col("tb.__id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first(F.col("ta.__n")).alias("na"),
            F.first(F.col("tb.__n")).alias("nb"),
        )
    )
    truth = (
        common.where(
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c"))
            >= tt
        )
        .select("id_a", "id_b")
        # consumed by TWO reduces (hits join + n_truth count): pin so
        # the inverted-index join runs once
        .localCheckpoint(eager=False)
    )
    hits = truth.join(cands, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    counts = (
        toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(
            truth.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_truth")
            )
        )
        .crossJoin(
            cands.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_candidates")
            )
        )
        .crossJoin(hits)
    )
    return counts.select(
        "n_docs",
        "n_truth",
        "n_candidates",
        "n_hits",
        F.round(
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hits") / F.col("n_truth"),
            ),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits") / F.col("n_candidates"),
            ),
            6,
        ).alias("precision"),
    )


def lsh_banding_eval_sql(
    rows: str,
    id_col: str,
    text_col: str,
    m: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    salt: str = "lshband",
) -> str:
    """DuckDB twin of :func:`lsh_banding_eval`."""
    rows_per_band = m // bands
    return f"""
    WITH toks AS (
      SELECT {id_col} AS id,
             list_distinct(list_filter(
               string_split_regex(trim(lower({text_col})), '\\s+'),
               x -> x <> '')) AS tk
      FROM {rows}
    ),
    toks_ne AS (SELECT * FROM toks WHERE len(tk) > 0),
    regs AS (
      SELECT id, j,
             min(('0x' || substr(md5(t || ':' || CAST(j AS VARCHAR)
                 || ':{salt}'), 1, 8))::BIGINT) AS h
      FROM (SELECT id, unnest(tk) AS t FROM toks_ne)
      CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS j)
      GROUP BY id, j
    ),
    band_keys AS (
      SELECT id, CAST(floor(j / {rows_per_band}) AS INT) AS band,
             md5(array_to_string(
               list(CAST(h AS VARCHAR) ORDER BY j), ',')) AS bkey
      FROM regs GROUP BY id, CAST(floor(j / {rows_per_band}) AS INT)
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM band_keys a JOIN band_keys b
        ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
    ),
    truth AS (
      SELECT ta.id AS id_a, tb.id AS id_b
      FROM toks_ne ta JOIN toks_ne tb ON ta.id < tb.id
      WHERE CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE)
              / len(list_distinct(list_concat(ta.tk, tb.tk)))
            >= CAST({threshold!r} AS DOUBLE)
    ),
    hits AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hits
      FROM truth JOIN cands USING (id_a, id_b)
    ),
    counts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM toks_ne) AS n_docs,
             (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
             (SELECT CAST(count(*) AS BIGINT) FROM cands)
               AS n_candidates
    )
    SELECT n_docs, n_truth, n_candidates, n_hits,
           ROUND(CASE WHEN n_truth > 0 THEN
                 CAST(n_hits AS DOUBLE) / n_truth END, 6) AS recall,
           ROUND(CASE WHEN n_candidates > 0 THEN
                 CAST(n_hits AS DOUBLE) / n_candidates END, 6)
             AS precision
    FROM counts CROSS JOIN hits
    """
