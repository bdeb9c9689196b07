"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003) — the rolling-hash fingerprinting scheme behind MOSS-style
plagiarism/overlap detection, and the "document fingerprinting" entry
of the training-data operator charter.

Scheme: hash every k-token shingle (rolling k-gram), slide a window of
``w`` consecutive gram hashes over the document, keep the MINIMUM hash
of each window. The guarantee: any shared substring of at least
``k + w - 1`` tokens between two documents yields at least one shared
fingerprint — so fingerprint-postings overlap is a sound detector for
long verbatim overlaps (quotes, mirrored passages, template reuse),
which MinHash (whole-document set similarity) cannot localize.

Spark-first shape — gram rows, not array lambdas: tokens shingle via
shifted-slice zips, ``posexplode`` to (doc, pos, gram) rows, the md5
gram hash and the sliding minimum (per-doc rows window) run inside
whole-stage codegen (see the measured dead ends in
``winnow_fingerprints``):

- per-doc work is O(grams × w) with w small (the classic time/guarantee
  trade); gram hashes are the house md5 32-bit variate so the DuckDB
  oracle replays them bit-for-bit;
- documents shorter than a full window (but >= k tokens) contribute
  their single global-min fingerprint — the SIGMOD paper's boundary
  convention, so every fingerprintable doc has >= 1 fingerprint;
- overlap detection explodes (doc, fp) postings, drops fingerprints
  with document frequency above ``max_df`` (boilerplate/common spans —
  the same hot-key cap as the PPJoin prefix and MinHash band joins:
  ubiquitous fingerprints cost O(df^2) pairs and identify nothing),
  then counts shared fingerprints per pair. Join fan-out is bounded by
  max_df^2 per fingerprint — never corpus-quadratic.

At 100 TB: the fingerprint table is ~|corpus tokens| / ((w+1)/2) rows
(winnowing's expected density 2/(w+1)), hash-partitioned by
fingerprint; the pair join inherits the banding-join scale story.

No counterpart in the reference repo (its workload is dbt-model SQL);
part of the training-data surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    salt: str = "wn",
) -> DataFrame:
    """(id, fp) postings: the distinct winnowing fingerprints of each
    document. Documents with fewer than ``k`` tokens emit no rows;
    documents with >= k tokens but fewer than ``w`` full windows emit
    their single minimum gram hash (boundary convention).

    One shuffle (doc-id window + aggregate share the exchange); the
    dedup of fingerprints shuffles the (doc, fp) postings once more.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators.ngrams import (
        shifted_ngram_arrays,
    )

    # ROW-LEVEL plan, not array-lambda math. Two dead ends, both
    # measured at sf0.1 (5k docs, ~50 grams each):
    # 1. transform(sequence(1, n), i -> md5(slice(toks, i, k))) inlines
    #    the token split into the lambda -> re-evaluated PER ELEMENT,
    #    O(L²)/row; the long-doc tail pinned one task >15 min (thread
    #    dump: StringSplit under ArrayFilter under the lambda).
    # 2. Staying in arrays with shifted-slice zips fixes the asymptotic
    #    but every element still pays interpreted HigherOrderFunction
    #    eval (~20 µs): 8.9 s for 450k grams.
    # posexplode to rows instead: the md5 gram hash and the sliding
    # minimum (rows-window per doc) run inside whole-stage codegen.
    # Costs one shuffle on the doc id — at 100 TB that is the ordinary
    # keyed-window shape, per-doc frames, never data-sized.
    toks = _tokens(text_col)
    grams_arr = F.when(
        F.size(toks) >= k, shifted_ngram_arrays(toks, k)
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(
        F.col(id_col), F.posexplode(grams_arr).alias("__pos", "__g")
    )
    hashed = grams.select(
        F.col(id_col),
        "__pos",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("__g"), F.lit(":" + salt))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("__h"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("__pos")
        .rowsBetween(-(w - 1), 0)
    )
    full = (
        hashed.select(
            F.col(id_col),
            "__pos",
            F.min("__h").over(win).alias("fp"),
        )
        .filter(F.col("__pos") >= w - 1)  # full windows only
        .select(id_col, "fp")
    )
    # boundary convention: >=1 gram but < w grams -> single global min
    shorts = (
        hashed.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"), F.min("__h").alias("fp"))
        .filter(F.col("__n") <= w - 1)
        .select(id_col, "fp")
    )
    return full.unionByName(shorts).dropDuplicates([id_col, "fp"])


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    salt: str = "wn",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (id_a < id_b), i.e. candidates for long verbatim overlap.

    Fingerprints appearing in more than ``max_df`` documents are
    dropped before pairing (boilerplate spans; O(df^2) fan-out with no
    discriminative value). Output: ``id_a, id_b, shared_fps``.
    """
    fps = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, salt=salt
    ).localCheckpoint(eager=False)
    # ^ feeds both the df-cap aggregate and the pair join; truncation
    # stops the fingerprint plan executing twice
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    rare = fps.join(dfreq.filter(F.col("__df") <= max_df), "fp")
    a = rare.select(F.col(id_col).alias("id_a"), "fp")
    b = rare.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
