"""Corpus-wide repeated n-gram statistics: per-document fraction of
word n-grams that also occur in other documents.

The pre-training corpus-hygiene signal published for RefinedWeb /
"Deduplicating Training Data Makes Language Models Better" (Lee et
al.): beyond whole-document near-dup removal, measure how much of each
document is made of n-grams the rest of the corpus already contains,
and drop (or trim) documents dominated by corpus-duplicated spans.

Spark-first shape (no UDFs anywhere):

- each document shingles map-side into positional word n-grams
  (``split`` → ``transform`` → ``explode``) and keys them by
  ``xxhash64`` so the shuffle carries 8-byte keys, not n-word strings;
- one corpus-sized shuffle computes per-n-gram DISTINCT document
  frequency (groupBy hash with map-side partial aggregation;
  ``dropDuplicates`` on (doc, hash) first so within-doc repeats don't
  inflate the document frequency);
- the duplicated-hash set joins back to the positional explode on the
  same 8-byte key — a co-partitioned large-large hash join, then one
  per-doc aggregation produces the fraction.

At 100 TB nothing here is driver-sized: both shuffles are keyed by
n-gram hash (near-uniform by construction), the join is hash-hash on
the same key, and partial aggregation combines map-side. The n-gram
string itself never shuffles.

No counterpart in the reference repo (relational star schema); part of
the training-data operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shifted_ngram_arrays(toks: Column, n: int) -> Column:
    """Space-joined positional ``n``-grams from a token-array column,
    built by zipping ``n`` shifted slices of the array.

    Each slice materializes the token expression ONCE per row
    (O(n·L)); the older ``transform(sequence(...), i -> slice(toks,
    i, n))`` form embeds the token expression inside the lambda, where
    codegen re-evaluates it per output element — O(L²) per row with a
    string-split at every step (the same measured pathology fixed in
    ``text.word_bigrams``). Callers guard the ``size < n`` case."""
    count = F.size(toks) - F.lit(n - 1)
    slices = [F.slice(toks, i + 1, count).alias(f"__t{i}") for i in range(n)]
    return F.transform(
        F.arrays_zip(*slices),
        lambda s: F.concat_ws(" ", *[s[f"__t{i}"] for i in range(n)]),
    )


def positional_ngrams(text: Column | str, n: int) -> Column:
    """Array of space-joined word ``n``-grams in document order
    (whitespace tokens, empties dropped), one per starting position —
    duplicates preserved. Documents with fewer than ``n`` tokens yield
    an empty array."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")
    return F.when(
        F.size(toks) >= n, shifted_ngram_arrays(toks, n)
    ).otherwise(F.array().cast("array<string>"))


def duplicated_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Per-document corpus-repetition profile:
    (id_col, n_ngrams, dup_ngrams, dup_ngram_frac).

    An n-gram is *duplicated* when it appears in at least
    ``min_doc_freq`` DISTINCT documents; ``dup_ngram_frac`` is the
    fraction of the document's n-gram positions (repeats included)
    whose n-gram is duplicated. Every input document appears in the
    output; documents shorter than ``n`` tokens get (0, 0, 0.0).
    """
    pos = df.select(
        F.col(id_col), F.explode(positional_ngrams(text_col, n)).alias("__ng")
    ).select(id_col, F.xxhash64("__ng").alias("__h")).localCheckpoint(
        eager=False
    )
    # ^ feeds both the doc-frequency aggregate and the per-doc rejoin;
    # without truncation the n-gram explode executes twice.
    # document frequency per n-gram hash: distinct (doc, hash) first so
    # a doc repeating its own n-gram doesn't count as corpus duplication
    dup_hashes = (
        pos.dropDuplicates([id_col, "__h"])
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("__h")
    )
    per_doc = (
        pos.join(dup_hashes.withColumn("__dup", F.lit(1)), "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("__dup"), F.lit(0)).alias("dup_ngrams"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("bigint").alias("dup_ngrams"),
            F.round(
                F.when(
                    F.coalesce("n_ngrams", F.lit(0)) > 0,
                    F.col("dup_ngrams").cast("double") / F.col("n_ngrams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ngram_frac"),
        )
    )


def flag_repetitive_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_freq: int = 2,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """duplicated_ngram_stats plus a keep flag: documents whose
    corpus-duplicated n-gram fraction exceeds ``max_dup_frac`` are
    flagged for removal (``ngram_keep = false``)."""
    stats = duplicated_ngram_stats(df, id_col, text_col, n, min_doc_freq)
    return stats.withColumn(
        "ngram_keep", F.col("dup_ngram_frac") <= F.lit(max_dup_frac)
    )


def remove_boilerplate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_doc_freq: int = 10,
) -> DataFrame:
    """Cross-document boilerplate REMOVAL (the ExactSubstr-flavored
    cleanup of Lee et al. 2022, span-granular rather than line-
    granular like ``c4.dedup_lines``): any ``n``-gram occurring in at
    least ``min_doc_freq`` DISTINCT documents is boilerplate, and every
    token position it covers is dropped from every document; the
    survivors re-join in order.

    Output: (id, n_tokens, n_removed, cleaned_text) — all docs kept,
    fully-boilerplate docs come back with an empty string.

    Plan shape at 100 TB: one positional-n-gram explode keyed by the
    gram hash (map-side combined doc-frequency count), the flagged-gram
    set joined back gram-sharded (AQE broadcasts it when small — the
    usual case: boilerplate vocabulary ≪ corpus), covered positions
    exploded map-only, and the reassembly a doc-sharded
    sort_array(collect_list) — per-document state only, embarrassingly
    parallel. Everything integer/string arithmetic: bit-exact in any
    engine.
    """
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    tok_pos = df.select(
        F.col(id_col), F.posexplode(toks).alias("__p0", "__tok")
    ).select(id_col, (F.col("__p0") + 1).alias("__pos"), "__tok")
    grams = df.select(
        F.col(id_col),
        F.posexplode(positional_ngrams(text_col, n)).alias("__g0", "__ng"),
    ).select(id_col, (F.col("__g0") + 1).alias("__gpos"), "__ng")
    boiler = (
        grams.dropDuplicates([id_col, "__ng"])
        .groupBy("__ng")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("__ng")
    )
    covered = (
        grams.join(boiler, "__ng")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__gpos"), F.col("__gpos") + F.lit(n - 1))
            ).alias("__pos"),
        )
        .dropDuplicates([id_col, "__pos"])
    )
    kept = tok_pos.join(covered, [id_col, "__pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__tok")))
                ),
                lambda s: s["__tok"],
            ),
        ).alias("cleaned_text"),
    )
    totals = tok_pos.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            )
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
