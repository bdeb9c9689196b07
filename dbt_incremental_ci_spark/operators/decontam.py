"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard pre-training hygiene step (n-gram-overlap decontamination
as published for GPT-3/PaLM-class corpora): any training document
sharing at least ``min_overlap`` distinct word ``n``-grams with any
benchmark document is flagged (or dropped). Spark-first shape:

- both sides shingle map-side with pure Column expressions
  (``split`` → ``transform``/``slice`` → ``explode``) — no UDFs;
- the benchmark side is benchmark-sized (thousands of docs, not TBs),
  so its distinct shingle set stays broadcast-able and AQE turns the
  overlap join into a broadcast hash join — the 100 TB corpus side
  never shuffles for the join itself;
- the only corpus-sized shuffle is the per-doc overlap count
  (groupBy doc), map-side-combined by Spark's partial aggregation.

No counterpart in the reference repo (its workload is a relational
star schema); this is part of the training-data operator surface the
engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of space-joined word ``n``-grams (whitespace tokens,
    empties dropped). Documents with fewer than ``n`` tokens yield an
    empty array. Built with the shifted-slice zip (tokens materialize
    once per row, not once per output element — see
    ``ngrams.shifted_ngram_arrays``)."""
    from dbt_incremental_ci_spark.operators.ngrams import shifted_ngram_arrays

    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")
    return F.when(
        F.size(toks) >= n, shifted_ngram_arrays(toks, n)
    ).otherwise(F.array().cast("array<string>"))


def overlap_counts(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-corpus-document count of DISTINCT word ``n``-grams shared
    with ANY evaluation document: (id_col, overlap_ngrams).

    Corpus side explodes to distinct (doc, shingle-hash) pairs —
    xxhash64 so the join key is 8 bytes instead of an n-word string;
    eval side reduces to its distinct shingle-hash set, which is small
    by construction and broadcast by AQE. Docs with zero overlap are
    absent from the output (join semantics — callers needing zeros can
    left-join back).
    """
    csh = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__ng")
    ).select(id_col, F.xxhash64("__ng").alias("__h")).dropDuplicates([id_col, "__h"])
    esh = (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("__ng"))
        .select(F.xxhash64("__ng").alias("__h"))
        .dropDuplicates(["__h"])
    )
    return (
        csh.join(esh, "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )


def contaminated(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """Documents whose benchmark overlap reaches ``min_overlap``
    distinct n-grams: (id_col, overlap_ngrams)."""
    return overlap_counts(corpus, eval_df, id_col, text_col, n).filter(
        F.col("overlap_ngrams") >= min_overlap
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """The clean corpus: drop contaminated documents (left-anti join
    against the flagged id set — the flagged set is tiny relative to
    the corpus, so AQE broadcasts it)."""
    flagged = contaminated(corpus, eval_df, id_col, text_col, n, min_overlap)
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


def eval_coverage(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_id: str = "doc_id",
    eval_text: str = "text",
) -> DataFrame:
    """Per-eval-document n-gram coverage: what fraction of each eval
    document's DISTINCT word n-grams occur anywhere in the corpus —
    the recall-side complement of :func:`contaminated` (which flags
    high overlap as leakage; low coverage instead signals an eval set
    the corpus never discusses, i.e. an out-of-domain benchmark).

    Shape: eval n-grams explode per (eval doc, gram-hash); the corpus
    side reduces to a DISTINCT gram-hash set (corpus-sized shuffle
    with map-side partial distinct, 8-byte keys); one left join +
    per-doc aggregate. Nothing driver-sized; the join keys are
    near-uniform hashes.
    """
    ev = (
        eval_df.select(
            F.col(eval_id).alias("__eid"),
            F.explode(word_ngrams(eval_text, n)).alias("__ng"),
        )
        .select("__eid", F.xxhash64("__ng").alias("__h"))
        .dropDuplicates(["__eid", "__h"])
    )
    corpus_hashes = (
        corpus.select(F.explode(word_ngrams(corpus_text, n)).alias("__ng"))
        .select(F.xxhash64("__ng").alias("__h"))
        .dropDuplicates(["__h"])
        .withColumn("__present", F.lit(1))
    )
    return (
        ev.join(corpus_hashes, "__h", "left")
        .groupBy(F.col("__eid").alias(eval_id))
        .agg(
            F.count(F.lit(1)).alias("n_eval_ngrams"),
            F.coalesce(F.sum("__present"), F.lit(0)).alias("n_covered"),
        )
        .withColumn(
            "coverage",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_eval_ngrams"), 6
            ),
        )
    )
