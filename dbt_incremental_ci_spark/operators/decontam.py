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


def ngram_novelty(
    previous: DataFrame,
    current: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Corpus novelty rate: what fraction of the CURRENT epoch's
    distinct word ``n``-grams never appeared in the PREVIOUS epoch —
    the "are we still adding new content or just recrawling"
    freshness monitor for an incremental crawl/ingest pipeline
    (the forward-looking complement to ``eval_coverage``'s
    backward-looking containment).

    Both sides reduce to distinct n-gram sets FIRST (vocabulary-
    sized, the corpus is never pair-joined), then one left-anti
    key join counts survivors. N-grams compare as the literal
    space-joined token strings (not hashes) so the DuckDB twin is
    byte-identical. Output: ONE row ``(n_prev_ngrams,
    n_cur_ngrams, n_novel, novelty_rate)``.
    """
    def gramset(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(word_ngrams(text_col, n)).alias("ng"))
            .dropDuplicates(["ng"])
        )

    prev_g = gramset(previous)
    cur_g = gramset(current)
    novel = cur_g.join(prev_g, "ng", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    counts = cur_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cur_ngrams")
    ).crossJoin(
        prev_g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_prev_ngrams")
        )
    )
    return counts.crossJoin(novel).select(
        "n_prev_ngrams",
        "n_cur_ngrams",
        "n_novel",
        F.round(
            F.when(
                F.col("n_cur_ngrams") > 0,
                F.col("n_novel") / F.col("n_cur_ngrams"),
            ),
            6,
        ).alias("novelty_rate"),
    )


def ngram_novelty_sql(
    prev_rows: str, cur_rows: str, text_col: str = "text", n: int = 3
) -> str:
    """DuckDB twin of :func:`ngram_novelty`; ``prev_rows`` /
    ``cur_rows`` are parenthesized row-set subqueries exposing
    ``text_col``."""
    def gramset(rows: str) -> str:
        return f"""(
      SELECT DISTINCT ng FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - {n - 1})),
                 i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS ng
        FROM (SELECT list_filter(
                       string_split_regex(trim({text_col}), '\\s+'),
                       x -> x <> '') AS toks
              FROM {rows}))
    )"""

    return f"""
    WITH prev_g AS (SELECT ng FROM {gramset(prev_rows)}),
    cur_g AS (SELECT ng FROM {gramset(cur_rows)}),
    novel AS (
      SELECT CAST(count(*) AS BIGINT) AS n_novel
      FROM cur_g WHERE ng NOT IN (SELECT ng FROM prev_g)
    ),
    counts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM cur_g)
               AS n_cur_ngrams,
             (SELECT CAST(count(*) AS BIGINT) FROM prev_g)
               AS n_prev_ngrams
    )
    SELECT n_prev_ngrams, n_cur_ngrams, n_novel,
           ROUND(CASE WHEN n_cur_ngrams > 0 THEN
                 CAST(n_novel AS DOUBLE) / n_cur_ngrams END, 6)
             AS novelty_rate
    FROM counts CROSS JOIN novel
    """
