"""C4-style line-level corpus cleaning: per-line heuristic filtering
and corpus-wide exact line deduplication.

The published C4 (Raffel et al., "Exploring the Limits of Transfer
Learning…", §2.2) cleaning recipe, re-expressed Spark-first:

- LINE rules (applied per line): keep only lines that end in a
  terminal punctuation mark, contain at least ``min_words`` words, and
  do not mention "javascript";
- PAGE rules: drop the whole document when it contains "lorem ipsum"
  or a curly brace, or when fewer than ``min_lines`` lines survive;
- corpus-wide exact line dedup (C4 deduplicates repeated three-
  sentence spans; at line granularity here): every distinct line keeps
  exactly its FIRST occurrence — minimum (doc, position) — and every
  later copy anywhere in the corpus is removed.

Scale shape: :func:`c4_filter` is a pure per-row Column expression —
no shuffle, no UDF, fused into the scan at any corpus size.
:func:`dedup_lines` explodes to (doc, pos, line-hash) keyed by
``xxhash64`` (8-byte shuffle keys), finds each hash's minimum
(doc, pos) with one map-side-combined aggregation, joins winners back
on the same key, and reassembles per doc — two hash-keyed shuffles and
one bounded per-doc sort (lines-per-doc, not corpus-sized).

No counterpart in the reference repo; part of the training-data
operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = r'[.!?"]$'


def split_lines(text: Column | str) -> Column:
    """Array of non-empty trimmed lines (split on newline)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(c, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda x: x != ""))


def line_keep(line: Column, min_words: int = 5) -> Column:
    """The C4 per-line rule: terminal punctuation, >= min_words words,
    no 'javascript' mention (case-insensitive)."""
    return (
        line.rlike(TERMINAL_PUNCT_RE)
        & (_word_count(line) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def c4_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """(id_col, n_lines, n_kept, c4_keep, kept_text): line-filtered
    text (kept lines re-joined with newlines) plus the page-level keep
    flag. Map-only — every rule is a Column expression."""
    lines = split_lines(text_col)
    kept = F.filter(lines, lambda l: line_keep(l, min_words))
    page_ok = (
        ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
        & (F.size(kept) >= min_lines)
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        page_ok.alias("c4_keep"),
        F.array_join(kept, "\n").alias("kept_text"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact line dedup keeping first occurrences:
    (id_col, n_lines_before, n_lines_after, deduped_text).

    "First" is the minimum (id, position) pair over every occurrence
    of the line anywhere in the corpus — so a line repeated inside one
    document also keeps only its earliest position. Documents losing
    every line stay in the output with an empty ``deduped_text``.
    """
    pos = df.select(
        F.col(id_col).alias("__d"),
        F.posexplode(split_lines(text_col)).alias("__p", "__line"),
    ).select("__d", "__p", "__line", F.xxhash64("__line").alias("__h"))
    winners = pos.groupBy("__h").agg(
        F.min(F.struct(F.col("__d").alias("d"), F.col("__p").alias("p"))).alias(
            "__w"
        )
    )
    survivors = (
        pos.join(winners, "__h")
        .filter((F.col("__d") == F.col("__w.d")) & (F.col("__p") == F.col("__w.p")))
        .groupBy("__d")
        .agg(
            F.count(F.lit(1)).alias("n_lines_after"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__p"), F.col("__line")))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("deduped_text"),
        )
    )
    return (
        df.select(
            F.col(id_col), F.size(split_lines(text_col)).alias("n_lines_before")
        )
        .join(survivors.withColumnRenamed("__d", id_col), id_col, "left")
        .select(
            id_col,
            "n_lines_before",
            F.coalesce("n_lines_after", F.lit(0)).cast("bigint").alias(
                "n_lines_after"
            ),
            F.coalesce("deduped_text", F.lit("")).alias("deduped_text"),
        )
    )
