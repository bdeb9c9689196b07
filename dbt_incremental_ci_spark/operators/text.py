"""Text analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen'd, no UDFs): language ID
via stopword voting, quality scoring, token counting, fingerprinting.
Designed to run over billions of documents — per-row work only, no
shuffle except where an aggregate is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal stopword lists for the n-gram/stopword language-ID heuristic.
# Deliberately tiny + ASCII so the same lists are embeddable in the SQL
# oracle; real pipelines would load fuller lists as a broadcast seed.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "nicht"],
    "fr": ["le", "la", "les", "des", "et", "est", "que", "pour"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Rough BPE-style token estimate: word-piece regex split — words,
    numbers, and individual punctuation marks each count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda x: (x != "") & ~x.rlike(r"^\s+$"),
        )
    )


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def punct_ratio(text: Column | str) -> Column:
    """ASCII-punctuation chars / total chars (0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c)).otherwise(0.0)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (lang) stopwords."""
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(stop, F.lower(x))))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: rewards mid-length
    docs and word diversity, penalizes punctuation soup. Deterministic
    and SQL-expressible (mirrored in the DuckDB oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    length_component = F.least(n_tok.cast("double") / 64.0, F.lit(1.0))
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(tokens(c))).cast("double") / n_tok
    ).otherwise(0.0)
    return F.round(
        0.5 * length_component + 0.5 * diversity - F.least(punct_ratio(c), F.lit(0.5)),
        6,
    )


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts; ``und`` (undetermined) when no list scores > 0. Ties break
    by language-code order (deterministic)."""
    toks = F.transform(tokens(text), lambda x: F.lower(x))
    scores = []
    for code in sorted(STOPWORDS):
        stop = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).alias("score"),
                F.lit(code).alias("lang"),
            )
        )
    # array_max on structs orders by (score, lang); ties → highest lang
    # code wins, mirrored exactly in the oracle SQL.
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise("und")


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct
    lowercased token set — stable under token reordering/duplication.
    (Rolling-hash shingle fingerprints live in dedup.minhash.)"""
    toks = F.array_sort(F.array_distinct(F.transform(tokens(text), lambda x: F.lower(x))))
    return F.md5(F.array_join(toks, " "))


# PII patterns kept in the Java∩RE2 common dialect so the DuckDB
# oracle replicates them verbatim (no lookarounds, no backrefs).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
}


def scrub_pii(text: Column | str) -> Column:
    """Redact emails / phone numbers / SSN-shaped strings with typed
    placeholders. Order matters (SSN before phone — a 3-2-4 grouping
    must not half-match the 3-3-4 phone pattern); both engines apply
    the same order. Pure regexp_replace chain — codegen'd, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    c = F.regexp_replace(c, PII_PATTERNS["ssn"], "<SSN>")
    c = F.regexp_replace(c, PII_PATTERNS["phone"], "<PHONE>")
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (audit/reporting side-channel)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat suite as columns — one narrow projection,
    no shuffle."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        char_count(text_col).alias("n_chars_computed"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio_en"),
        quality_score(text_col).alias("quality_score"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )
