"""RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents") — the unsupervised
candidate-phrase scorer a curation pipeline uses for topic tagging
and doc-level metadata without a model.

Candidate phrases are maximal runs of non-stopword tokens (stopwords
and punctuation act as delimiters); each word scores
``deg(w)/freq(w)`` where freq counts the word's occurrences in
candidate phrases and deg sums the lengths of the phrases containing
it (co-occurrence degree, self included); a phrase scores the sum of
its member word scores.

Distributed shape: tokenization + the stopword flag are pure column
expressions; phrase segmentation is the GAPS-AND-ISLANDS rewrite
(``pos - row_number()`` per document over kept tokens) — a
doc-keyed window, never a global sort; word stats and phrase scores
are hash aggregates / key joins. The only total order is the final
top-k, which Spark executes as TakeOrdered (per-partition heap +
merge), not a full sort.

Determinism: word scores are exact integer ratios; phrase-instance
scores sum member ratios rounded to 6 dp as DECIMAL (order-exact
fold); identical phrase texts have identical member multisets, so
the per-text aggregate is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# compact English function-word list — shared verbatim with the SQL
# twin so both engines segment identically
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "have", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "this", "to", "was", "were", "which", "will",
    "with",
)


def _clean_tokens(text_col: str) -> F.Column:
    raw = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    cleaned = F.transform(
        raw, lambda t: F.regexp_replace(t, "[^a-z0-9]", "")
    )
    return F.filter(cleaned, lambda x: x != "")


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    min_freq: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-level RAKE: top-k candidate phrases by summed word
    score. Output: ``(phrase, n_words, freq, score)`` ordered by
    (score desc, phrase), ``freq >= min_freq``."""
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_clean_tokens(text_col)).alias("__p", "__w"),
    )
    kept = pos.filter(~F.col("__w").isin(*stopwords))
    w_doc = Window.partitionBy("__id").orderBy("__p")
    members = kept.withColumn(
        "__grp", F.col("__p") - F.row_number().over(w_doc)
    )
    phrases = members.groupBy("__id", "__grp").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(__p, __w))), s -> s.__w), ' ')"
        ).alias("phrase"),
        F.count(F.lit(1)).alias("__len"),
    )
    pm = members.join(phrases, ["__id", "__grp"]).select(
        "__id", "__grp", "__w", "phrase", "__len"
    )
    word_stats = pm.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__len").alias("__deg"),
    )
    scored_members = pm.join(word_stats, "__w").select(
        "__id",
        "__grp",
        "phrase",
        "__len",
        (F.col("__deg").cast("double") / F.col("__freq")).alias("__ws"),
    )
    instance = scored_members.groupBy("__id", "__grp").agg(
        F.first("phrase").alias("phrase"),
        F.first("__len").alias("n_words"),
        F.sum(F.round(F.col("__ws"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("__iscore"),
    )
    out = (
        instance.groupBy("phrase")
        .agg(
            F.max("n_words").cast("int").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.round(F.max("__iscore"), 6).alias("score"),
        )
        .filter(F.col("freq") >= min_freq)
    )
    return out.orderBy(F.desc("score"), "phrase").limit(top_k)


def rake_keywords_sql(
    rows: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    min_freq: int = 2,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`rake_keywords`."""
    stop_list = ", ".join(f"'{s}'" for s in stopwords)
    return rf"""
    WITH tk AS (
      SELECT {id_col} AS id,
             list_filter(
               list_transform(
                 string_split_regex(trim(lower({text_col})), '\s+'),
                 t -> regexp_replace(t, '[^a-z0-9]', '', 'g')),
               x -> x <> '') AS toks
      FROM {rows}
    ),
    pos AS (
      SELECT id, i AS p, toks[i] AS w
      FROM tk, unnest(generate_series(1, len(toks))) AS g(i)
    ),
    kept AS (
      SELECT * FROM pos WHERE w NOT IN ({stop_list})
    ),
    members AS (
      SELECT *,
        p - row_number() OVER (PARTITION BY id ORDER BY p) AS grp
      FROM kept
    ),
    phrases AS (
      SELECT id, grp,
             string_agg(w, ' ' ORDER BY p) AS phrase,
             count(*) AS len
      FROM members GROUP BY id, grp
    ),
    pm AS (
      SELECT m.id, m.grp, m.w, ph.phrase, ph.len
      FROM members m JOIN phrases ph
        ON m.id = ph.id AND m.grp = ph.grp
    ),
    word_stats AS (
      SELECT w, count(*) AS freq, sum(len) AS deg FROM pm GROUP BY w
    ),
    instance AS (
      SELECT pm.id, pm.grp,
             any_value(pm.phrase) AS phrase,
             any_value(pm.len) AS n_words,
             CAST(SUM(CAST(ROUND(CAST(ws.deg AS DOUBLE) / ws.freq, 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS iscore
      FROM pm JOIN word_stats ws ON pm.w = ws.w
      GROUP BY pm.id, pm.grp
    )
    SELECT phrase,
           CAST(MAX(n_words) AS INT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS freq,
           ROUND(MAX(iscore), 6) AS score
    FROM instance
    GROUP BY phrase
    HAVING COUNT(*) >= {min_freq}
    ORDER BY score DESC, phrase
    LIMIT {top_k}
    """
