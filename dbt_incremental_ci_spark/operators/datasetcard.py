"""Dataset-card summary: the one-row corpus composition report a
training-data release ships with (datasheet/data-card practice —
Gebru et al., "Datasheets for Datasets") — doc counts, token volume,
length stats, language/source cardinality and concentration, and
exact-duplicate rate, all from one pass plus vocabulary-sized
post-aggregates.

The reference engine has no counterpart (SURVEY.md §2); this composes
the engine's existing aggregate shapes into the release artifact.
Everything is either a map-side-combined corpus aggregate or an
aggregate OVER a category-cardinality frame; the single-row output is
the report itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """ONE row: ``(n_docs, n_langs, n_sources, n_tokens, total_chars,
    mean_chars, p50_chars, exact_dup_rate, top_lang, top_lang_share,
    top_source_share)``.

    - token/char totals: exact integer sums from one corpus pass;
    - ``p50_chars``: exact percentile (both engines interpolate the
      same sorted doubles — the q46 contract);
    - ``exact_dup_rate``: 1 − distinct(md5(text))/n — hash-grouped,
      never a self-join;
    - top-category shares: max_by over the category-cardinality count
      frames, deterministic via (count desc, name asc) tiebreak.
    """
    ntoks = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.col(lang_col).alias("__l"),
        F.col(source_col).alias("__s"),
        ntoks.alias("__ntok"),
        F.length(text_col).cast("bigint").alias("__nchr"),
    ).localCheckpoint(eager=False)
    core = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("__l").cast("bigint").alias("n_langs"),
        F.count_distinct("__s").cast("bigint").alias("n_sources"),
        F.sum("__ntok").cast("bigint").alias("n_tokens"),
        F.sum("__nchr").cast("bigint").alias("total_chars"),
        F.expr("percentile(__nchr, 0.5)").alias("p50_chars"),
        F.count_distinct(F.md5("__t")).cast("bigint").alias("__ndist"),
    )

    def top_share(col: str, share_name: str, keep_name: str | None):
        counts = base.groupBy(F.col(col).alias("__c")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        # sortable varchar key (zero-padded count | name): DuckDB's
        # max_by has no struct ordering, so both engines tiebreak on
        # the same lexicographic string
        key = F.concat(
            F.lpad(F.col("__n").cast("string"), 20, "0"),
            F.lit("|"),
            F.col("__c").cast("string"),
        )
        sel = [
            F.max_by(F.col("__c"), key).alias("__top"),
            F.max("__n").alias("__topn"),
            F.sum("__n").alias("__tot"),
        ]
        agg = counts.agg(*sel)
        out = [
            F.round(
                F.col("__topn") / F.col("__tot"), 6
            ).alias(share_name)
        ]
        if keep_name:
            out.insert(0, F.col("__top").alias(keep_name))
        return agg.select(*out)

    lang_top = top_share("__l", "top_lang_share", "top_lang")
    src_top = top_share("__s", "top_source_share", None)
    return (
        core.crossJoin(lang_top)
        .crossJoin(src_top)
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "n_tokens",
            "total_chars",
            F.round(
                F.col("total_chars") / F.col("n_docs"), 6
            ).alias("mean_chars"),
            "p50_chars",
            F.round(
                1 - F.col("__ndist") / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            "top_lang",
            "top_lang_share",
            "top_source_share",
        )
    )


def dataset_card_sql(
    rows: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`dataset_card`."""
    return f"""
    WITH base AS (
      SELECT {id_col} AS id, {text_col} AS t,
             {lang_col} AS l, {source_col} AS s,
             len(list_filter(string_split_regex(trim({text_col}),
               '\\s+'), x -> x <> '')) AS ntok,
             CAST(length({text_col}) AS BIGINT) AS nchr
      FROM {rows}
    ),
    core AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT l) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT s) AS BIGINT) AS n_sources,
             CAST(sum(ntok) AS BIGINT) AS n_tokens,
             CAST(sum(nchr) AS BIGINT) AS total_chars,
             quantile_cont(CAST(nchr AS DOUBLE), 0.5) AS p50_chars,
             CAST(count(DISTINCT md5(t)) AS BIGINT) AS ndist
      FROM base
    ),
    lang_counts AS (
      SELECT l AS c, count(*) AS n FROM base GROUP BY 1
    ),
    lang_top AS (
      SELECT max_by(c, lpad(CAST(n AS VARCHAR), 20, '0') || '|'
                        || CAST(c AS VARCHAR)) AS top_lang,
             max(n) AS topn, sum(n) AS tot
      FROM lang_counts
    ),
    src_counts AS (
      SELECT s AS c, count(*) AS n FROM base GROUP BY 1
    ),
    src_top AS (
      SELECT max(n) AS topn, sum(n) AS tot FROM src_counts
    )
    SELECT core.n_docs, core.n_langs, core.n_sources,
           core.n_tokens, core.total_chars,
           ROUND(CAST(core.total_chars AS DOUBLE) / core.n_docs, 6)
             AS mean_chars,
           core.p50_chars,
           ROUND(1 - CAST(core.ndist AS DOUBLE) / core.n_docs, 6)
             AS exact_dup_rate,
           lang_top.top_lang,
           ROUND(CAST(lang_top.topn AS DOUBLE) / lang_top.tot, 6)
             AS top_lang_share,
           ROUND(CAST(src_top.topn AS DOUBLE) / src_top.tot, 6)
             AS top_source_share
    FROM core CROSS JOIN lang_top CROSS JOIN src_top
    """
