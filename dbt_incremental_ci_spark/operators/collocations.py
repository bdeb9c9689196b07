"""Corpus collocation mining (PMI) and categorical association
(chi-square / Cramér's V) audits.

Collocations: pointwise mutual information over adjacent word pairs —
PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) — the classic collocation
extractor (Church & Hanks 1990). High-PMI pairs ("san francisco",
"et al") are the multi-word expressions a tokenizer/dedup pipeline
should treat as units; low/negative PMI flags boilerplate gluing.

Association: the chi-square statistic and Cramér's V between two
categorical columns (e.g. documents.lang × documents.source) — the
standard "are these metadata fields independent" audit before using
one to stratify a sample keyed on the other.

Scale design (the 100 TB story):

- PMI: one bigram explode (shifted-slice zip — tokens materialize
  once per row), one hash agg per relation (pair counts, unigram
  counts), the unigram table joined twice (vocabulary-sized — AQE
  broadcasts while it fits), totals broadcast as literals. No sort,
  no window, no Python.
- chi-square: one (a, b) hash agg, the two marginal tables derived
  FROM it (category-sized), expected counts by join — the
  contingency table never exceeds |A|×|B| rows. Single scalar out.
- Determinism: integer counts all the way; PMI/chi2 round at 6 dp
  after exact rational arithmetic in doubles (same ln parity contract
  as the BM25/DSIR scoring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.ngrams import shifted_ngram_arrays


def _toks(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda x: x != "")


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """(w1, w2, n_pair, n_w1, n_w2, pmi) for adjacent word pairs with
    ``n_pair >= min_pair_count``, PMI in nats rounded to 6 dp,
    optionally top-k by (pmi desc, w1, w2).

    Probabilities use the bigram-position total for p(a,b) and the
    token total for p(a), p(b) — the standard estimator; both totals
    are corpus constants broadcast into the expression.
    """
    toks = _toks(text_col)
    bigrams = df.select(
        F.explode(
            F.when(F.size(toks) >= 2, shifted_ngram_arrays(toks, 2))
            .otherwise(F.array().cast("array<string>"))
        ).alias("__bg")
    )
    pair_counts = (
        bigrams.select(
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("__bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    unigrams = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    totals = df.select(
        F.sum(F.size(toks)).alias("n_tok"),
        F.sum(F.greatest(F.size(toks) - 1, F.lit(0))).alias("n_bg"),
    # driver-bound: 1 scalar row — corpus totals
    ).first()
    n_tok, n_bg = float(totals["n_tok"]), float(totals["n_bg"])
    joined = (
        pair_counts.join(
            unigrams.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            unigrams.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.lit(n_bg))
            / ((F.col("n_w1") / F.lit(n_tok)) * (F.col("n_w2") / F.lit(n_tok)))
        ),
        6,
    )
    out = joined.select(
        "w1", "w2",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.col("n_w1").cast("long").alias("n_w1"),
        F.col("n_w2").cast("long").alias("n_w2"),
        pmi.alias("pmi"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)
    return out


def chi_square_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row: (n, df_degrees, chi2, cramers_v) for the contingency
    table of two categorical columns. NULL categories count as their
    own level (audits care about missingness structure too) via a
    sentinel; chi2/cramers_v rounded to 6 dp.
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    obs = (
        df.select(a.alias("__a"), b.alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = obs.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = obs.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    # driver-bound: 1 scalar row — grand total
    n = obs.agg(F.sum("__o")).first()[0]
    if not n:
        raise ValueError("chi_square_association: empty input")
    cells = obs.join(ra, "__a").join(cb, "__b")
    exp = F.col("__ra") * F.col("__cb") / F.lit(float(n))
    # Per-cell terms round to DECIMAL(28,10) BEFORE the sum (decimal
    # sums are order-independent — the house determinism rule), so the
    # scalar replays exactly in the oracle regardless of partitioning.
    dec10 = "decimal(28,10)"
    chi2_cells = cells.select(
        F.round((F.col("__o") - exp) * (F.col("__o") - exp) / exp, 10)
        .cast(dec10)
        .alias("__c"),
        F.round(exp, 10).cast(dec10).alias("__e"),
    )
    # zero-observed cells contribute expected mass: chi2 = sum over
    # OBSERVED cells of (o-e)^2/e  +  sum over missing cells of e.
    # Σ_missing e = n − Σ_observed e, so no |A|×|B| grid is ever built.
    sums = chi2_cells.agg(
        F.sum("__c").alias("__sc"), F.sum("__e").alias("__se")
    # driver-bound: 1 scalar row — marginals total
    ).first()
    chi2 = float(sums["__sc"]) + (float(n) - float(sums["__se"]))
    n_a = ra.count()
    n_b = cb.count()
    dof = (n_a - 1) * (n_b - 1)
    v = (chi2 / (n * min(n_a - 1, n_b - 1))) ** 0.5 if dof > 0 else 0.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(n), int(dof), round(chi2, 6), round(v, 6))],
        "n long, df_degrees long, chi2 double, cramers_v double",
    )


def skipgram_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    min_pair_count: int = 5,
    top_k: int | None = 50,
) -> DataFrame:
    """Windowed skip-gram co-occurrence PMI (the word2vec/GloVe
    counting step, Church & Hanks 1990 association): unordered word
    pairs within ``window`` token positions, scored
    ``ln((n_pair/T) / (p(w1) p(w2)))`` where T is the total skip-gram
    pair count and p(w) the corpus unigram share.

    Shape: tokens posexplode to (doc, pos, w); co-occurrence is a
    SELF-JOIN ON THE DOCUMENT KEY with the positional band
    ``1 <= pos_b - pos_a <= window`` — pair volume is ~window x
    tokens (linear, constant factor = window), never tokens². Pairs
    canonicalize to (least, greatest) so both directions accumulate
    into one row. T and the token total come from corpus-constant
    1-row aggregates broadcast into the expression (no driver
    collect).

    Output: ``(w1, w2, n_pair, n_w1, n_w2, pmi)`` with
    ``n_pair >= min_pair_count``, PMI rounded to 6 dp, optionally
    top-k by (pmi desc, w1, w2).
    """
    toks = _toks(text_col)
    pos = df.select(
        F.col(id_col).alias("__id"), F.posexplode(toks).alias("__p", "__w")
    )
    a = pos.select("__id", F.col("__p").alias("__pa"), F.col("__w").alias("__wa"))
    b = pos.select("__id", F.col("__p").alias("__pb"), F.col("__w").alias("__wb"))
    co = a.join(b, "__id").filter(
        (F.col("__pb") - F.col("__pa") >= 1)
        & (F.col("__pb") - F.col("__pa") <= window)
    )
    pairs_all = co.select(
        F.least("__wa", "__wb").alias("w1"),
        F.greatest("__wa", "__wb").alias("w2"),
    ).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    # T counts ALL skip-gram positions (pre-prune) — the probability
    # denominator must not depend on the reporting threshold
    totals_pair = pairs_all.agg(F.sum("n_pair").alias("__t"))
    pairs = pairs_all.filter(F.col("n_pair") >= min_pair_count)
    unigrams = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    totals_tok = df.select(F.sum(F.size(toks)).alias("__ntok"))
    joined = (
        pairs.join(
            unigrams.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            unigrams.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals_pair))
        .crossJoin(F.broadcast(totals_tok))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.col("__t").cast("double"))
            / (
                (F.col("n_w1") / F.col("__ntok").cast("double"))
                * (F.col("n_w2") / F.col("__ntok").cast("double"))
            )
        ),
        6,
    )
    out = joined.select(
        "w1", "w2",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.col("n_w1").cast("long").alias("n_w1"),
        F.col("n_w2").cast("long").alias("n_w2"),
        pmi.alias("pmi"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)
    return out


def skipgram_pmi_sql(
    rows: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    min_pair_count: int = 5,
    top_k: int | None = 50,
) -> str:
    """DuckDB twin of :func:`skipgram_pmi`."""
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return rf"""
    WITH tk AS (
      SELECT {id_col} AS id,
             list_filter(string_split_regex(trim(lower({text_col})),
                                            '\s+'),
                         x -> x <> '') AS toks
      FROM {rows}
    ),
    pos AS (
      SELECT id, toks[i] AS w, i AS p
      FROM tk, unnest(generate_series(1, len(toks))) AS g(i)
    ),
    co AS (
      SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
      FROM pos a JOIN pos b
        ON a.id = b.id AND b.p - a.p BETWEEN 1 AND {window}
    ),
    pairs_all AS (
      SELECT w1, w2, count(*) AS n_pair FROM co GROUP BY 1, 2
    ),
    t AS (SELECT sum(n_pair) AS t FROM pairs_all),
    uc AS (
      SELECT w, count(*) AS n_w
      FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w
    ),
    ntok AS (SELECT sum(len(toks)) AS n_tok FROM tk)
    SELECT p.w1, p.w2,
           CAST(p.n_pair AS BIGINT) AS n_pair,
           CAST(u1.n_w AS BIGINT) AS n_w1,
           CAST(u2.n_w AS BIGINT) AS n_w2,
           ROUND(ln((p.n_pair / CAST(t.t AS DOUBLE))
                    / ((u1.n_w / CAST(ntok.n_tok AS DOUBLE))
                       * (u2.n_w / CAST(ntok.n_tok AS DOUBLE)))), 6)
             AS pmi
    FROM pairs_all p
    JOIN uc u1 ON u1.w = p.w1
    JOIN uc u2 ON u2.w = p.w2
    CROSS JOIN t CROSS JOIN ntok
    WHERE p.n_pair >= {min_pair_count}
    ORDER BY pmi DESC, p.w1, p.w2 {limit}
    """


def gtest_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
    top_k: int | None = 50,
) -> DataFrame:
    """Log-likelihood-ratio (G²) collocations — Dunning (1993)
    "Accurate Methods for the Statistics of Surprise and
    Coincidence": the bigram association test that, unlike PMI,
    doesn't blow up on rare pairs, which is why production collocation
    extraction ships G² rather than raw PMI.

    Per adjacent bigram the 2x2 contingency is built from bigram
    POSITION margins (first-word count, second-word count, total
    positions); G² = 2·Σ O·ln(O/E) over the four cells (empty cells
    contribute 0). Same count substrate as :func:`pmi_collocations`
    — hash aggregates only; margins and the total are
    vocabulary-/corpus-constant frames joined or broadcast back.

    Output: ``(w1, w2, n_pair, n_w1_first, n_w2_second, g2)`` with
    ``n_pair >= min_pair_count``, G² rounded to 6, optional top-k by
    (g2 desc, w1, w2).
    """
    toks = _toks(text_col)
    bigrams = df.select(
        F.explode(
            F.when(F.size(toks) >= 2, shifted_ngram_arrays(toks, 2))
            .otherwise(F.array().cast("array<string>"))
        ).alias("__bg")
    ).select(
        F.split_part(F.col("__bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("__bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    pairs = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    row_m = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    col_m = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    total = bigrams.agg(F.count(F.lit(1)).alias("__n"))
    j = (
        pairs.join(row_m, "w1")
        .join(col_m, "w2")
        .crossJoin(F.broadcast(total))
    )
    o11 = F.col("n_pair").cast("double")
    o12 = (F.col("n1") - F.col("n_pair")).cast("double")
    o21 = (F.col("n2") - F.col("n_pair")).cast("double")
    o22 = (
        F.col("__n") - F.col("n1") - F.col("n2") + F.col("n_pair")
    ).cast("double")
    n = F.col("__n").cast("double")
    r1, r2 = o11 + o12, o21 + o22
    c1, c2 = o11 + o21, o12 + o22

    def term(o: F.Column, e: F.Column) -> F.Column:
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    g2 = F.lit(2.0) * (
        term(o11, r1 * c1 / n)
        + term(o12, r1 * c2 / n)
        + term(o21, r2 * c1 / n)
        + term(o22, r2 * c2 / n)
    )
    out = j.select(
        "w1",
        "w2",
        F.col("n_pair").cast("bigint").alias("n_pair"),
        F.col("n1").cast("bigint").alias("n_w1_first"),
        F.col("n2").cast("bigint").alias("n_w2_second"),
        F.round(g2, 6).alias("g2"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("g2"), "w1", "w2").limit(top_k)
    return out


def gtest_collocations_sql(
    rows: str,
    text_col: str = "text",
    min_pair_count: int = 5,
    top_k: int | None = 50,
) -> str:
    """DuckDB twin of :func:`gtest_collocations`."""
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return rf"""
    WITH tk AS (
      SELECT list_filter(string_split_regex(trim(lower({text_col})),
                                            '\s+'),
                         x -> x <> '') AS toks
      FROM {rows}
    ),
    bg AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM tk, unnest(generate_series(1, greatest(0, len(toks) - 1)))
           AS g(i)
    ),
    pairs AS (
      SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2
      HAVING count(*) >= {min_pair_count}
    ),
    rm AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
    cm AS (SELECT w2, count(*) AS n2 FROM bg GROUP BY w2),
    tot AS (SELECT count(*) AS n FROM bg),
    cells AS (
      SELECT p.w1, p.w2, p.n_pair, rm.n1, cm.n2, tot.n,
             CAST(p.n_pair AS DOUBLE) AS o11,
             CAST(rm.n1 - p.n_pair AS DOUBLE) AS o12,
             CAST(cm.n2 - p.n_pair AS DOUBLE) AS o21,
             CAST(tot.n - rm.n1 - cm.n2 + p.n_pair AS DOUBLE) AS o22
      FROM pairs p
      JOIN rm ON rm.w1 = p.w1
      JOIN cm ON cm.w2 = p.w2
      CROSS JOIN tot
    )
    SELECT w1, w2,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(n1 AS BIGINT) AS n_w1_first,
           CAST(n2 AS BIGINT) AS n_w2_second,
           ROUND(2.0 * (
             CASE WHEN o11 > 0 THEN o11 * ln(o11 / ((o11+o12)*(o11+o21)/n)) ELSE 0 END
           + CASE WHEN o12 > 0 THEN o12 * ln(o12 / ((o11+o12)*(o12+o22)/n)) ELSE 0 END
           + CASE WHEN o21 > 0 THEN o21 * ln(o21 / ((o21+o22)*(o11+o21)/n)) ELSE 0 END
           + CASE WHEN o22 > 0 THEN o22 * ln(o22 / ((o21+o22)*(o12+o22)/n)) ELSE 0 END
           ), 6) AS g2
    FROM cells
    ORDER BY g2 DESC, w1, w2 {limit}
    """
