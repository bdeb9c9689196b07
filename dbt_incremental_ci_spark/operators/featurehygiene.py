"""Feature-hygiene operators for tabular/text feature pipelines:
long-tail category collapsing and hashing-trick bucket diagnostics.

The reference engine has no counterpart (its workload is dbt-model
SQL — SURVEY.md §2); these extend the engine for the
training-data-pipeline charter: before features feed a model, the
long tail of a categorical column is folded into an ``__other__``
bucket (stable cardinality across retrains) and the hashing trick's
bucket count is sized by measuring its actual collision load.

Scale design: both operators are one category-keyed aggregate
(map-side combined, vocabulary-sized output) plus
cardinality-sized post-processing — the corpus is never shuffled on
anything but the category/token key, and nothing data-sized reaches
one partition. Bucket ids derive from the engine's md5-based
deterministic hash (``sampling.hash_uniform`` precedent) so the
DuckDB oracle reproduces membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _u32(key: Column, salt: str) -> Column:
    """First-8-hex-digits md5 integer — the engine's deterministic
    32-bit key hash (same bytes as ``sampling.hash_uniform``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


def _u32_sql(key_expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'),"
        f" 1, 8))::BIGINT)"
    )


def rare_category_collapse(
    df: DataFrame, cat_col: str, min_support: int
) -> DataFrame:
    """Fold categories observed fewer than ``min_support`` times into
    ``__other__`` and report the resulting category table — the
    cardinality-stabilizing step before one-hot/target encoding (a
    tail category seen 3 times is noise that changes every retrain).

    One category aggregate, then a vocabulary-sized re-aggregate of
    the collapsed labels. Output: ``(category, n_rows,
    n_source_categories)`` — ``n_source_categories`` counts how many
    raw categories folded into each surviving label (1 for kept
    categories; the tail count for ``__other__``).
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    counts = df.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    lbl = F.when(
        F.col("__n") >= min_support, F.col("__c")
    ).otherwise(F.lit("__other__"))
    return (
        counts.select(lbl.alias("category"), "__n")
        .groupBy("category")
        .agg(
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias(
                "n_source_categories"
            ),
        )
    )


def rare_category_collapse_sql(
    rows: str, cat_col: str, min_support: int
) -> str:
    """DuckDB twin of :func:`rare_category_collapse`; ``rows`` is a
    parenthesized row-set subquery."""
    return f"""
    WITH counts AS (
      SELECT {cat_col} AS c, count(*) AS n FROM {rows} GROUP BY 1
    )
    SELECT CASE WHEN n >= {min_support} THEN c
                ELSE '__other__' END AS category,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_source_categories
    FROM counts GROUP BY 1
    """


def feature_hash_stats(
    df: DataFrame,
    feature_col: str,
    n_buckets: int,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick diagnostics: bucket every distinct feature value
    into ``n_buckets`` via the deterministic md5 hash and report the
    collision load — the measurement that sizes the hash dimension
    ("is 2^18 enough for this vocabulary?") instead of guessing.

    One distinct-feature aggregate (vocabulary-sized), one bucket
    re-aggregate, one single-row summary. Output: ONE row
    ``(n_features, n_buckets, buckets_used, load_factor,
    colliding_buckets, features_in_collisions, collision_rate)``.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    feats = df.select(
        F.col(feature_col).cast("string").alias("__f")
    ).where(F.col("__f").isNotNull()).distinct()
    bucketed = feats.select(
        (_u32(F.col("__f"), salt) % n_buckets).alias("__b")
    )
    per_bucket = bucketed.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nf")
    )
    agg = per_bucket.agg(
        F.sum("__nf").cast("bigint").alias("n_features"),
        F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
        F.sum(F.when(F.col("__nf") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("colliding_buckets"),
        F.sum(F.when(F.col("__nf") > 1, F.col("__nf")).otherwise(0))
        .cast("bigint")
        .alias("features_in_collisions"),
    )
    return agg.select(
        "n_features",
        F.lit(n_buckets).cast("bigint").alias("n_buckets"),
        "buckets_used",
        F.round(
            F.col("buckets_used") / F.lit(float(n_buckets)), 6
        ).alias("load_factor"),
        "colliding_buckets",
        "features_in_collisions",
        F.round(
            F.when(
                F.col("n_features") > 0,
                F.col("features_in_collisions") / F.col("n_features"),
            ),
            6,
        ).alias("collision_rate"),
    )


def feature_hash_stats_sql(
    rows: str, feature_col: str, n_buckets: int, salt: str = "fh"
) -> str:
    """DuckDB twin of :func:`feature_hash_stats`."""
    u = _u32_sql("f", salt)
    return f"""
    WITH feats AS (
      SELECT DISTINCT CAST({feature_col} AS VARCHAR) AS f
      FROM {rows} WHERE {feature_col} IS NOT NULL
    ),
    per_bucket AS (
      SELECT {u} % {n_buckets} AS b, count(*) AS nf
      FROM feats GROUP BY 1
    ),
    agg AS (
      SELECT CAST(sum(nf) AS BIGINT) AS n_features,
             CAST(count(*) AS BIGINT) AS buckets_used,
             CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS colliding_buckets,
             CAST(sum(CASE WHEN nf > 1 THEN nf ELSE 0 END) AS BIGINT)
               AS features_in_collisions
      FROM per_bucket
    )
    SELECT n_features,
           CAST({n_buckets} AS BIGINT) AS n_buckets,
           buckets_used,
           ROUND(buckets_used / CAST({n_buckets} AS DOUBLE), 6)
             AS load_factor,
           colliding_buckets,
           features_in_collisions,
           ROUND(CASE WHEN n_features > 0 THEN
                 CAST(features_in_collisions AS DOUBLE) / n_features
                 END, 6) AS collision_rate
    FROM agg
    """


def split_leakage_audit(
    df: DataFrame,
    unit_col: str,
    fold_col: str,
    label_col: str,
) -> DataFrame:
    """Train/test split hygiene: per-fold size and label balance,
    plus the GROUP-LEAKAGE count — units (users, documents, patients)
    whose rows span more than one fold, the classic eval-inflation
    bug a row-level split introduces when rows correlate within a
    unit. Run this before trusting any eval on a split you didn't
    build group-aware.

    Two aggregates: a (unit → distinct folds) frame (unit-cardinality
    sized) and a per-fold row/label aggregate; the leak totals are a
    1-row reduce broadcast onto the fold-cardinality output. Output:
    one row per fold ``(fold, n_rows, n_units, pos_rate,
    leaky_units_total, leaky_rows_total)`` — leak totals are global,
    repeated per row for a single-frame report.
    """
    per_unit = df.groupBy(F.col(unit_col).alias("__u")).agg(
        F.count_distinct(F.col(fold_col)).alias("__nf"),
        F.count(F.lit(1)).alias("__nr"),
    )
    leaks = per_unit.agg(
        F.sum((F.col("__nf") > 1).cast("int"))
        .cast("bigint")
        .alias("leaky_units_total"),
        F.sum(F.when(F.col("__nf") > 1, F.col("__nr")).otherwise(0))
        .cast("bigint")
        .alias("leaky_rows_total"),
    )
    per_fold = df.groupBy(F.col(fold_col).alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct(F.col(unit_col)).cast("bigint").alias(
            "n_units"
        ),
        F.round(
            F.sum((F.col(label_col).cast("int") > 0).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("pos_rate"),
    )
    return per_fold.crossJoin(F.broadcast(leaks))


def split_leakage_audit_sql(
    rows: str, unit_col: str, fold_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`split_leakage_audit`."""
    return f"""
    WITH per_unit AS (
      SELECT {unit_col} AS u,
             count(DISTINCT {fold_col}) AS nf,
             count(*) AS nr
      FROM {rows} GROUP BY 1
    ),
    leaks AS (
      SELECT CAST(sum(CAST((nf > 1) AS INT)) AS BIGINT)
               AS leaky_units_total,
             CAST(sum(CASE WHEN nf > 1 THEN nr ELSE 0 END) AS BIGINT)
               AS leaky_rows_total
      FROM per_unit
    ),
    per_fold AS (
      SELECT {fold_col} AS fold,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT {unit_col}) AS BIGINT) AS n_units,
             ROUND(CAST(sum(CAST((CAST({label_col} AS INT) > 0)
               AS INT)) AS DOUBLE) / count(*), 6) AS pos_rate
      FROM {rows} GROUP BY 1
    )
    SELECT fold, n_rows, n_units, pos_rate,
           leaky_units_total, leaky_rows_total
    FROM per_fold CROSS JOIN leaks
    """
