"""Robust per-group statistics for corpus/feature auditing: exact
median + MAD (median absolute deviation), modified-z outlier flags
(Iglewicz–Hoaglin 0.6745·(x−med)/MAD > 3.5), and percentile
winsorization.

This is the exact-stats complement to the engine's mergeable-sketch
path (GK/approx_percentile in q46/q49): exact percentiles shuffle each
group's values once per pass, which is the right trade for audit-grade
numbers on grouped slices; pipelines that only need screening cutoffs
at 100 TB should use the sketch route instead, and corpus-sized groups
should use ``ranks.exact_quantiles_by_key`` (distinct-value cumsum —
identical output, unit-tested; measured SLOWER at gate scale where the
per-group buffer fits in one task, so this module keeps the buffer
form — docs/SCALE.md §6u records the measured trade). Two passes are
inherent (MAD needs the median joined back); both are plain shuffled
aggregates with map-side combine, and the per-group stats table that
joins back onto rows is GROUP-cardinality-sized — broadcastable via
AQE, never forced.

Cross-engine determinism: Spark ``percentile`` and DuckDB
``quantile_cont`` both linearly interpolate the same sorted doubles,
so medians/percentiles are bit-identical; derived thresholds are
continuous functions of them (boundary equality is measure-zero), and
reported means go through decimal casts before summation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_robust_stats(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group…, med, mad, p05, p95) exact robust location/scale."""
    v = F.col(value_col).cast("double")
    first = (
        df.groupBy(*group_cols)
        .agg(
            # ONE percentile buffer for all three points — three
            # separate percentile() aggs each collect their own copy
            # of every group value
            F.expr(
                f"percentile({value_col}, array(0.05, 0.5, 0.95))"
            ).alias("__p")
        )
        .select(
            *group_cols,
            F.col("__p")[1].alias("med"),
            F.col("__p")[0].alias("p05"),
            F.col("__p")[2].alias("p95"),
        )
    ).localCheckpoint(eager=False)
    # ^ group-cardinality rows, but its parent is an exact-percentile
    # object aggregate over every row; the deviations pass AND the
    # final stats join both reference it — truncate so the percentile
    # pass runs once (part of q121 7.0 s -> 2.3 s at sf0.1)
    devs = df.join(first, group_cols).select(
        *group_cols, F.abs(v - F.col("med")).alias("__dev")
    )
    mad = devs.groupBy(*group_cols).agg(
        F.expr("percentile(__dev, 0.5)").alias("mad")
    )
    return first.join(mad, group_cols)


def flag_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_cut: float = 3.5,
) -> DataFrame:
    """Rows + ``is_outlier`` via the modified z-score: |x − med| >
    z_cut · MAD / 0.6745. Groups with MAD = 0 flag nothing (the
    conventional degenerate-scale behavior)."""
    stats = group_robust_stats(df, group_cols, value_col).localCheckpoint(
        eager=False
    )
    v = F.col(value_col).cast("double")
    thresh = F.lit(z_cut) * F.col("mad") / F.lit(0.6745)
    return df.join(stats, group_cols).withColumn(
        "is_outlier",
        (F.col("mad") > 0) & (F.abs(v - F.col("med")) > thresh),
    )


def winsorize(value: Column, lo: Column, hi: Column) -> Column:
    """Clip to [lo, hi] — pure expression, map-only once the per-group
    percentile bounds are joined in."""
    return F.least(F.greatest(value, lo), hi)


def trimmed_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Per-group trimmed and winsorized means — the rank-based robust
    location estimates (drop / clamp the extreme ``trim`` fraction on
    EACH side) used to summarize skewed measures (doc lengths, spend,
    latencies) without letting outliers move the aggregate.

    Exact rank semantics: rows rank ascending by value with an
    ``id_col`` tiebreaker; ``cut = floor(trim * n)`` rows are dropped
    from each end (trimmed) or clamped to the boundary values kept
    (winsorized: cut * lo_kept + inner sum + cut * hi_kept, over n).
    Values aggregate as DECIMAL(18,2) so every sum is order-exact;
    the means are single float divisions. One group-keyed shuffle +
    in-partition sort (the standard per-group window shape — groups
    shard across executors at 100 TB); output is group-cardinality-
    sized: ``(group, n, n_trimmed, mean, trimmed_mean,
    winsorized_mean)``.
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    v = F.col(value_col).cast("decimal(18,2)")
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col).alias("grp"),
        v.alias("__v"),
        F.row_number().over(w).alias("__i"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    cut = F.floor(F.lit(trim) * F.col("__n")).cast("int")
    kept = (F.col("__i") > cut) & (F.col("__i") <= F.col("__n") - cut)
    agg = ranked.groupBy("grp").agg(
        F.max("__n").cast("bigint").alias("n"),
        F.sum("__v").alias("__sum_all"),
        F.sum(F.when(kept, F.col("__v"))).alias("__sum_kept"),
        F.count(F.when(kept, F.lit(1))).cast("bigint").alias(
            "n_trimmed"
        ),
        F.min(F.when(kept, F.col("__v"))).alias("__lo"),
        F.max(F.when(kept, F.col("__v"))).alias("__hi"),
        F.max(cut).cast("bigint").alias("__cut"),
    )
    wins_sum = (
        F.col("__sum_kept")
        + F.col("__cut").cast("decimal(18,0)") * F.col("__lo")
        + F.col("__cut").cast("decimal(18,0)") * F.col("__hi")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        "n_trimmed",
        F.round(
            F.col("__sum_all").cast("double") / F.col("n"), 6
        ).alias("mean"),
        F.round(
            F.col("__sum_kept").cast("double") / F.col("n_trimmed"), 6
        ).alias("trimmed_mean"),
        F.round(
            wins_sum.cast("double") / F.col("n"), 6
        ).alias("winsorized_mean"),
    )


def trimmed_stats_sql(
    rows: str,
    group_col: str,
    value_col: str,
    id_col: str,
    trim: float = 0.1,
) -> str:
    """DuckDB twin of :func:`trimmed_stats`."""
    return f"""
    WITH ranked AS (
      SELECT {group_col} AS grp,
             CAST({value_col} AS DECIMAL(18,2)) AS v,
             row_number() OVER (PARTITION BY {group_col}
               ORDER BY {value_col} ASC, {id_col} ASC) AS i,
             count(*) OVER (PARTITION BY {group_col}) AS n
      FROM {rows}
    ),
    marked AS (
      SELECT grp, v, n,
             CAST(floor(CAST({trim!r} AS DOUBLE) * n) AS INT) AS cut,
             (i > CAST(floor(CAST({trim!r} AS DOUBLE) * n) AS INT)
              AND i <= n - CAST(floor(CAST({trim!r} AS DOUBLE) * n)
                AS INT)) AS kept
      FROM ranked
    ),
    agg AS (
      SELECT grp,
             CAST(max(n) AS BIGINT) AS n,
             sum(v) AS sum_all,
             sum(CASE WHEN kept THEN v END) AS sum_kept,
             CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT)
               AS n_trimmed,
             min(CASE WHEN kept THEN v END) AS lo,
             max(CASE WHEN kept THEN v END) AS hi,
             CAST(max(cut) AS BIGINT) AS cut
      FROM marked GROUP BY grp
    )
    SELECT grp AS {group_col}, n, n_trimmed,
           ROUND(CAST(sum_all AS DOUBLE) / n, 6) AS mean,
           ROUND(CAST(sum_kept AS DOUBLE) / n_trimmed, 6)
             AS trimmed_mean,
           ROUND(CAST(sum_kept
                      + CAST(cut AS DECIMAL(18,0)) * lo
                      + CAST(cut AS DECIMAL(18,0)) * hi
                  AS DOUBLE) / n, 6) AS winsorized_mean
    FROM agg
    """


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    id_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact weighted quantiles per group: the smallest value whose
    cumulative weight reaches q·W — "the median transaction weighted
    by quantity", "the p95 doc length weighted by token count". The
    weighted complement to the unweighted exact percentiles
    (q46) and the mergeable sketches (q49/q194).

    Exactness contract: weights aggregate in integer centi-units
    (DECIMAL(18,2) × 100), cumulative weights are exact integers over
    a (value, ``id_col``) total order per group, and the q·W
    threshold is ``ceil`` of a double product of exact integers — the
    same expression in both engines, so the selected row is
    bit-identical. One group-keyed shuffle + in-partition sort, a
    |groups|×|qs| broadcast spine, and a group-keyed re-aggregate;
    nothing data-sized funnels to one task. Output: ``(group, q,
    total_weight, wq)``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 < q_ <= 1.0 for q_ in qs):
        raise ValueError(f"quantiles must lie in (0, 1], got {qs}")
    wcent = (
        F.col(weight_col).cast("decimal(18,2)") * 100
    ).cast("bigint")
    w = Window.partitionBy("__g").orderBy(
        F.col("__v").asc(), F.col("__id").asc()
    )
    wg = Window.partitionBy("__g")
    # zero-weight rows contribute nothing but tie the cumulative
    # weight with their neighbor, making the min_by(value, cw) pick
    # engine-dependent — drop them (negative weights drop too; the
    # quantile of a signed-weight distribution is undefined here)
    ranked = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.col(id_col).alias("__id"),
        wcent.alias("__w"),
    ).where(F.col("__w") > 0).select(
        "__g",
        "__v",
        F.sum("__w").over(w).alias("__cw"),
        F.sum("__w").over(wg).alias("__tw"),
    )
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(float(q_),) for q_ in sorted(qs)], "q double"
    )
    thr = F.ceil(F.col("q") * F.col("__tw").cast("double")).cast(
        "bigint"
    )
    hit = ranked.crossJoin(F.broadcast(spine)).where(
        F.col("__cw") >= thr
    )
    return (
        hit.groupBy(F.col("__g").alias(group_col), "q")
        .agg(
            (F.max("__tw") / F.lit(100.0)).alias("total_weight"),
            F.min_by("__v", "__cw").alias("wq"),
        )
        .select(
            group_col,
            "q",
            F.round(F.col("total_weight"), 2).alias("total_weight"),
            "wq",
        )
    )


def weighted_quantiles_sql(
    rows: str,
    group_col: str,
    value_col: str,
    weight_col: str,
    id_col: str,
    qs: list[float],
) -> str:
    """DuckDB twin of :func:`weighted_quantiles`."""
    spine = ", ".join(f"(CAST({float(q_)!r} AS DOUBLE))" for q_ in sorted(qs))
    return f"""
    WITH ranked AS (
      SELECT {group_col} AS g, {value_col} AS v,
             sum(CAST(CAST({weight_col} AS DECIMAL(18,2)) * 100
                 AS BIGINT)) OVER (
               PARTITION BY {group_col}
               ORDER BY {value_col} ASC, {id_col} ASC) AS cw,
             sum(CAST(CAST({weight_col} AS DECIMAL(18,2)) * 100
                 AS BIGINT)) OVER (
               PARTITION BY {group_col}) AS tw
      FROM {rows}
      WHERE CAST(CAST({weight_col} AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
    ),
    spine(q) AS (VALUES {spine}),
    hit AS (
      SELECT g, q, v, cw, tw
      FROM ranked CROSS JOIN spine
      WHERE cw >= CAST(ceil(q * CAST(tw AS DOUBLE)) AS BIGINT)
    )
    SELECT g AS {group_col}, q,
           ROUND(max(tw) / 100.0, 2) AS total_weight,
           min_by(v, cw) AS wq
    FROM hit GROUP BY 1, 2
    """


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group quantile normalization against the GLOBAL value
    distribution — the batch-effect correction used when per-source
    measurement drift (one crawler's length counter, one lab's scale)
    must not leak into downstream thresholds: each group's rank-i
    value maps to the global distribution's value at the matching
    quantile, so every group ends up with the same marginal
    distribution.

    Exact integer rank mapping (no float quantile interpolation to
    disagree on): source rank i of n_g maps to global rank
    ``ceil(i * n_ref / n_g)`` — integer arithmetic, identical in both
    engines. Plan: one per-group window sort, one global two-column
    rank frame (value, id tiebreaker — a total order; at 100 TB use
    the two-phase distributed rank in ``ranks.py`` for the reference
    side), and one integer-key join. Output: ``(id, group, value,
    normalized)``.
    """
    # NULL values drop up front: Spark sorts nulls FIRST asc, DuckDB
    # LAST — a NULL measure has no quantile position either way
    df = df.where(F.col(value_col).isNotNull())
    wg = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.row_number().over(wg).alias("__i"),
        F.count(F.lit(1)).over(wn).alias("__ng"),
    )
    wr = Window.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    ref = df.select(
        F.col(value_col).alias("__rv"),
        F.row_number().over(wr).alias("__r"),
    )
    n_ref = df.count()
    # ceil(i * n_ref / n_g): products stay < 2^53, so the double
    # division + ceil is exact and engine-identical
    tgt = F.ceil(
        (F.col("__i").cast("bigint") * F.lit(int(n_ref)))
        / F.col("__ng")
    ).cast("bigint")
    # NOTE: ref is corpus-sized — no broadcast hint (the round-2
    # landmine class); AQE picks the join strategy
    joined = src.withColumn("__r", tgt).join(ref, "__r")
    return joined.select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__v").alias(value_col),
        F.col("__rv").alias("normalized"),
    )


def quantile_normalize_sql(
    rows: str, group_col: str, value_col: str, id_col: str
) -> str:
    """DuckDB twin of :func:`quantile_normalize`."""
    return f"""
    WITH nn AS (
      SELECT * FROM {rows} WHERE {value_col} IS NOT NULL
    ),
    src AS (
      SELECT {id_col} AS id, {group_col} AS g, {value_col} AS v,
             row_number() OVER (PARTITION BY {group_col}
               ORDER BY {value_col} ASC, {id_col} ASC) AS i,
             count(*) OVER (PARTITION BY {group_col}) AS ng
      FROM nn
    ),
    ref AS (
      SELECT {value_col} AS rv,
             row_number() OVER (
               ORDER BY {value_col} ASC, {id_col} ASC) AS r
      FROM nn
    ),
    nref AS (SELECT count(*) AS n FROM nn)
    SELECT src.id AS {id_col}, src.g AS {group_col},
           src.v AS {value_col}, ref.rv AS normalized
    FROM src CROSS JOIN nref
    JOIN ref ON ref.r = CAST(ceil(CAST(src.i AS DOUBLE) * nref.n
                              / src.ng) AS BIGINT)
    """
