"""Column profiling: one-pass data-quality summary of a DataFrame
(the ANALYZE/data-audit step every ingestion pipeline runs before
training-data jobs trust a new source).

Per column: row count, null count/fraction, distinct count, min and
max — emitted as one ROW PER COLUMN so downstream checks can join
against expectation tables.

Scale shape: ONE aggregation pass computes every statistic (the
per-column expressions all fold into a single global hash aggregate
with map-side partials); the row-per-column pivot happens on the
resulting single row via ``stack`` — driver never sees the data.
``exact_distinct=False`` (the 100 TB default) uses
``approx_count_distinct`` (HLL, mergeable, single pass);
``exact_distinct=True`` is the oracle-able mode — Spark expands to
one pass per distinct-counted column, acceptable for audit jobs and
exactly what the DuckDB twin computes.

Min/max canonicalization (so value hashes compare across engines):
floating columns are cast to ``decimal(18,2)`` BEFORE min/max and the
result rendered as a fixed-two-decimal string — double-to-string
formatting differs between engines, decimal-to-string does not.
Integers, strings, and dates render via their native cast to string.

No counterpart in the reference repo; part of the data-quality
operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(c: str, dtype: str, agg) -> F.Column:
    if dtype in ("double", "float"):
        return agg(F.col(c).cast("decimal(18,2)")).cast("string")
    return agg(F.col(c)).cast("string")


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_frac, n_distinct,
    min_val, max_val) — one row per profiled column."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")
    dtypes = {c: df.schema[c].dataType.simpleString() for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            _canon(c, dtypes[c], F.min).alias(f"__min_{c}"),
            _canon(c, dtypes[c], F.max).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    stacked = row.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, dtype, n_nonnull, n_distinct, min_val, max_val)"
        ),
    )
    return stacked.select(
        "column",
        "dtype",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("n_nonnull")).alias("n_nulls"),
        F.round(
            F.when(
                F.col("__n") > 0,
                (F.col("__n") - F.col("n_nonnull")) / F.col("__n").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("null_frac"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def equi_width_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: ``(bin, lo, hi, n)``
    with ``bins`` equal-width buckets spanning the column's observed
    [min, max] — the equi-WIDTH complement of
    ``scaling.balanced_range_buckets`` (equi-depth). NULLs are dropped;
    the max value lands in the last bin (right edge inclusive there,
    exclusive elsewhere — NumPy's histogram convention).

    Scale shape: one min/max aggregate whose 1-row result is
    broadcast back (AQE), then a map-side bin expression and one hash
    aggregate of at most ``bins`` groups. Empty bins are materialized
    from a generated spine so the output is always exactly ``bins``
    rows — including the degenerate min == max case, where all mass
    lands in bin 0 and bins 1..bins-1 are emitted empty.

    Determinism across engines: values are quantized to
    ``decimal(18,2)`` (the house canonicalization) and carried as
    BIGINT hundredths, so the bin assignment is pure integer
    arithmetic — ``(v - lo) * bins div span`` — identical in every
    engine; no decimal-division or float-edge ambiguity can shift a
    boundary value between bins. The reported ``lo``/``hi`` edges are
    then derived as doubles of those exact integers.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    cents = (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")
    bounds = df.where(cents.isNotNull()).agg(
        F.min(cents).alias("__lo"), F.max(cents).alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo")
    binned = (
        df.where(cents.isNotNull())
        .select(cents.alias("__v"))
        .crossJoin(bounds)
        .select(
            F.when(span == 0, F.lit(0))
            .otherwise(
                F.least(
                    F.expr(f"((__v - __lo) * {bins}) div (__hi - __lo)"),
                    F.lit(bins - 1),
                )
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
        "__lo",
        "__hi",
    )
    lo_d = F.col("__lo").cast("double") / 100.0
    w_d = span.cast("double") / 100.0 / bins
    return spine.join(binned, "bin", "left").select(
        "bin",
        F.round(lo_d + w_d * F.col("bin"), 6).alias("lo"),
        F.round(
            F.when(F.col("bin") == bins - 1, F.col("__hi").cast("double") / 100.0)
            .otherwise(lo_d + w_d * (F.col("bin") + 1)),
            6,
        ).alias("hi"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
    )


def fd_check(
    df: DataFrame,
    candidates: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit: for each candidate pair
    (determinant → dependent), does every determinant value map to at
    most one dependent value? Output one row per candidate:
    ``(determinant, dependent, n_keys, violating_keys, fd_holds)``.

    The schema-discovery primitive profilers (Metanome/HyFD family —
    Papenbrock et al., VLDB 2015) run at scale: each candidate is ONE
    two-phase aggregate — groupBy(determinant).count_distinct(dependent)
    reduced to a single row — so shuffled bytes scale with determinant
    cardinality, and the union across candidates is len(candidates)
    independent single-row frames (the expectations.py shape). NULL
    dependents count as a value via the count_distinct-over-coalesce
    convention being avoided: count_distinct skips NULLs on both
    engines, so a key mapping to {NULL, 'x'} has one distinct
    dependent — document-compatible with SQL COUNT(DISTINCT).
    """
    outs = []
    for det, dep in candidates:
        per = df.groupBy(det).agg(
            F.count_distinct(F.col(dep)).alias("__nd")
        )
        outs.append(
            per.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("violating_keys"),
            ).withColumn("fd_holds", F.col("violating_keys") == 0)
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def fd_check_sql(table: str, candidates: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`fd_check`."""
    parts = []
    for det, dep in candidates:
        parts.append(f"""
        SELECT '{det}' AS determinant, '{dep}' AS dependent,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violating_keys,
               sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
        FROM (SELECT {det}, count(DISTINCT {dep}) AS nd
              FROM {table} GROUP BY {det})""")
    return " UNION ALL ".join(parts)


def moments_profile(
    df: DataFrame,
    value_cols: list[str],
    decimals: int = 2,
) -> DataFrame:
    """Deterministic skewness/kurtosis profile: one row per column with
    ``(column, n, mean, variance, skewness, kurtosis_excess)``.

    Spark's built-in skewness/kurtosis fold doubles in partition order
    (non-reproducible across runs at 10^12 rows, and not bit-matchable
    cross-engine). Here values are quantized to ``decimals`` places as
    INTEGER ticks, the four raw power sums Σx..Σx⁴ accumulate as
    DECIMAL(38,0) integers — exact and associative on any partitioning
    — and the population moment formulas (m₂/m₃/m₄ about the mean,
    g₁ = m₃/m₂^1.5, g₂ = m₄/m₂² − 3) are a single double expression
    over the exact sums. Skewness/kurtosis are scale-invariant, so the
    tick scale cancels; mean/variance divide the scale back out.
    Overflow headroom: |x| ≤ 10^7 ticks keeps Σx⁴ under 10^38 for 10^9
    rows.

    One union of per-column single-row aggregates (the expectations.py
    shape) — each a map-side-combinable decimal sum.
    """
    scale = 10 ** decimals
    outs = []
    for c in value_cols:
        xc = (
            F.round(F.col(c), decimals).cast(f"decimal(18,{decimals})")
            * scale
        ).cast("bigint")
        df_c = df.filter(F.col(c).isNotNull()).select(xc.alias("__x"))
        x = F.col("__x")
        x2 = (x * x).cast("decimal(38,0)")
        agg = df_c.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast("decimal(38,0)")).alias("s1"),
            F.sum(x2).alias("s2"),
            F.sum(x2 * x).alias("s3"),
            F.sum(x2 * x * x).alias("s4"),
        )
        nd = F.col("n").cast("double")
        m1 = F.col("s1").cast("double") / nd
        m2 = F.col("s2").cast("double") / nd - m1 * m1
        m3 = (
            F.col("s3").cast("double") / nd
            - 3.0 * m1 * (F.col("s2").cast("double") / nd)
            + 2.0 * m1 * m1 * m1
        )
        m4 = (
            F.col("s4").cast("double") / nd
            - 4.0 * m1 * (F.col("s3").cast("double") / nd)
            + 6.0 * m1 * m1 * (F.col("s2").cast("double") / nd)
            - 3.0 * m1 * m1 * m1 * m1
        )
        outs.append(
            agg.select(
                F.lit(c).alias("column"),
                F.col("n").cast("bigint").alias("n"),
                F.round(m1 / scale, 6).alias("mean"),
                F.round(m2 / (scale * scale), 6).alias("variance"),
                F.when(m2 > 0, F.round(m3 / F.pow(m2, F.lit(1.5)), 6)).alias(
                    "skewness"
                ),
                F.when(m2 > 0, F.round(m4 / (m2 * m2) - 3.0, 6)).alias(
                    "kurtosis_excess"
                ),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def moments_profile_sql(
    table: str, value_cols: list[str], decimals: int = 2
) -> str:
    """DuckDB twin of :func:`moments_profile` (HUGEINT power sums,
    same double combination order)."""
    scale = 10 ** decimals
    parts = []
    for c in value_cols:
        xc = (
            f"CAST(CAST(ROUND({c}, {decimals}) AS DECIMAL(18,{decimals}))"
            f" * {scale} AS BIGINT)"
        )
        parts.append(f"""
        SELECT '{c}' AS "column",
               CAST(cnt AS BIGINT) AS n,
               ROUND(m1 / {scale}, 6) AS mean,
               ROUND(m2 / {scale * scale}, 6) AS variance,
               CASE WHEN m2 > 0 THEN ROUND(m3 / pow(m2, 1.5), 6) END
                 AS skewness,
               CASE WHEN m2 > 0 THEN ROUND(m4 / (m2 * m2) - 3.0, 6) END
                 AS kurtosis_excess
        FROM (
          SELECT cnt, m1,
                 CAST(s2 AS DOUBLE) / cnt - m1 * m1 AS m2,
                 CAST(s3 AS DOUBLE) / cnt
                   - 3.0 * m1 * (CAST(s2 AS DOUBLE) / cnt)
                   + 2.0 * m1 * m1 * m1 AS m3,
                 CAST(s4 AS DOUBLE) / cnt
                   - 4.0 * m1 * (CAST(s3 AS DOUBLE) / cnt)
                   + 6.0 * m1 * m1 * (CAST(s2 AS DOUBLE) / cnt)
                   - 3.0 * m1 * m1 * m1 * m1 AS m4
          FROM (
            SELECT count(*) AS cnt,
                   CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) / count(*) AS m1,
                   sum(CAST(x AS HUGEINT) * x) AS s2,
                   sum(CAST(x AS HUGEINT) * x * x) AS s3,
                   sum(CAST(x AS HUGEINT) * x * x * x) AS s4
            FROM (SELECT {xc} AS x FROM {table} WHERE {c} IS NOT NULL)
          )
        )""")
    return " UNION ALL ".join(parts)


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Mutual information between two categorical columns, with the
    marginal entropies and the normalized MI — the dependence profile
    that complements the chi-square independence test (workload q139):
    "is `source` informative about `lang`" asked in bits, the form
    feature-selection and leakage audits want.

    One contingency aggregate over the corpus (map-side combined,
    |X|x|Y| rows), margins by two window sums OVER the contingency
    frame (partitioned by x / by y — cardinality-sized, never
    data-sized), grand total over the same tiny frame. MI / H(X) /
    H(Y) terms are rounded to 12 dp and summed as DECIMAL(26,12)
    (order-exact fold). Output: ONE row ``(n, k_x, k_y, mi_nats,
    mi_bits, h_x, h_y, nmi)`` with nmi = MI / sqrt(H(X) * H(Y))
    (NULL when either entropy is 0).
    """
    cont = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__nxy"))
    wx = Window.partitionBy("__x")
    wy = Window.partitionBy("__y")
    wall = Window.partitionBy()
    withm = cont.select(
        "__x",
        "__y",
        "__nxy",
        F.sum("__nxy").over(wx).alias("__nx"),
        F.sum("__nxy").over(wy).alias("__ny"),
        F.sum("__nxy").over(wall).alias("__n"),
    )
    nxy = F.col("__nxy").cast("double")
    nx = F.col("__nx").cast("double")
    ny = F.col("__ny").cast("double")
    n = F.col("__n").cast("double")
    mi_term = (nxy / n) * F.log(n * nxy / (nx * ny))
    # H(X) terms only once per x: weight by 1/(rows in this x slice)
    # would break exactness — instead emit the x-entropy term on the
    # first y of each x (row_number over a deterministic order)
    rx = F.row_number().over(
        Window.partitionBy("__x").orderBy("__y")
    )
    ry = F.row_number().over(
        Window.partitionBy("__y").orderBy("__x")
    )
    hx_term = F.when(
        rx == 1, F.round(-(nx / n) * F.log(nx / n), 12)
    ).otherwise(F.lit(0.0)).cast("decimal(26,12)")
    hy_term = F.when(
        ry == 1, F.round(-(ny / n) * F.log(ny / n), 12)
    ).otherwise(F.lit(0.0)).cast("decimal(26,12)")
    agg = withm.select(
        "__x",
        "__y",
        F.col("__n").alias("__ntot"),
        F.round(mi_term, 12).cast("decimal(26,12)").alias("__mit"),
        hx_term.alias("__hxt"),
        hy_term.alias("__hyt"),
    ).agg(
        F.max("__ntot").cast("bigint").alias("n"),
        F.count_distinct(F.col("__x")).cast("bigint").alias("k_x"),
        F.count_distinct(F.col("__y")).cast("bigint").alias("k_y"),
        F.sum("__mit").cast("double").alias("__mi"),
        F.sum("__hxt").cast("double").alias("__hx"),
        F.sum("__hyt").cast("double").alias("__hy"),
    )
    ln2 = 0.6931471805599453
    nmi_den = F.sqrt(F.col("__hx") * F.col("__hy"))
    return agg.select(
        "n",
        "k_x",
        "k_y",
        F.round(F.col("__mi"), 9).alias("mi_nats"),
        F.round(F.col("__mi") / F.lit(ln2), 9).alias("mi_bits"),
        F.round(F.col("__hx"), 9).alias("h_x"),
        F.round(F.col("__hy"), 9).alias("h_y"),
        F.round(
            F.when(nmi_den > 0, F.col("__mi") / nmi_den), 9
        ).alias("nmi"),
    )


def mutual_information_sql(rows: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`mutual_information`; ``rows`` is a
    parenthesized row-set subquery."""
    return f"""
    WITH cont AS (
      SELECT {x_col} AS x, {y_col} AS y, count(*) AS nxy
      FROM {rows} GROUP BY 1, 2
    ),
    m AS (
      SELECT x, y, nxy,
             sum(nxy) OVER (PARTITION BY x) AS nx,
             sum(nxy) OVER (PARTITION BY y) AS ny,
             sum(nxy) OVER () AS n,
             row_number() OVER (PARTITION BY x ORDER BY y) AS rx,
             row_number() OVER (PARTITION BY y ORDER BY x) AS ry
      FROM cont
    ),
    terms AS (
      SELECT n,
             x, y,
             CAST(ROUND((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(n AS DOUBLE) * CAST(nxy AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 12)
               AS DECIMAL(26,12)) AS mit,
             CAST(CASE WHEN rx = 1 THEN
               ROUND(-(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 12)
               ELSE 0.0 END AS DECIMAL(26,12)) AS hxt,
             CAST(CASE WHEN ry = 1 THEN
               ROUND(-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 12)
               ELSE 0.0 END AS DECIMAL(26,12)) AS hyt
      FROM m
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(count(DISTINCT x) AS BIGINT) AS k_x,
             CAST(count(DISTINCT y) AS BIGINT) AS k_y,
             CAST(sum(mit) AS DOUBLE) AS mi,
             CAST(sum(hxt) AS DOUBLE) AS hx,
             CAST(sum(hyt) AS DOUBLE) AS hy
      FROM terms
    )
    SELECT n, k_x, k_y,
           ROUND(mi, 9) AS mi_nats,
           ROUND(mi / 0.6931471805599453, 9) AS mi_bits,
           ROUND(hx, 9) AS h_x,
           ROUND(hy, 9) AS h_y,
           ROUND(CASE WHEN sqrt(hx * hy) > 0
                 THEN mi / sqrt(hx * hy) END, 9) AS nmi
    FROM agg
    """


def moments_merge_profile(
    df: DataFrame,
    value_col: str,
    shard_col,
    decimals: int = 2,
) -> DataFrame:
    """Shard-merge proof for the moments profile: accumulate the four
    raw power sums PER SHARD, merge shards by plain addition (power
    sums are the canonical mergeable moment state — Chan, Golub &
    LeVeque 1983 generalizes the pairwise update; raw integer sums
    need no update formula at all), and derive the same
    ``(column, n, mean, variance, skewness, kurtosis_excess)`` row
    :func:`moments_profile` computes directly.

    Because the sums are exact DECIMAL(38,0) integers, merge ≡ direct
    BIT-FOR-BIT — the property that makes the profile incrementally
    maintainable at 100 TB (per-partition/day states, fold on read).
    The workload query oracles this against the DIRECT SQL profile.
    """
    scale = 10 ** decimals
    xc = (
        F.round(F.col(value_col), decimals).cast(f"decimal(18,{decimals})")
        * scale
    ).cast("bigint")
    pts = df.filter(F.col(value_col).isNotNull()).select(
        shard_col.alias("__shard") if not isinstance(shard_col, str)
        else F.col(shard_col).alias("__shard"),
        xc.alias("__x"),
    )
    x = F.col("__x")
    x2 = (x * x).cast("decimal(38,0)")
    per_shard = pts.groupBy("__shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(38,0)")).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x2 * x).alias("s3"),
        F.sum(x2 * x * x).alias("s4"),
    )
    merged = per_shard.agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
        F.sum("s4").alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - m1 * m1
    m3 = (
        F.col("s3").cast("double") / nd
        - 3.0 * m1 * (F.col("s2").cast("double") / nd)
        + 2.0 * m1 * m1 * m1
    )
    m4 = (
        F.col("s4").cast("double") / nd
        - 4.0 * m1 * (F.col("s3").cast("double") / nd)
        + 6.0 * m1 * m1 * (F.col("s2").cast("double") / nd)
        - 3.0 * m1 * m1 * m1 * m1
    )
    return merged.select(
        F.lit(value_col).alias("column"),
        F.col("n").cast("bigint").alias("n"),
        F.round(m1 / scale, 6).alias("mean"),
        F.round(m2 / (scale * scale), 6).alias("variance"),
        F.when(m2 > 0, F.round(m3 / F.pow(m2, F.lit(1.5)), 6)).alias(
            "skewness"
        ),
        F.when(m2 > 0, F.round(m4 / (m2 * m2) - 3.0, 6)).alias(
            "kurtosis_excess"
        ),
    )
