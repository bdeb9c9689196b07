"""Distributed global ranking — row_number / rank / percent_rank over
a GLOBAL ordering without the single-task window.

``F.percent_rank().over(Window.orderBy(c))`` forces
``Exchange SinglePartition`` of the whole input: every row funnels
through one task — the canonical Spark scale trap (fine on a 10k-row
dimension, fatal on anything that grows with the data). The round-3
plan audit caught exactly that shape in q13 over the supplier table,
which grows linearly with scale factor.

The scalable shape is the two-phase rank this codebase already uses in
``dsir.dsir_select`` and ``sampling.epoch_shuffle_rank``, factored out
here for reuse:

1. range-partition by the sort key (contiguous key ranges per
   partition),
2. per-partition local ``row_number`` (parallel; state = 1 counter),
3. per-partition counts (O(partitions) rows) exclusive-prefix-summed
   through a partition-count-sized window and broadcast back as
   offsets.

``rank()`` tie semantics (ties share the MINIMUM position) come from a
``min(row_number) over (partition by order-value)`` pass — a per-value
group window whose state is bounded by the tie multiplicity, never the
table. ``percent_rank`` is then ``(rank - 1) / (n - 1)`` with the row
count joined in as a broadcast literal (the W7 grand-total pattern —
no single-partition shuffle anywhere in the plan).

The ``repartitionByRange`` boundaries are RNG-sampled, so the frame is
``localCheckpoint``-pinned before both consuming branches — the same
double-evaluation hazard documented at ``sampling.epoch_shuffle_rank``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_row_number(
    df: DataFrame,
    sort_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` in ``sort_cols`` order (which must
    be a unique total order for a deterministic result), computed with
    partition-local windows + broadcast offsets. Adds ``out_col``."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    lw = Window.partitionBy("__pid").orderBy(*sort_cols)
    local = ranged.withColumn("__local", F.row_number().over(lw))
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__t"))
    # O(partitions) rows — the deliberate tiny single-task step
    tw = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(tw), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__local", "__off")
    )


def global_percent_rank(
    df: DataFrame,
    order_col: str,
    unique_col: str,
    out_col: str = "pct_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``percent_rank() OVER (ORDER BY order_col)`` — identical
    semantics (ties share the minimum rank; result is
    ``(rank-1)/(n-1)``, and 0.0 for a single-row input) — with no
    data-sized single-partition exchange in the plan. ``unique_col``
    breaks row_number ties arbitrarily; it does not affect the output
    because tied rows collapse to the same rank anyway."""
    rn = two_phase_row_number(
        df,
        [F.asc(order_col), F.asc(unique_col)],
        out_col="__rn",
        num_partitions=num_partitions,
    )
    # tie collapse: per-order-value group window, state = multiplicity
    tie = Window.partitionBy(order_col)
    ranked = rn.withColumn("__rank", F.min("__rn").over(tie))
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            out_col,
            F.when(
                F.col("__n") > 1,
                (F.col("__rank") - 1).cast("double")
                / (F.col("__n") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__rn", "__rank", "__n")
    )


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float]
) -> DataFrame:
    """Exact linearly-interpolated quantiles (the ``quantile_cont`` /
    ``F.percentile`` definition: position k = (n−1)·q over the sorted
    values, interpolating between the two adjacent order statistics)
    WITHOUT the single-task sort.

    ``F.percentile`` is an ObjectHashAggregate that ships every value
    into one task and sorts there — fine on a bounded frame, fatal on
    a corpus (the q77 plan at 100 TB). The scalable exact shape is the
    Mann-Whitney machinery: ONE map-side-combinable aggregate to
    distinct-value counts, :func:`~.packing.global_cumsum` for rank
    offsets, then each requested quantile probes the cumulative table
    for its two bracketing order statistics (a constant-size spine ×
    distinct-values range join — Catalyst broadcasts the spine).

    Determinism: the target position is computed in DOUBLE exactly
    as both engines' own implementations do (pos = (n−1)·q —
    identical IEEE expression, identical rounding); the interpolation is
    ``vlo·(1−frac) + vhi·frac`` — the exact expression form BOTH
    Spark's percentile and DuckDB's quantile_cont evaluate (the
    algebraically-equal ``vlo + frac·(vhi−vlo)`` rounds one ulp
    differently on extreme magnitudes; hypothesis-found). Output:
    ``(q, n, quantile)`` — quantile UNROUNDED (callers round to
    their grid).
    """
    from dbt_incremental_ci_spark.operators.packing import global_cumsum

    if not qs:
        # round-11 ADVICE: the wide 1-row aggregate below is built with
        # one expression per requested quantile, so qs=[] would call
        # .agg() with zero expressions and raise at plan time; the old
        # join shape returned an empty frame — preserve that contract.
        return df.sparkSession.createDataFrame(
            [], "q double, n bigint, quantile double"
        )
    g = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=False)  # cumsum + total both read it
    )
    c = global_cumsum(g, "__v", "__cnt", out_col="__cum").localCheckpoint(
        eager=False  # probed once per bracketing side
    )
    tot = g.agg(F.sum("__cnt").alias("__n"))
    spine = df.sparkSession.createDataFrame(
        [(float(x),) for x in qs], "q double"
    )
    # position in DOUBLE, exactly as both engines' implementations do:
    # pos = (n-1)*q, kf = floor(pos), frac = pos - kf. An integer-micro
    # "exact" position was tried and DIVERGES from F.percentile /
    # quantile_cont whenever (n-1)*q rounds (e.g. 3*0.1 — hypothesis-
    # found); matching the engines' own IEEE expression IS the
    # deterministic choice.
    pos = (F.col("__n") - 1).cast("double") * F.col("q")
    tq = spine.crossJoin(F.broadcast(tot)).select(
        "q",
        "__n",
        F.floor(pos).cast("bigint").alias("__kf"),
        (pos - F.floor(pos)).alias("__frac"),
    )
    # Round-11 (guide §2.4): the order-statistic probes used to be a
    # range join per bracketing side — a BroadcastNestedLoopJoin of
    # the k-row probe spine against the WHOLE cumulative table,
    # emitting every (probe, cum ≥ rank) match (half the distinct
    # values per probe on average) into a re-aggregating min. The
    # ranks are just 2k scalars derived from (n, q) with q known at
    # build time, so they now ride ONE wide 1-row broadcast and all
    # 2k bracketing values come from a single conditional-min pass
    # over the cumulative table (min(v | cum ≥ rank_i) — identical
    # semantics, no join fan-out, one scan instead of two). Paired
    # A/B at sf0.1 on q77 (3 quantiles over the lineitem price
    # distinct values): medratio 0.906 over 5 pairs — a real but
    # modest win at this scale (the distinct-value aggregate and
    # cumsum dominate); the structural point is removing the
    # BNL probe-fan-out, which grows with the distinct-value count.
    tqw = tq.agg(
        F.max("__n").alias("__n"),
        *[
            expr
            for i, _ in enumerate(qs)
            for expr in (
                F.max(
                    F.when(F.col("q") == F.lit(float(qs[i])), F.col("__kf") + 1)
                ).alias(f"__lo_{i}"),
                F.max(
                    F.when(
                        F.col("q") == F.lit(float(qs[i])),
                        F.col("__kf")
                        + 1
                        + F.when(F.col("__frac") > 0, 1).otherwise(0),
                    )
                ).alias(f"__hi_{i}"),
                F.max(
                    F.when(F.col("q") == F.lit(float(qs[i])), F.col("__frac"))
                ).alias(f"__frac_{i}"),
            )
        ],
    )
    br = c.crossJoin(F.broadcast(tqw)).agg(
        *[
            expr
            for i, _ in enumerate(qs)
            for expr in (
                F.min(
                    F.when(F.col("__cum") >= F.col(f"__lo_{i}"), F.col("__v"))
                ).alias(f"__vlo_{i}"),
                F.min(
                    F.when(F.col("__cum") >= F.col(f"__hi_{i}"), F.col("__v"))
                ).alias(f"__vhi_{i}"),
            )
        ],
    )
    return (
        br.crossJoin(F.broadcast(tqw))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(qv)).alias("q"),
                            F.col("__n").cast("bigint").alias("n"),
                            # lo*(1-d) + hi*d — the EXACT expression
                            # form BOTH Spark's percentile and DuckDB's
                            # quantile_cont evaluate; lo + d*(hi-lo) is
                            # mathematically equal but rounds one ulp
                            # differently on extreme magnitudes
                            # (hypothesis-found)
                            (
                                F.col(f"__vlo_{i}")
                                * (F.lit(1.0) - F.col(f"__frac_{i}"))
                                + F.col(f"__vhi_{i}") * F.col(f"__frac_{i}")
                            ).alias("quantile"),
                        )
                        for i, qv in enumerate(qs)
                    ]
                )
            ).alias("__r")
        )
        # empty-input parity with the join shape (zero rows, not k
        # NULL rows: __n is NULL when the value frame is empty)
        .where(F.col("__r.n").isNotNull())
        .select("__r.q", "__r.n", "__r.quantile")
    )


def exact_quantiles_sql(
    rows: str, value_expr: str, qs: list[float]
) -> str:
    """DuckDB twin of :func:`exact_quantiles` (plain window cumsum +
    the same DOUBLE position arithmetic: pos = (n-1)*q in IEEE double,
    matching F.percentile / quantile_cont — see the inline note in
    :func:`exact_quantiles` on why integer-micro positions diverge)."""
    spine = " UNION ALL ".join(f"SELECT {float(x)!r} AS q" for x in qs)
    return f"""
    WITH g AS (
      SELECT CAST({value_expr} AS DOUBLE) AS v, count(*) AS cnt
      FROM {rows} WHERE {value_expr} IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT *, SUM(cnt) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ),
    tot AS (SELECT SUM(cnt) AS n FROM g),
    spine AS ({spine}),
    tq AS (
      SELECT q, n,
             CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) AS kf,
             CAST(n - 1 AS DOUBLE) * q
               - floor(CAST(n - 1 AS DOUBLE) * q) AS frac
      FROM spine, tot
    ),
    vlo AS (
      SELECT tq.q, MIN(c.v) AS vlo FROM tq JOIN c ON c.cum >= tq.kf + 1
      GROUP BY tq.q
    ),
    vhi AS (
      SELECT tq.q, MIN(c.v) AS vhi FROM tq
      JOIN c ON c.cum >= tq.kf + 1 + CASE WHEN tq.frac > 0 THEN 1 ELSE 0 END
      GROUP BY tq.q
    )
    SELECT tq.q, CAST(tq.n AS BIGINT) AS n,
           vlo.vlo * (1.0 - tq.frac) + vhi.vhi * tq.frac AS quantile
    FROM tq JOIN vlo ON tq.q = vlo.q JOIN vhi ON tq.q = vhi.q
    """


def exact_quantiles_by_key(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Per-group exact interpolated quantiles without per-group
    value-buffer aggregates.

    ``F.percentile`` grouped by a key still collects EVERY group row
    into one task's buffer — per-group corpus-sized state at scale.
    This reduces to distinct (key, value) COUNTS first (map-side
    combinable; the frame is value-grid-bounded — a 2-dp price column
    has at most 10² · range distinct values no matter how many rows),
    then a per-key window cumsum whose task state is the group's
    DISTINCT-value count, then the same DOUBLE position bracketing as
    :func:`exact_quantiles` (pos = (n-1)*q in IEEE double, matching
    F.percentile / quantile_cont), fanned out by a constant quantile
    spine.

    Output: ``(key…, q, n, quantile)`` — quantile unrounded,
    bit-equal to ``F.percentile`` (unit-tested).
    """
    keys = [F.col(k) for k in key_cols]
    g = (
        df.select(*keys, F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy(*key_cols, "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=False)  # cumsum + totals both read it
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.withColumn("__cum", F.sum("__cnt").over(w)).localCheckpoint(
        eager=False  # probed once per bracketing side
    )
    tot = g.groupBy(*key_cols).agg(F.sum("__cnt").alias("__n"))
    qlits = F.array(*[F.lit(float(x)) for x in qs])
    pos = (F.col("__n") - 1).cast("double") * F.col("q")
    tq = tot.select(
        *key_cols,
        "__n",
        F.explode(qlits).alias("q"),
    ).select(
        *key_cols,
        "q",
        "__n",
        # engines' own double position arithmetic — see exact_quantiles
        F.floor(pos).cast("bigint").alias("__kf"),
        (pos - F.floor(pos)).alias("__frac"),
    )
    lo_rank = F.col("__kf") + 1
    hi_rank = lo_rank + F.when(F.col("__frac") > 0, 1).otherwise(0)

    # rename the cumulative table's columns before probing: probe and
    # c share lineage through g, and same-name join conditions trip
    # Spark's ambiguous-self-join analyzer
    c2 = c.select(
        *[F.col(k).alias(f"__ck_{i}") for i, k in enumerate(key_cols)],
        F.col("__v").alias("__cv"),
        F.col("__cum").alias("__ccum"),
    )

    def bracket(rank_expr: F.Column, out: str) -> DataFrame:
        probe = tq.select(*key_cols, "q", rank_expr.alias("__r"))
        cond = [
            probe[k] == c2[f"__ck_{i}"] for i, k in enumerate(key_cols)
        ] + [c2["__ccum"] >= probe["__r"]]
        joined = probe.join(c2, cond)
        return joined.groupBy(*key_cols, "q").agg(
            F.min("__cv").alias(out)
        )

    vlo = bracket(lo_rank, "__vlo")
    vhi = bracket(hi_rank, "__vhi")
    on = [*key_cols, "q"]
    return (
        tq.join(vlo, on)
        .join(vhi, on)
        .select(
            *key_cols,
            "q",
            F.col("__n").cast("bigint").alias("n"),
            # lo*(1-d) + hi*d — the EXACT expression form BOTH
            # Spark's percentile and DuckDB's quantile_cont evaluate;
            # lo + d*(hi-lo) is mathematically equal but rounds one
            # ulp differently on extreme magnitudes (hypothesis-found)
            (
                F.col("__vlo") * (F.lit(1.0) - F.col("__frac"))
                + F.col("__vhi") * F.col("__frac")
            ).alias("quantile"),
        )
    )
