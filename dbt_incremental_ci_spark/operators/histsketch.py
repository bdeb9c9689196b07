"""Mergeable histogram sketch for quantile monitoring — the fixed-range
equi-width bin-count state every metrics pipeline keeps per shard/day:
counts are trivially mergeable (cell-wise add, like countmin.py), and
quantiles come from the cumulative distribution with linear
interpolation inside the hit bin (the Prometheus/HDR-histogram idiom;
for unknown ranges a t-digest/KLL sketch would adapt, but production
monitors overwhelmingly pin the range and keep the state mergeable and
bit-deterministic).

Shape: one map-side bin expression + a hash aggregate to <= bins rows
(map-side combine bounds shuffled bytes at bins/partition), merge =
groupBy(bin).sum, quantile extraction = one O(bins) cumulative pass.
Out-of-range values clamp into the edge bins (monitored — a clamped
count is a range-misconfiguration signal), NULLs are excluded.

Determinism: bin assignment is the integer-exact ``(v-lo)*bins div
span`` idiom (profiling.equi_width_histogram precedent) on round-6
decimal micro-units; counts are exact; the interpolated quantile is a
single double expression over exact integers, rounded to 6.

No counterpart in the reference repo; part of the sketch surface
(hll.py, countmin.py, bloom.py) this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micro(x) -> int:
    return int(round(x * 1_000_000))


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """The sketch STATE: ``(bin, cnt)``, <= bins rows; bin in
    [0, bins-1], out-of-range values clamped into the edge bins."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    if bins < 2:
        raise ValueError("need bins >= 2")
    lo_m, hi_m = _micro(lo), _micro(hi)
    span = hi_m - lo_m
    vm = (F.round(F.col(value_col), 6).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    base = df.filter(F.col(value_col).isNotNull()).select(vm.alias("__vm"))
    b = F.expr(f"((__vm - {lo_m}) * {bins}) div {span}")
    clamped = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b))
    return (
        base.select(clamped.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise merge (same lo/hi/bins): identical to sketching the
    union directly."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates from the sketch: for each q, the linearly
    interpolated value inside the first bin whose cumulative count
    reaches ceil(q·N). One O(bins) cumulative window (bounded single
    partition) + one row per requested q."""
    lo_m, hi_m = _micro(lo), _micro(hi)
    width = (hi_m - lo_m) / float(bins) / 1_000_000.0
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
    )
    tot = sketch.agg(F.sum("cnt").alias("__n"))
    spine = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # target rank: ceil(q*N) clamped to >= 1 (exact via decimal micro q)
    tq = spine.crossJoin(F.broadcast(tot)).select(
        "q",
        "__n",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(
                "(CAST(CAST(ROUND(q, 6) AS DECIMAL(9,6)) * 1000000 AS BIGINT)"
                " * __n + 999999) div 1000000"
            ),
        ).alias("__r"),
    )
    # first bin with cum >= r: min(bin) over qualifying rows
    hit = (
        tq.join(cum, cum["__cum"] >= tq["__r"])
        .groupBy("q", "__n", "__r")
        .agg(F.min("bin").alias("bin"))
    )
    # re-attach the hit bin's cnt/cum for interpolation
    hit = hit.join(cum, "bin")
    frac = (F.col("__r") - (F.col("__cum") - F.col("cnt"))) / F.col(
        "cnt"
    ).cast("double")
    est = (
        F.lit(lo_m / 1_000_000.0)
        + (F.col("bin") + frac) * F.lit(width)
    )
    return hit.select(
        "q",
        F.col("__n").cast("bigint").alias("n"),
        F.col("bin").cast("int").alias("bin"),
        F.round(est, 6).alias("quantile_est"),
    )


def histogram_sketch_sql(
    table_expr: str, value_expr: str, lo: float, hi: float, bins: int
) -> str:
    """DuckDB twin of :func:`histogram_sketch` (same integer binning)."""
    lo_m, hi_m = _micro(lo), _micro(hi)
    span = hi_m - lo_m
    vm = f"CAST(CAST(ROUND({value_expr}, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    b = f"(({vm} - {lo_m}) * {bins}) // {span}"
    return f"""
      SELECT CAST(GREATEST(0, LEAST({bins - 1}, {b})) AS INT) AS bin,
             count(*) AS cnt
      FROM {table_expr} WHERE {value_expr} IS NOT NULL
      GROUP BY 1
    """


def histogram_quantiles_sql(
    sketch_cte: str, lo: float, hi: float, bins: int, qs: list[float]
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` over a named sketch
    CTE with columns (bin, cnt)."""
    lo_m, hi_m = _micro(lo), _micro(hi)
    width = (hi_m - lo_m) / float(bins) / 1_000_000.0
    q_rows = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM {sketch_cte}
    ),
    tot AS (SELECT sum(cnt) AS n FROM {sketch_cte}),
    spine AS (SELECT * FROM (VALUES {q_rows}) AS t(q)),
    tq AS (
      SELECT q, n,
             GREATEST(1, (CAST(CAST(ROUND(q, 6) AS DECIMAL(9,6)) * 1000000
                               AS BIGINT) * n + 999999) // 1000000) AS r
      FROM spine CROSS JOIN tot
    ),
    hitbin AS (
      SELECT tq.q, tq.n, tq.r, min(cum.bin) AS bin
      FROM tq JOIN cum ON cum.cum >= tq.r
      GROUP BY tq.q, tq.n, tq.r
    ),
    hit AS (SELECT h.*, c.cnt, c.cum FROM hitbin h JOIN cum c USING (bin))
    SELECT q,
           CAST(n AS BIGINT) AS n,
           CAST(bin AS INT) AS bin,
           ROUND({lo_m / 1_000_000.0!r}
                 + (bin + (r - (cum - cnt)) / CAST(cnt AS DOUBLE))
                   * {width!r}, 6) AS quantile_est
    FROM hit
    """
