"""Layout-aware parquet sinks: clustering for data-skipping and
small-file compaction.

At 100 TB the WRITE layout decides every future read:

- **Clustering** (``write_clustered``): range-partition by the cluster
  key, then sort within each partition. Every output file then covers
  a narrow, mostly-disjoint key range, so parquet row-group min/max
  stats let any later ``WHERE key ...`` scan skip whole files —
  Catalyst's filter pushdown does the rest. This is the poor man's
  Z-order for a single dominant predicate column (the common case);
  multi-column Z-order curves only pay off when several independent
  predicates share the table.
- **Compaction** (``write_compacted``): a 100 TB table ingested by
  many tasks degenerates into millions of KB-sized files; open/footer
  overhead then dominates scans and driver memory (file index). We
  size the output file count from the INPUT bytes (sum of source file
  sizes — an upper bound on the re-encoded size, cheap to compute,
  no extra pass) so each output file lands near ``target_mb``.

Both are plain ``DataFrameWriter`` flows — no RDDs, no driver-side
data movement; the repartition is the only shuffle and it is the
point (it buys every later scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _input_bytes(df: DataFrame) -> int:
    """Upper-bound size estimate from the source files backing ``df``.

    ``inputFiles`` enumerates concrete files for file-based sources —
    metadata only, no data pass. Falls back to 0 (→ one file) for
    non-file plans (in-memory test frames, joins of tiny seeds).
    """
    import os

    total = 0
    for f in df.inputFiles():
        path = f.removeprefix("file:")
        try:
            total += os.path.getsize(path)
        except OSError:
            pass
    return total


def write_compacted(
    df: DataFrame,
    path: str,
    target_mb: int = 512,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``df`` as ~``target_mb``-sized parquet files; returns
    the file count used. Partitioned outputs repartition on the
    partition columns first so each hive partition is written by few
    tasks (otherwise every task opens a writer per partition value —
    the classic small-file explosion)."""
    n = max(1, _input_bytes(df) // (target_mb * 1024 * 1024))
    if partition_by:
        out = df.repartition(int(n), *[F.col(c) for c in partition_by])
        out.write.mode(mode).partitionBy(*partition_by).parquet(path)
    else:
        out = df.repartition(int(n))
        out.write.mode(mode).parquet(path)
    return int(n)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    target_mb: int = 512,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` range-clustered on ``cluster_cols``: file i holds
    the i-th key range, sorted within, so min/max stats prune reads.
    Returns the file count used."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    n = n_files or max(1, _input_bytes(df) // (target_mb * 1024 * 1024))
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(int(n), *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
    return int(n)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int = 16,
) -> F.Column:
    """Morton (Z-order) curve key over numeric ``cols`` as a pure
    Column expression: each column is min-max scaled to ``bits`` bits,
    then the bits are interleaved. Rows close on the curve are close
    in EVERY clustered dimension, so per-file min/max stats stay tight
    on all of them at once — the multi-predicate upgrade over
    single-column range clustering (cf. Delta/Iceberg OPTIMIZE ZORDER).

    ``bounds``: {col: (min, max)}. When omitted they are computed with
    one scalar aggregate — a metadata-scale pass (same class as the
    watermark read); at 100 TB pass table-level bounds in.
    """
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        # driver-bound: 1 row of 2*len(cols) scalars — min/max bounds aggregate
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[c]
        span = float(hi) - float(lo) or 1.0
        s = F.least(
            F.greatest(
                F.floor((F.col(c).cast("double") - float(lo)) / span * top).cast(
                    "bigint"
                ),
                F.lit(0).cast("bigint"),
            ),
            F.lit(top).cast("bigint"),
        )
        scaled.append(s)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    target_mb: int = 512,
    mode: str = "overwrite",
    bounds: dict[str, tuple[float, float]] | None = None,
) -> int:
    """Write ``df`` clustered along the Z-order curve of
    ``cluster_cols``: range-partition + sort on the interleaved key, so
    every file covers a small hyper-box and min/max pruning works for
    predicates on ANY clustered column (tests assert the per-file range
    shrink on the second dimension vs linear clustering)."""
    n = n_files or max(1, _input_bytes(df) // (target_mb * 1024 * 1024))
    key = zorder_key(df, cluster_cols, bounds=bounds)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(int(n), F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
    return int(n)


def zone_map_stats(
    df: DataFrame, zone_col: str, value_col: str
) -> DataFrame:
    """Per-zone min/max/count zone maps for ``value_col`` — the
    file/row-group skipping statistics every columnar layout keeps
    (parquet column chunks, ORC stripes, Delta/Iceberg file stats).
    ``zone_col`` is the storage-zone key (partition value, file id,
    date bucket). One map-side-combined aggregate; output is
    zone-cardinality-sized.
    """
    return df.groupBy(F.col(zone_col).alias("zone")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
    )


def pruning_report(
    df: DataFrame,
    zone_col: str,
    value_col: str,
    predicates: list[tuple[str, float, float]],
) -> DataFrame:
    """Data-skipping effectiveness report: for each closed-range
    predicate ``lo <= value <= hi``, how many zones the zone maps
    let a scan skip, how many rows the surviving zones force it to
    read, and how many rows actually match — the measurement behind
    "is this table worth Z-ordering on this column" (pair with
    ``zorder_key``/``write_zordered``; the same report after
    re-clustering shows the pruning win).

    Plan: the zone-map aggregate (zone-cardinality-sized) is
    cross-joined with the literal predicate frame (|zones| x |preds|,
    both tiny); exact per-predicate match counts come from ONE
    conditional-aggregate pass over the data (no per-predicate
    rescans — the predicate list unrolls into counter columns).
    Output: one row per predicate ``(pred_id, lo, hi, zones_total,
    zones_scanned, rows_total, rows_scanned, rows_matching,
    scan_fraction, false_positive_fraction)``.
    """
    if not predicates:
        raise ValueError("predicates must be non-empty")
    if len(predicates) > 64:
        raise ValueError(
            f"{len(predicates)} predicates would unroll past the "
            "codegen-safe expression budget (docs/SCALE.md §6n); "
            "batch the report"
        )
    zones = zone_map_stats(df, zone_col, value_col)
    v = F.col(value_col).cast("double")
    match_aggs = [
        F.sum(
            F.when(
                (v >= F.lit(float(lo))) & (v <= F.lit(float(hi))),
                1,
            ).otherwise(0)
        ).cast("bigint").alias(f"__m_{pid}")
        for pid, lo, hi in predicates
    ]
    matches = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_total"),
        *match_aggs,
    )
    spark = df.sparkSession
    preds = spark.createDataFrame(
        [(pid, float(lo), float(hi)) for pid, lo, hi in predicates],
        "pred_id string, lo double, hi double",
    )
    overlap = (F.col("v_max").cast("double") >= F.col("lo")) & (
        F.col("v_min").cast("double") <= F.col("hi")
    )
    per_pred = (
        preds.crossJoin(zones)
        .groupBy("pred_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("zones_total"),
            F.sum(overlap.cast("int")).cast("bigint").alias(
                "zones_scanned"
            ),
            F.sum(
                F.when(overlap, F.col("n_rows")).otherwise(0)
            ).cast("bigint").alias("rows_scanned"),
        )
    )
    # unpivot the single-row match frame back to (pred_id, matching)
    match_rows = matches.select(
        "rows_total",
        F.explode(
            F.create_map(
                *[
                    x
                    for pid, _, _ in predicates
                    for x in (F.lit(pid), F.col(f"__m_{pid}"))
                ]
            )
        ).alias("pred_id", "rows_matching"),
    )
    out = per_pred.join(F.broadcast(match_rows), "pred_id")
    return out.select(
        "pred_id",
        "lo",
        "hi",
        "zones_total",
        "zones_scanned",
        "rows_total",
        "rows_scanned",
        "rows_matching",
        F.round(
            F.col("rows_scanned") / F.col("rows_total"), 6
        ).alias("scan_fraction"),
        F.round(
            F.when(
                F.col("rows_scanned") > 0,
                (F.col("rows_scanned") - F.col("rows_matching"))
                / F.col("rows_scanned"),
            ),
            6,
        ).alias("false_positive_fraction"),
    )


def pruning_report_sql(
    rows: str,
    zone_col: str,
    value_col: str,
    predicates: list[tuple[str, float, float]],
) -> str:
    """DuckDB twin of :func:`pruning_report`; ``rows`` is a
    parenthesized row-set subquery."""
    pred_values = ", ".join(
        f"('{pid}', CAST({float(lo)!r} AS DOUBLE), "
        f"CAST({float(hi)!r} AS DOUBLE))"
        for pid, lo, hi in predicates
    )
    return f"""
    WITH zones AS (
      SELECT {zone_col} AS zone, count(*) AS n_rows,
             min({value_col}) AS v_min, max({value_col}) AS v_max
      FROM {rows} GROUP BY 1
    ),
    preds(pred_id, lo, hi) AS (VALUES {pred_values}),
    per_pred AS (
      SELECT pred_id, lo, hi,
             CAST(count(*) AS BIGINT) AS zones_total,
             CAST(sum(CAST((CAST(v_max AS DOUBLE) >= lo
                            AND CAST(v_min AS DOUBLE) <= hi) AS INT))
               AS BIGINT) AS zones_scanned,
             CAST(sum(CASE WHEN CAST(v_max AS DOUBLE) >= lo
                            AND CAST(v_min AS DOUBLE) <= hi
                       THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned
      FROM preds CROSS JOIN zones
      GROUP BY 1, 2, 3
    ),
    match_rows AS (
      SELECT p.pred_id,
             (SELECT CAST(count(*) AS BIGINT) FROM {rows}) AS rows_total,
             (SELECT CAST(count(*) AS BIGINT) FROM {rows} r
              WHERE CAST(r.{value_col} AS DOUBLE) >= p.lo
                AND CAST(r.{value_col} AS DOUBLE) <= p.hi)
               AS rows_matching
      FROM preds p
    )
    SELECT pp.pred_id, pp.lo, pp.hi, pp.zones_total, pp.zones_scanned,
           mr.rows_total, pp.rows_scanned, mr.rows_matching,
           ROUND(CAST(pp.rows_scanned AS DOUBLE) / mr.rows_total, 6)
             AS scan_fraction,
           ROUND(CASE WHEN pp.rows_scanned > 0 THEN
                 CAST(pp.rows_scanned - mr.rows_matching AS DOUBLE)
                   / pp.rows_scanned END, 6)
             AS false_positive_fraction
    FROM per_pred pp JOIN match_rows mr ON pp.pred_id = mr.pred_id
    """
