"""Count-min sketch: mergeable sub-linear frequency estimation
(Cormode & Muthukrishnan 2005).

At 100 TB you cannot afford an exact ``groupBy key`` to answer "how
often does each of these keys appear" when the key space is huge and
you only need estimates — but a d×w counter matrix (here 4×1024 =
4096 cells) answers point queries with one-sided error
(est >= exact, over by <= εN with prob 1-δ). Being a linear sketch it
merges across partitions/days/shards by cell-wise addition — the same
partial-aggregate shape Spark's map-side combine already produces.

Build: explode each row into its d (row, bucket) cells → groupBy
(row, bucket) count. Map-side combine collapses each partition to at
most d·w cells before the shuffle, so shuffled bytes are
O(partitions · d · w) regardless of input size. Estimate: explode the
query keys into their d cells, broadcast-join the (tiny) sketch, take
min over the d counters.

Hashing is md5-based (:func:`~.sampling.hash_uniform` family) so a
DuckDB oracle can reproduce the exact same sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, row: int, width: int, salt: str):
    """Row-``row`` bucket for ``key_col``: first 8 md5 hex chars of
    ``key:cm{salt}:{row}`` as an int, mod width."""
    h = F.md5(
        F.concat(
            F.col(key_col).cast("string"), F.lit(f":cm{salt}:{row}")
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width


def _bucket_sql(key_expr: str, row: int, width: int, salt: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':cm{salt}:{row}'), 1, 8))"
        f"::BIGINT % {width})"
    )


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Build the sketch: one output row per non-empty (row, bucket)
    cell with its count. ``explode`` fans each input row into d cells
    map-side; the groupBy's partial aggregation bounds the shuffle at
    d·w cells per partition."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(key_col, r, width, salt).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Point-query estimates for every row of ``keys``: min over the
    d counters. The sketch (≤ d·w rows) is broadcast, so this is a
    map-side join however many keys are queried."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(key_col, r, width, salt).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), on=["r", "b"], how="left")
        .fillna(0, subset=["cnt"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cm_est"))
    )


def countmin_sketch_sql(
    table: str,
    key_expr: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "",
) -> str:
    """DuckDB CTE body producing the identical sketch as
    :func:`countmin_build` (``r``, ``b``, ``cnt``)."""
    parts = [
        f"SELECT {r} AS r, {_bucket_sql(key_expr, r, width, salt)} AS b "
        f"FROM {table}"
        for r in range(depth)
    ]
    union = " UNION ALL ".join(parts)
    return f"SELECT r, b, count(*) AS cnt FROM ({union}) GROUP BY r, b"
