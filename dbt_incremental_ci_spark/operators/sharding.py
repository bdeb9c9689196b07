"""Consistent-hash ring sharding — the data-movement audit behind
every reshard/scale-out decision at 100 TB: growing a static
(range/mod) sharding from S to S' shards remaps almost every key
(full-cluster rewrite); a consistent-hash ring with virtual nodes
(Karger et al., STOC'97) moves only ~added/S' of them.

Distributed shape: the ring is MODEL-SIZED (shards × replicas vnode
rows) — it is assembled once into a single sorted-array row and
broadcast; per-key assignment is then a pure array fold (binary-less
successor pick via ``array_min(filter(...))`` — O(V) per row with
V ≤ a few hundred, inside codegen), NO fan-out join and no shuffle.
The movement audit is one hash aggregate.

Determinism: positions come from the md5 ``hash_uniform`` house
variate, identical in the DuckDB twin; the successor pick compares
(pos, shard) structs with exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.sampling import (
    hash_uniform,
    hash_uniform_sql,
)


def _ring(spark, shards: int, replicas: int, salt: str):
    """One-row frame holding the sorted vnode array for a ring."""
    vn = (
        spark.range(shards * replicas)
        .select(
            (F.col("id") % shards).cast("int").alias("shard"),
            F.concat(
                F.lit("ring:"),
                (F.col("id") % shards).cast("string"),
                F.lit(":"),
                (F.col("id") / shards).cast("int").cast("string"),
            ).alias("__vk"),
        )
        .select(
            "shard", hash_uniform(F.col("__vk"), salt).alias("pos")
        )
    )
    return vn.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("shard")))
        ).alias("ring")
    )


def _assign(ring_col: F.Column, pos: F.Column) -> F.Column:
    succ = F.array_min(
        F.filter(ring_col, lambda v: v["pos"] >= pos)
    )
    wrap = F.array_min(ring_col)
    return F.coalesce(succ["shard"], wrap["shard"])


def reshard_movement_audit(
    df: DataFrame,
    key_col: str,
    shards_before: int = 10,
    shards_after: int = 12,
    replicas: int = 8,
    salt: str = "shard",
) -> DataFrame:
    """Fraction of keys that change shard when growing
    ``shards_before`` → ``shards_after``, consistent-hash ring vs
    static range sharding.

    Output, one row per method: ``(method, n_keys, n_moved,
    moved_rate)`` — rate rounded 6. Expect ~(added/after) for
    'consistent' and a large fraction for 'range'.
    """
    spark = df.sparkSession
    ring_a = _ring(spark, shards_before, replicas, salt).select(
        F.col("ring").alias("__ra")
    )
    ring_b = _ring(spark, shards_after, replicas, salt).select(
        F.col("ring").alias("__rb")
    )
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    pos = hash_uniform(F.concat(F.lit("key:"), F.col("__k").cast("string")), salt)
    staged = (
        keys.crossJoin(F.broadcast(ring_a))
        .crossJoin(F.broadcast(ring_b))
        .select(
            pos.alias("__pos"),
            F.col("__ra"),
            F.col("__rb"),
        )
        .select(
            "__pos",
            _assign(F.col("__ra"), F.col("__pos")).alias("__sa"),
            _assign(F.col("__rb"), F.col("__pos")).alias("__sb"),
        )
    )
    consistent = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum((F.col("__sa") != F.col("__sb")).cast("int"))
        .cast("bigint")
        .alias("n_moved"),
    ).select(
        F.lit("consistent").alias("method"),
        "n_keys",
        "n_moved",
        F.round(F.col("n_moved") / F.col("n_keys").cast("double"), 6).alias(
            "moved_rate"
        ),
    )
    rng = keys.select(
        pos.alias("__pos")
    ).select(
        F.floor(F.col("__pos") * shards_before).cast("int").alias("__sa"),
        F.floor(F.col("__pos") * shards_after).cast("int").alias("__sb"),
    )
    range_row = rng.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum((F.col("__sa") != F.col("__sb")).cast("int"))
        .cast("bigint")
        .alias("n_moved"),
    ).select(
        F.lit("range").alias("method"),
        "n_keys",
        "n_moved",
        F.round(F.col("n_moved") / F.col("n_keys").cast("double"), 6).alias(
            "moved_rate"
        ),
    )
    return consistent.unionByName(range_row)


def reshard_movement_audit_sql(
    rows: str,
    key_col: str,
    shards_before: int = 10,
    shards_after: int = 12,
    replicas: int = 8,
    salt: str = "shard",
) -> str:
    """DuckDB twin of :func:`reshard_movement_audit`."""
    kpos = hash_uniform_sql("'key:' || CAST(k AS VARCHAR)", salt)

    def ring(shards: int, name: str) -> str:
        vpos = hash_uniform_sql(
            "'ring:' || CAST(i % " + str(shards) + " AS VARCHAR) || ':' "
            "|| CAST(i // " + str(shards) + " AS VARCHAR)",
            salt,
        )
        return f"""
    {name} AS (
      SELECT CAST(i % {shards} AS INT) AS shard, {vpos} AS pos
      FROM (SELECT unnest(generate_series(0,
              {shards * replicas - 1})) AS i)
    )"""

    def assign(ring_name: str) -> str:
        return f"""(
      SELECT shard FROM {ring_name}
      WHERE pos >= k.pos
      ORDER BY pos, shard LIMIT 1
    )"""

    def wrap(ring_name: str) -> str:
        return f"""(
      SELECT shard FROM {ring_name} ORDER BY pos, shard LIMIT 1
    )"""

    return f"""
    WITH {ring(shards_before, "ra")}, {ring(shards_after, "rb")},
    keys AS (
      SELECT DISTINCT {key_col} AS k FROM {rows}
    ),
    kp AS (SELECT k, {kpos} AS pos FROM keys),
    assigned AS (
      SELECT k.pos,
             COALESCE({assign("ra")}, {wrap("ra")}) AS sa,
             COALESCE({assign("rb")}, {wrap("rb")}) AS sb
      FROM kp k
    ),
    cons AS (
      SELECT 'consistent' AS method,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved
      FROM assigned
    ),
    rng AS (
      SELECT 'range' AS method,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN CAST(floor(pos * {shards_before}) AS INT)
                            <> CAST(floor(pos * {shards_after}) AS INT)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      FROM kp
    ),
    u AS (SELECT * FROM cons UNION ALL SELECT * FROM rng)
    SELECT method, n_keys, n_moved,
           ROUND(CAST(n_moved AS DOUBLE) / n_keys, 6) AS moved_rate
    FROM u
    """
