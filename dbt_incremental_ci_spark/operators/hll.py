"""HyperLogLog cardinality sketch — Flajolet et al. 2007, built
engine-reproducibly (the ``approx_count_distinct`` built-in is
HLL++-based but its register hashing is JVM-private, so its estimate
cannot be value-oracled cross-engine; this one can).

Shape: one map-side expression derives (bucket, rank) per row from two
independent md5-salted 32-bit hashes (the ``sampling.hash_uniform``
integer core), a hash aggregate reduces the corpus to at most ``m``
register rows (max rank per bucket), and one O(m) aggregate applies
the HLL estimator with the standard small-range (linear-counting)
correction. Registers are mergeable by construction — max() over
bucket — so sketches of corpus shards union cheaply: that is the 100 TB
point (a distinct-count over 10^12 rows reduces map-side to 128
numbers per partition before any shuffle).

Exactness across engines: rank = 32 - floor(log2(u32)) touches floor
only where log2 is IEEE-exact (powers of two), and the estimator's
register sum adds <= m exact powers of two spanning ~40 mantissa bits
— under double's 53, so the sum is exact in any order and the final
ln/division reproduces bit-for-bit.

No counterpart in the reference repo; part of the sketch surface
(bloom.py, countmin.py) this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _u32(key: Column, salt: str) -> Column:
    """First 32 hash bits of md5(key ':' salt) as a bigint in
    [0, 2^32) — the integer core of ``sampling.hash_uniform``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


def _u32_sql(key_expr: str, salt: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'),"
        f" 1, 8))::BIGINT"
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    m: int = 128,
    salt: str = "hll",
) -> DataFrame:
    """The sketch STATE: ``(__b, __m)`` — max rank per register bucket,
    <= m rows. Register frames from disjoint (or overlapping) shards
    merge by ``union → groupBy(__b).max(__m)`` into exactly the sketch
    of the union — the mergeability that makes HLL a streaming/
    incremental state (store m numbers per source, never rescan)."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    key = F.col(key_col)
    bucket = _u32(key, salt + ":b") % m
    ur = _u32(key, salt + ":r")
    rank = F.when(ur == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(ur)).cast("int")
    )
    return (
        df.select(bucket.alias("__b"), rank.alias("__r"))
        .groupBy("__b")
        .agg(F.max("__r").alias("__m"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge sketches (same m/salt): max rank per bucket across all
    frames. Cost: O(m × len(frames)) rows."""
    u = register_frames[0]
    for r in register_frames[1:]:
        u = u.unionByName(r)
    return u.groupBy("__b").agg(F.max("__m").alias("__m"))


def hll_estimate(regs: DataFrame, m: int) -> DataFrame:
    """One-row ``(m, n_active, estimate)`` from a register frame —
    the HLL estimator with the linear-counting small-range branch."""
    alpha = _alpha(m)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.pow(F.lit(2.0), -F.col("__m"))).alias("__inv"),
    )
    raw = (F.lit(alpha * m * m)) / (
        F.col("__inv") + (F.lit(m) - F.col("n_active"))
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_active") < m),
        F.lit(float(m))
        * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_active"))),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(est, 3).alias("estimate"),
    )


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    m: int = 128,
    salt: str = "hll",
) -> DataFrame:
    """One-row distinct-count estimate of ``key_col``:
    ``(m, n_active, estimate, exact_distinct, rel_error)``.

    ``m`` must be a power of two (register count). ``exact_distinct``
    (a linear map-side-partial distinct aggregate) is included so the
    sketch grades itself; callers at scale drop it and keep the
    sketch-only plan.
    """
    key = F.col(key_col)
    regs = hll_registers(df, key_col, m, salt)
    alpha = _alpha(m)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.pow(F.lit(2.0), -F.col("__m"))).alias("__inv"),
    )
    raw = (F.lit(alpha * m * m)) / (
        F.col("__inv") + (F.lit(m) - F.col("n_active"))
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_active") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_active"))),
    ).otherwise(raw)
    exact = df.agg(F.count_distinct(key).alias("exact_distinct"))
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).cast("int").alias("m"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.round(est, 3).alias("estimate"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_error"),
        )
    )


def hll_cardinality_sql(
    from_clause: str,
    key_expr: str,
    m: int = 128,
    salt: str = "hll",
) -> str:
    """DuckDB twin of :func:`hll_cardinality` (for oracle builders).
    ``from_clause`` is a full ``FROM ...`` fragment producing the rows;
    ``key_expr`` the key expression over it."""
    ub = _u32_sql("k", salt + ":b")
    ur = _u32_sql("k", salt + ":r")
    alpha = _alpha(m)
    return f"""
    WITH rows_in AS (SELECT {key_expr} AS k {from_clause}),
    hashed AS (
      SELECT ({ub}) % {m} AS b,
             CASE WHEN ({ur}) = 0 THEN 33
                  ELSE 32 - CAST(floor(log2({ur})) AS INT)
             END AS r
      FROM rows_in
    ),
    regs AS (SELECT b, max(r) AS mr FROM hashed GROUP BY b),
    agg AS (
      SELECT count(*) AS n_active, sum(pow(2.0, -mr)) AS inv FROM regs
    ),
    ex AS (SELECT count(DISTINCT k) AS exact_distinct FROM rows_in),
    est AS (
      SELECT n_active,
             CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (inv + ({m} - n_active))
                       <= 2.5 * {m} AND n_active < {m}
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_active))
                  ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (inv + ({m} - n_active))
             END AS e
      FROM agg
    )
    SELECT CAST({m} AS INT) AS m,
           CAST(n_active AS BIGINT) AS n_active,
           ROUND(e, 3) AS estimate,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           ROUND((e - exact_distinct) / exact_distinct, 6) AS rel_error
    FROM est CROSS JOIN ex
    """
