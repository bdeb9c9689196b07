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


def hll_registers_by(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    m: int = 128,
    salt: str = "hll",
) -> DataFrame:
    """Per-GROUP register frames: ``(*group_cols, __b, __m)`` — the
    "sketch column" pattern. Each group carries <= m register rows, and
    a coarser grouping (day → week → total) re-aggregates with
    ``groupBy(coarser).max(__m)`` WITHOUT rescanning the rows — the
    reaggregatable-measure idiom that makes distinct-count cubes
    feasible at 100 TB (a true count_distinct is not reaggregatable;
    register maxima are)."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    key = F.col(key_col)
    bucket = _u32(key, salt + ":b") % m
    ur = _u32(key, salt + ":r")
    rank = F.when(ur == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(ur)).cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("__b"), rank.alias("__r"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__r").alias("__m"))
    )


def hll_rollup(regs: DataFrame, coarser_cols: list[str]) -> DataFrame:
    """Re-aggregate per-group registers to a coarser grouping (max per
    bucket) — register-EXACT: identical to building the sketch at the
    coarser grain directly."""
    return regs.groupBy(*coarser_cols, "__b").agg(F.max("__m").alias("__m"))


def hll_estimate_by(
    regs: DataFrame, group_cols: list[str], m: int
) -> DataFrame:
    """Per-group HLL estimate from a :func:`hll_registers_by` frame:
    ``(*group_cols, n_active, estimate)`` — one hash aggregate over
    <= m rows per group."""
    alpha = _alpha(m)
    agg = regs.groupBy(*group_cols).agg(
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
        *group_cols,
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(est, 3).alias("estimate"),
    )


def hll_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    m: int = 128,
    salt: str = "hll",
) -> DataFrame:
    """Sketch-only set-operation estimates for two keyed row sets:
    one row ``(est_a, est_b, est_union, est_intersection,
    jaccard_est)``. Union is register-exact (max per bucket);
    intersection is inclusion-exclusion (est_a + est_b − est_union),
    clamped at 0 — the standard HLL composition (a Theta sketch would
    estimate intersections directly; inclusion-exclusion is the HLL
    answer and is accurate when the overlap isn't tiny relative to the
    union). All inputs reduce map-side to m registers before any
    shuffle, so comparing two 10-TB row sets costs three O(m)
    aggregates."""
    ra = hll_registers(df_a, key_col, m, salt)
    rb = hll_registers(df_b, key_col, m, salt)
    ea = hll_estimate(ra, m).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb, m).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(ra, rb), m).select(
        F.col("estimate").alias("est_union")
    )
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 3),
        F.lit(0.0),
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersection"),
            F.when(
                F.col("est_union") > 0,
                F.round(inter / F.col("est_union"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard_est"),
        )
    )


def _hll_estimate_cte(regs_cte: str, m: int) -> str:
    """DuckDB estimate expression over a ``(b, mr)`` register CTE."""
    alpha = _alpha(m)
    return f"""(
      SELECT CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (sum(pow(2.0, -mr)) + ({m} - count(*)))
                       <= 2.5 * {m} AND count(*) < {m}
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - count(*)))
                  ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (sum(pow(2.0, -mr)) + ({m} - count(*)))
             END
      FROM {regs_cte}
    )"""


def hll_set_ops_sql(
    from_a: str,
    from_b: str,
    key_expr: str,
    m: int = 128,
    salt: str = "hll",
) -> str:
    """DuckDB twin of :func:`hll_set_ops`. ``from_a``/``from_b`` are
    ``FROM ...`` fragments; ``key_expr`` applies to both."""
    ub = _u32_sql("k", salt + ":b")
    ur = _u32_sql("k", salt + ":r")
    hashed = (
        f"SELECT ({ub}) % {m} AS b, "
        f"CASE WHEN ({ur}) = 0 THEN 33 "
        f"ELSE 32 - CAST(floor(log2({ur})) AS INT) END AS r"
    )
    ea = _hll_estimate_cte("regs_a", m)
    eb = _hll_estimate_cte("regs_b", m)
    eu = _hll_estimate_cte("regs_u", m)
    return f"""
    WITH rows_a AS (SELECT {key_expr} AS k {from_a}),
    rows_b AS (SELECT {key_expr} AS k {from_b}),
    ha AS ({hashed} FROM rows_a),
    hb AS ({hashed} FROM rows_b),
    regs_a AS (SELECT b, max(r) AS mr FROM ha GROUP BY b),
    regs_b AS (SELECT b, max(r) AS mr FROM hb GROUP BY b),
    regs_u AS (
      SELECT b, max(mr) AS mr
      FROM (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
      GROUP BY b
    ),
    est AS (
      SELECT ROUND({ea}, 3) AS est_a,
             ROUND({eb}, 3) AS est_b,
             ROUND({eu}, 3) AS est_union
    )
    SELECT est_a, est_b, est_union,
           GREATEST(ROUND(est_a + est_b - est_union, 3), 0.0)
             AS est_intersection,
           CASE WHEN est_union > 0
                THEN ROUND(GREATEST(ROUND(est_a + est_b - est_union, 3),
                                    0.0) / est_union, 6)
                ELSE 0.0 END AS jaccard_est
    FROM est
    """


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


def hll_overlap_matrix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    m: int = 128,
    salt: str = "hll",
) -> DataFrame:
    """Pairwise set-overlap matrix across groups from ONE register
    pass — "how much do these N segments' audiences overlap": the
    corpus is sketched once per group (:func:`hll_registers_by`),
    then every pairwise union/intersection/Jaccard estimate is
    computed from the REGISTER TABLE alone (groups² pairs × ≤ m
    register rows) — the sketch-algebra reuse that makes an N-way
    overlap study O(corpus + N²·m) instead of N² corpus scans.

    Output, one row per unordered group pair (a < b):
    ``(group_a, group_b, est_a, est_b, est_union, est_intersection,
    jaccard_est)`` — estimates at 3 dp, Jaccard at 6 (the
    :func:`hll_set_ops` contract).
    """
    regs = hll_registers_by(df, key_col, [group_col], m, salt)
    g = F.col(group_col)
    groups = regs.select(g.alias("__g")).distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .join(
            groups.select(F.col("__g").alias("group_b")),
            F.col("group_a") < F.col("group_b"),
        )
    )
    est_g = hll_estimate_by(regs, [group_col], m).select(
        g.alias("__eg"), F.col("estimate").alias("__est")
    )
    tag_a = regs.join(
        pairs, g == F.col("group_a")
    ).select("group_a", "group_b", "__b", "__m")
    tag_b = regs.join(
        pairs, g == F.col("group_b")
    ).select("group_a", "group_b", "__b", "__m")
    uregs = (
        tag_a.unionByName(tag_b)
        .groupBy("group_a", "group_b", "__b")
        .agg(F.max("__m").alias("__m"))
    )
    est_u = hll_estimate_by(uregs, ["group_a", "group_b"], m).select(
        "group_a", "group_b", F.col("estimate").alias("est_union")
    )
    out = (
        est_u.join(
            est_g.select(
                F.col("__eg").alias("group_a"), F.col("__est").alias("est_a")
            ),
            "group_a",
        )
        .join(
            est_g.select(
                F.col("__eg").alias("group_b"), F.col("__est").alias("est_b")
            ),
            "group_b",
        )
    )
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 3),
        F.lit(0.0),
    )
    return out.select(
        "group_a",
        "group_b",
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(
            F.col("est_union") > 0, F.round(inter / F.col("est_union"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


def hll_overlap_matrix_sql(
    rows: str,
    key_expr: str,
    group_expr: str,
    m: int = 128,
    salt: str = "hll",
) -> str:
    """DuckDB twin of :func:`hll_overlap_matrix`."""
    ub = _u32_sql("k", salt + ":b")
    ur = _u32_sql("k", salt + ":r")
    alpha = _alpha(m)
    est = (
        f"CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m})"
        f" / (inv + ({m} - n_active)) <= 2.5 * {m} AND n_active < {m}"
        f" THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_active))"
        f" ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m})"
        f" / (inv + ({m} - n_active)) END"
    )
    return f"""
    WITH rows_in AS (
      SELECT {group_expr} AS g, {key_expr} AS k FROM {rows}
    ),
    hashed AS (
      SELECT g, ({ub}) % {m} AS b,
             CASE WHEN ({ur}) = 0 THEN 33
                  ELSE 32 - CAST(floor(log2({ur})) AS INT) END AS r
      FROM rows_in
    ),
    regs AS (SELECT g, b, max(r) AS mr FROM hashed GROUP BY g, b),
    est_g AS (
      SELECT g, ROUND({est}, 3) AS estimate FROM (
        SELECT g, count(*) AS n_active, sum(pow(2.0, -mr)) AS inv
        FROM regs GROUP BY g
      )
    ),
    pairs AS (
      SELECT a.g AS ga, b.g AS gb
      FROM (SELECT DISTINCT g FROM regs) a
      JOIN (SELECT DISTINCT g FROM regs) b ON a.g < b.g
    ),
    uregs AS (
      SELECT p.ga, p.gb, r.b, max(r.mr) AS mr
      FROM pairs p JOIN regs r ON r.g = p.ga OR r.g = p.gb
      GROUP BY p.ga, p.gb, r.b
    ),
    est_u AS (
      SELECT ga, gb, ROUND({est}, 3) AS est_union FROM (
        SELECT ga, gb, count(*) AS n_active,
               sum(pow(2.0, -mr)) AS inv
        FROM uregs GROUP BY ga, gb
      )
    )
    SELECT u.ga AS group_a, u.gb AS group_b,
           ea.estimate AS est_a, eb.estimate AS est_b, u.est_union,
           GREATEST(ROUND(ea.estimate + eb.estimate - u.est_union, 3),
                    0.0) AS est_intersection,
           CASE WHEN u.est_union > 0
                THEN ROUND(GREATEST(ROUND(ea.estimate + eb.estimate
                                          - u.est_union, 3), 0.0)
                           / u.est_union, 6)
                ELSE 0.0 END AS jaccard_est
    FROM est_u u
    JOIN est_g ea ON ea.g = u.ga
    JOIN est_g eb ON eb.g = u.gb
    """
