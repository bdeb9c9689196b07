"""Privacy audits and releases over curated tables: k-anonymity,
l-diversity, and deterministic (seeded) Laplace-noised counts.

Training-data pipelines ship aggregate stats and filtered corpora
downstream; before release you check that quasi-identifier (QI)
combinations don't isolate individuals (k-anonymity, Sweeney 2002),
that sensitive attributes stay mixed within each QI group
(l-diversity, Machanavajjhala et al. 2007), and you noise the counts
you do publish (Laplace mechanism, Dwork et al. 2006).

Scale: all three are a single ``groupBy`` over the QI columns —
map-side partial aggregation means shuffled bytes scale with group
cardinality, not input rows. The DP noise is a pure Column expression
(md5-seeded inverse-CDF Laplace), so releases are reproducible and
bit-identical across engines — note that a *seeded* mechanism is for
reproducible pipelines/testing; a production release would draw the
noise from a CSPRNG at publish time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.sampling import (
    hash_uniform,
    hash_uniform_sql,
)


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per QI-group: size, distinct sensitive values, and whether the
    group meets k-anonymity (size >= k) and l-diversity (>= l distinct
    sensitive values). One hash aggregate; ``count_distinct`` expands
    to a two-phase distinct aggregate (partial per partition), so no
    group ever materializes its member list.
    """
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.count_distinct(F.col(sensitive_col)).alias("l_distinct"),
    ).select(
        *qi_cols,
        "grp_n",
        "l_distinct",
        (F.col("grp_n") >= k).alias("k_ok"),
        (F.col("l_distinct") >= l).alias("l_ok"),
    )


def suppression_summary(audit: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Fraction of rows that would be suppressed to reach k/l —
    the usual headline number of an anonymity audit."""
    return audit.agg(
        F.sum("grp_n").alias("total_rows"),
        F.sum(F.when(~F.col("k_ok") | ~F.col("l_ok"), F.col("grp_n")).otherwise(0)).alias(
            "suppressed_rows"
        ),
        F.count(F.lit(1)).alias("groups"),
        F.sum(F.when(~F.col("k_ok"), 1).otherwise(0)).alias("k_violations"),
        F.sum(F.when(~F.col("l_ok"), 1).otherwise(0)).alias("l_violations"),
    )


def laplace_noise(seed_expr: Column, scale: float) -> Column:
    """Deterministic Laplace(0, scale) variate from a uniform seed via
    the inverse CDF: x = -scale * sign(u-1/2) * ln(1 - 2|u-1/2|).
    ``seed_expr`` must be uniform on [0,1)."""
    c = seed_expr - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(c)
    # u exactly 0.5 -> ln(1) = 0, no sign issue; mag>0 since u<1
    return F.lit(-scale) * F.signum(c) * F.log(mag)


def laplace_noise_sql(u_sql: str, scale: float) -> str:
    """DuckDB twin of :func:`laplace_noise` (same IEEE double ops)."""
    return (
        f"(-({scale}) * sign(({u_sql}) - 0.5) * "
        f"ln(1.0 - 2.0 * abs(({u_sql}) - 0.5)))"
    )


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Laplace-mechanism noised counts per group (sensitivity 1 for a
    count query → scale = 1/epsilon). The noise seed is the md5 of the
    group key + salt, so the release is reproducible. Rounded to 6dp
    so the cross-engine hash is stable."""
    # Seed-key encoding (byte-identical to the DuckDB twin): cast to
    # string, NULL -> \x02 sentinel, joined with \x01 — concat_ws
    # SKIPS nulls (vs SQL || which nullifies the key), so without the
    # coalesce the two engines hash different bytes for NULL group
    # values (round-4 ADVICE fix).
    key = F.concat_ws(
        "\x01",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in group_cols],
    )
    noise = laplace_noise(hash_uniform(key, salt), 1.0 / epsilon)
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("exact_n")).select(
        *group_cols,
        F.round(F.col("exact_n") + noise, 6).alias("noised_n"),
    )


def dp_group_counts_sql(
    table: str, group_cols: list[str], epsilon: float = 1.0, salt: str = "dp"
) -> str:
    """Oracle SQL for :func:`dp_group_counts` over ``table``."""
    key = " || chr(1) || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(2))" for c in group_cols
    )
    u = hash_uniform_sql(f"({key})", salt)
    # hash_uniform_sql wraps key in CAST(.. AS VARCHAR) itself; feed the
    # raw concatenation so both engines hash identical bytes
    noise = laplace_noise_sql(u, 1.0 / epsilon)
    cols = ", ".join(group_cols)
    return (
        f"SELECT {cols}, ROUND(count(*) + {noise}, 6) AS noised_n "
        f"FROM {table} GROUP BY {cols}"
    )
