"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``dbt_incremental_ci_spark.workload`` — one per
operator family from SURVEY.md §2 plus the scale extensions
(dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_incremental_ci_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.QUERIES["q03_top_revenue_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by driver-verification need: the driver's CORRECTNESS
    window records the first 50 entries. Driver-recorded so far:
    q01–q50 (r02), q96–q145 (r03), q146–q184 + q51–q61 (r04),
    q228–q277 (r06), q278–q309 (32) + q69–q86 (18) (r07),
    q87–q95 + q310–q350 (r08). The round-5 window (q185–q227 +
    q62–q68) was never committed to git, so those names plus q48
    and the round-8 additions q351–q381 have no driver row in a
    committed artifact (round-8 judge item 1). Round 9 therefore
    leads with q351–q381 (31) + q48 + q62–q68 (7) + q185–q195 (11)
    = 50; q196–q227 queue for round 10, after which every name has
    committed driver evidence. The committed CORRECTNESS_LOCAL_r*
    artifacts cover every query regardless of the window."""
    import re

    def num(name: str) -> int:
        return int(re.match(r"q(\d+)", name).group(1))

    items = sorted(workload.QUERIES.items(), key=lambda kv: (num(kv[0]), kv[0]))
    lead = [(k, v) for k, v in items if 351 <= num(k) <= 381]
    lead += [(k, v) for k, v in items if num(k) == 48]
    lead += [(k, v) for k, v in items if 62 <= num(k) <= 68]
    lead += [(k, v) for k, v in items if 185 <= num(k) <= 195]
    seen = {k for k, _ in lead}
    rest = [(k, v) for k, v in items if k not in seen]
    return dict(lead + rest)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the
    hash-based algorithmic operators → rows-only check)."""
    return workload.get_oracles()
