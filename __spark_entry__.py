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
    q185–q227 + q62–q68 (r05 window: 43 round-5 additions + the
    first 7 of the never-recorded band). Round 6 leads with the
    round-6 additions (q228+), then the still-never-recorded
    q69–q95; the already-driver-green bands trail. The committed
    CORRECTNESS_LOCAL_r06 artifact covers every query regardless of
    the window."""
    import re

    def num(name: str) -> int:
        return int(re.match(r"q(\d+)", name).group(1))

    items = sorted(workload.QUERIES.items(), key=lambda kv: (num(kv[0]), kv[0]))
    new_r6 = [(k, v) for k, v in items if num(k) >= 228]
    never = [(k, v) for k, v in items if 69 <= num(k) <= 95]
    r5band = [(k, v) for k, v in items if 185 <= num(k) <= 227]
    r4band = [(k, v) for k, v in items if 146 <= num(k) <= 184]
    r3band = [(k, v) for k, v in items if 96 <= num(k) <= 145]
    front = [(k, v) for k, v in items if num(k) <= 68]
    return dict(new_r6 + never + r5band + r4band + r3band + front)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the
    hash-based algorithmic operators → rows-only check)."""
    return workload.get_oracles()
