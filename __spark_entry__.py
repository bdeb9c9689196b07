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
    q228–q277 (r06), q278–q309 + q69–q86 (r07), q87–q95 +
    q310–q350 (r08), q351–q381 + q48 + q62–q68 + q185–q195 (r09).
    Round 10 leads with the final 41 never-driver-recorded names —
    q196–q227 (32) + q382–q390 (9) — which closes the evidence
    ledger: after this window lands, every one of the 391 names has
    a committed driver row. The remaining 9 slots re-verify the
    queries this round touches (q112/q127/q140 perf rebuilds), the
    round-9-touched set (q344/q351/q357/q365/q380), and the q101
    plateau watch-list entry.

    Steady state (round 11+): once no name is missing a committed
    driver row, the window re-verifies the 50 least-recently
    driver-recorded names, derived from the committed
    CORRECTNESS_r*.json artifacts (newest artifact containing a
    name = its last-verified round), so driver evidence ages out on
    a ~8-round horizon instead of freezing at first recording."""
    import re

    def num(name: str) -> int:
        return int(re.match(r"q(\d+)", name).group(1))

    reverify = {101, 112, 127, 140, 344, 351, 357, 365, 380}
    items = sorted(workload.QUERIES.items(), key=lambda kv: (num(kv[0]), kv[0]))
    lead = [(k, v) for k, v in items if 196 <= num(k) <= 227]
    lead += [(k, v) for k, v in items if 382 <= num(k) <= 390]
    lead += [(k, v) for k, v in items if num(k) in reverify]
    seen = {k for k, _ in lead}
    rest = [(k, v) for k, v in items if k not in seen]
    return dict(lead + rest)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the
    hash-based algorithmic operators → rows-only check)."""
    return workload.get_oracles()
