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
    driver row, the window leads with REVERIFY_PICKS — the query
    paths the current round's code changes touch — and fills the
    remaining slots with the least-recently driver-recorded names,
    derived from the **git-tracked** CORRECTNESS_r*.json artifacts
    (newest artifact round containing a name = its last-verified
    round — NOT a hand-list). Changed code gets fresh driver
    evidence the same round; untouched evidence still ages out on a
    rolling horizon instead of freezing at first recording."""
    order = window_order(
        sorted(workload.QUERIES), recorded_rounds(), REVERIFY_PICKS
    )
    return {k: workload.QUERIES[k] for k in order}


# Per-round re-verification picks: the query paths THIS round's code
# changes touch (plus bench watch-list names). In catch-up mode they
# fill the slots after unrecorded names; in steady state (round 11+)
# they take the head of the window BEFORE the least-recently-recorded
# rotation fills the rest — changed code always gets fresh driver
# evidence the same round it changes. Round 11, first half: q146
# (k-step BFS), q127 (positional-filter guard), q357 (silhouette NULL
# mirror), q344 (replica anchor), q140 (components comment), the r17
# adjudication watch-list q353/q375/q384, and the perf-band anchors
# q101/q112. Second half (the optimization session's touched paths):
# q318/q367 (columnar grid + cell rollup), q253/q257 (window degree +
# in-partition pairs), q295 (member semi-join), q77/q285/q286/q374/
# q375 (exact_quantiles conditional-min probes), q106 (gopher
# checkpoint), q221 (register fan-out), q132/q238 (brute-scorer
# fan-out), q263/q280 (pair-explosion revert — re-prove unchanged).
# Round 12 (optimization round 2): q112/q290 (pagerank gated hints +
# dangling flag), q222 (HITS pre-hashed edge copies), q150 (k-core
# k-step peel batches), q52/q140/q227/q288/q345/q388 (components
# single-pass probe + lazy round checkpoints), q263/q280 (basket
# prefix window + shared exchange), q77/q285/q286/q374/q375
# (exact_quantiles driver-scalar ranks + probed-bucket window),
# q318 (cell aliases re-keyed), q344 (columnar-round negative result,
# reverted — re-prove unchanged).
REVERIFY_PICKS = {
    52, 77, 112, 140, 150, 222, 227, 263, 280, 285, 286, 288, 290,
    318, 344, 345, 374, 375, 388,
}


def recorded_rounds() -> dict[str, int]:
    """Last driver-recorded round per query name, read from the
    **git-tracked** CORRECTNESS_r*.json artifacts next to this file —
    the same source of truth as tests/test_driver_ledger.py.  Round-10
    judge item 1: the policy previously globbed the disk, so an
    untracked artifact silently rotated the window past names the
    ledger test still considered unproven; reading ``git ls-files``
    keeps those names at the head of the window until the artifact is
    actually committed.  Falls back to the disk glob only when git
    itself is unavailable (e.g. an exported tarball)."""
    import glob
    import json
    import os
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=here,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        paths = [os.path.join(here, f) for f in out]
    except (OSError, subprocess.CalledProcessError):
        paths = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))

    last_round: dict[str, int] = {}
    for path in paths:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            names = list(json.load(open(path)))
        except Exception:  # noqa: BLE001 — a corrupt artifact never breaks entry
            continue
        for n in names:
            last_round[n] = max(last_round.get(n, 0), rnd)
    return last_round


def window_order(
    names: list[str],
    last_round: dict[str, int],
    reverify: set[int],
) -> list[str]:
    """Pure window-ordering policy (unit-tested in
    tests/test_driver_ledger.py): while any name lacks a driver row,
    unrecorded names lead followed by the re-verification picks; once
    all are recorded, the re-verification picks (this round's touched
    paths) lead and the 50-slot window is filled with the
    least-recently recorded names (ties broken by query number), so
    changed code gets fresh driver evidence the same round while old
    evidence still ages out on a rolling horizon."""
    import re

    def num(name: str) -> int:
        return int(re.match(r"q(\d+)", name).group(1))

    ordered = sorted(names, key=lambda n: (num(n), n))
    missing = [n for n in ordered if n not in last_round]
    if missing:
        lead = missing + [
            n for n in ordered if n not in missing and num(n) in reverify
        ]
    else:
        picks = [n for n in ordered if num(n) in reverify]
        rest = sorted(
            (n for n in ordered if num(n) not in reverify),
            key=lambda n: (last_round.get(n, 0), num(n), n),
        )
        lead = (picks + rest)[:50]
    lead_set = set(lead)
    return lead + [n for n in ordered if n not in lead_set]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the
    hash-based algorithmic operators → rows-only check)."""
    return workload.get_oracles()
