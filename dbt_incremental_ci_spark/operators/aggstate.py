"""Mergeable partial aggregates — incremental aggregate maintenance.

The 100 TB pattern: never recompute an aggregate over the full history
when a new batch arrives. Keep an *aggregate state table* whose measures
form a commutative monoid (count, sum, min, max — and anything derived
from them: avg, variance via (n, s, ss)), aggregate only the new batch,
then merge state + batch with a second tiny aggregation over the union.
The merge cost is O(|keys|), independent of history size.

This is the same algebra Spark itself uses for map-side partial
aggregation (``HashAggregate(partial)`` → shuffle →
``HashAggregate(final)``); here it is lifted to *table level* so the
"partial" can live in storage between pipeline runs (the incremental
twin of the reference's accumulating marts, ref DEDP
models/marts/*_summary.sql).

Derived measures (avg, stddev) must NOT be stored in the state — they
do not merge. Store the monoid components and derive at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure name -> (state builder over a raw column, merge fn over the state col)
_MONOID = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_agg(df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate one batch into mergeable state.

    ``measures`` maps output column -> (op, input column) with op in
    {count, sum, min, max}. ``count`` ignores the input column.
    """
    aggs = []
    for out, (op, col) in measures.items():
        build, _ = _MONOID[op]
        aggs.append(build(F.col(col) if op != "count" else col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(states: list[DataFrame], keys: list[str], measures: dict[str, tuple[str, str]]) -> DataFrame:
    """Merge any number of state tables produced by :func:`partial_agg`
    (over disjoint or overlapping input splits — the monoid does not
    care) into a single state table. Equivalent to ``partial_agg`` over
    the concatenated raw inputs; asserted by tests/test_operators.py.
    """
    if not states:
        raise ValueError("merge_partials needs at least one state table")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = []
    for out, (op, _) in measures.items():
        _, merge = _MONOID[op]
        aggs.append(merge(F.col(out)).alias(out))
    return unioned.groupBy(*keys).agg(*aggs)
