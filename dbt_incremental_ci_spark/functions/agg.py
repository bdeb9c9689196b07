"""Ordered/distinct string aggregation (PG ``string_agg``).

Spark has no ordered aggregate, so the classic trick: collect
``struct(order_key, value)``, ``array_sort`` (struct ordering is
field-by-field), project the value field, ``array_join``.
Stays fully JVM-side (no UDF), one hash-agg + per-group array sort.

Reference sites: SURVEY §2 A10/A11 —
int_course_prerequisite_chains.sql:74, int_curriculum_flow_analysis.sql:52,
academic_early_warning_system.sql:19, int_faculty_student_interactions.sql:75.

Scale note: per-group arrays live in executor memory — fine for the
reference's group sizes (≤ thousands); for pathological groups cap with
``F.slice`` upstream or pre-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def string_agg_ordered(
    value: Column | str,
    sep: str,
    order_by: Column | str | None = None,
) -> Column:
    """``string_agg(value, sep ORDER BY order_by)``; nulls dropped
    (collect_list skips nulls, matching PG string_agg)."""
    v = _c(value)
    o = v if order_by is None else _c(order_by)
    pairs = F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v"))))
    return F.array_join(F.transform(pairs, lambda x: x["v"]), sep)


def string_agg_distinct(value: Column | str, sep: str) -> Column:
    """``string_agg(DISTINCT value, sep ORDER BY value)``
    (ref: int_faculty_student_interactions.sql:75)."""
    return F.array_join(F.array_sort(F.collect_set(_c(value))), sep)
