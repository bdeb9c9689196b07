"""The reference's four Jinja macros as Column-expression builders.

These are compile-time expression templates in the reference (no runtime
UDFs); here they are Python functions returning Column trees — same
compile-time nature, full codegen/pushdown preserved (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

# Letter grade → 4.0-scale points; 13-branch CASE ladder
# (ref: DEDP/macros/grade_point_calculator.sql:1-18).
_GRADE_POINTS: list[tuple[str, float]] = [
    ("A+", 4.00), ("A", 4.00), ("A-", 3.70),
    ("B+", 3.30), ("B", 3.00), ("B-", 2.70),
    ("C+", 2.30), ("C", 2.00), ("C-", 1.70),
    ("D+", 1.30), ("D", 1.00), ("D-", 0.70),
    ("F", 0.00), ("WF", 0.00),
]


def grade_point_calculator(grade: Column | str) -> Column:
    """Letter grade → grade points (W/I/unknown/null → NULL; the
    withdrawn-failing grade WF counts as 0.0 like F), mirroring
    DEDP/macros/grade_point_calculator.sql:16 (`in ('F','WF')`)."""
    g = F.col(grade) if isinstance(grade, str) else grade
    expr: Column | None = None
    for letter, points in _GRADE_POINTS:
        cond = g == letter
        expr = F.when(cond, points) if expr is None else expr.when(cond, points)
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("double"))


def calculate_gpa(
    grade_points: Column | str,
    credits: Column | str,
    partition_by: list[Column | str] | None = None,
) -> Column:
    """Credit-weighted GPA: ``round(sum(gp*cr) / nullif(sum(cr),0), 2)``.

    Plain aggregate when ``partition_by`` is None; windowed otherwise
    (ref: DEDP/macros/calculate_gpa.sql:1-15).
    """
    gp = F.col(grade_points) if isinstance(grade_points, str) else grade_points
    cr = F.col(credits) if isinstance(credits, str) else credits
    num, den = F.sum(gp * cr), F.sum(cr)
    if partition_by is not None:
        w = Window.partitionBy(*partition_by)
        num, den = num.over(w), den.over(w)
    return F.round(num / F.when(den != 0, den), 2)


def academic_year_from_date(d: Column | str) -> Column:
    """Aug-boundary academic-year label, e.g. ``"2024-2025"``
    (ref: DEDP/macros/academic_year_from_date.sql:1-8)."""
    c = F.col(d) if isinstance(d, str) else d
    y = F.year(c)
    return F.when(
        F.month(c) >= 8, F.concat(y.cast("string"), F.lit("-"), (y + 1).cast("string"))
    ).otherwise(F.concat((y - 1).cast("string"), F.lit("-"), y.cast("string")))


def referential_integrity_violations(df, col: str, ref_df, ref_col: str):
    """FK-violation rows via left-anti join — PG ``NOT IN`` with the
    macro's null guard (ref: DEDP/macros/test_referential_integrity.sql:1-9).

    Returns the violating rows (caller asserts ``.count() == 0``).
    """
    keys = ref_df.select(F.col(ref_col).alias("__ref_key")).where(
        F.col(ref_col).isNotNull()
    ).distinct()
    return (
        df.where(F.col(col).isNotNull())
        .join(F.broadcast(keys), F.col(col) == F.col("__ref_key"), "left_anti")
    )
