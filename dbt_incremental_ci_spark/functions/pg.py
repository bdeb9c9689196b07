"""Postgres-dialect compatibility shims as Column expressions.

The reference workload compiles to Postgres SQL (DEDP/profiles.yml:10);
these shims reproduce the PG behaviors that differ from Spark defaults
(SURVEY §2.9, §7 "dialect traps"). All are pure Column builders — no
UDFs — so Catalyst can fold/push them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ilike(col: Column | str, pattern: str) -> Column:
    """Case-insensitive LIKE (PG ``ILIKE``; 18 sites e.g.
    DEDP/models/staging/stg_assignments.sql:14-19). Uses Spark's
    native ``ilike`` (3.3+) — unlike the ``lower().like()`` shim it
    also case-folds non-literal pattern characters engine-side."""
    return _c(col).ilike(pattern)


def pg_dow(col: Column | str) -> Column:
    """PG ``extract(dow from d)``: 0=Sunday..6=Saturday.

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday → subtract 1.
    (ref site: DEDP/models/marts/academic/assignment_workload_analysis.sql:22)
    """
    return F.dayofweek(_c(col)) - F.lit(1)


def age_years(as_of: Column | str, born: Column | str) -> Column:
    """PG ``extract(year from age(as_of, born))`` — whole years between
    two dates, calendar-aware (ref: stg_students.sql:18-19).

    ``months_between`` with roundOff disabled gives exact month deltas;
    floor(months/12) matches PG's year component of ``age()``.
    """
    return F.floor(F.months_between(_c(as_of), _c(born), False) / 12).cast("int")


def years_between(end: Column | str, start: Column | str) -> Column:
    """Alias for :func:`age_years` with (end, start) argument order."""
    return age_years(end, start)


def int_div(num: Column | str, den: Column | str) -> Column:
    """PG integer division truncates toward zero; Spark ``/`` returns
    double (trap noted at SURVEY §2.9 casts row). Double-divide then
    cast truncates toward zero, matching PG for the workload's ranges."""
    return (_c(num).cast("double") / _c(den).cast("double")).cast("long")


def safe_div(num: Column | str, den: Column | str) -> Column:
    """``num / nullif(den, 0)`` — the reference's pervasive
    divide-by-zero guard (127 ``nullif`` sites, SURVEY §2.9)."""
    den_c = _c(den)
    return _c(num) / F.when(den_c != 0, den_c)


def pg_corr(x: Column | str, y: Column | str) -> Column:
    """Pearson correlation with PG NULL semantics under ANSI mode.

    Spark 4 (ANSI on) raises DIVIDE_BY_ZERO inside ``corr`` when a
    group has zero variance or a single row; PG returns NULL. Same
    statistic via ``covar_samp / (stddev·stddev)`` with ``try_divide``.

    PG/ANSI corr performs *pairwise* deletion: a row where EITHER input
    is null is excluded from all three statistics — so the stddevs must
    be computed over the both-non-null rows, not independently
    (verified against DuckDB running the reference SQL).
    """
    xc, yc = _c(x), _c(y)
    both = xc.isNotNull() & yc.isNotNull()
    xn, yn = F.when(both, xc), F.when(both, yc)
    return F.try_divide(
        F.covar_samp(xn, yn), F.stddev_samp(xn) * F.stddev_samp(yn)
    )


def pg_round(col: Column | str, scale: int = 0) -> Column:
    """PG ``round(numeric, n)`` — HALF_UP. Spark ``F.round`` is also
    HALF_UP, so this is a direct mapping; kept as a named shim so every
    call site documents the PG-rounding dependency."""
    return F.round(_c(col), scale)
