"""Data-quality audits: referential-integrity (foreign-key) checks.

The dbt ecosystem the reference lives in ships these as schema tests
(``relationships`` / ``not_null`` in DEDP's schema.yml files — the
reference project declares 17 of them and runs them as generated SQL).
Here they are first-class operators that emit an *audit row* per
relationship instead of pass/fail, so a pipeline can gate on thresholds
(e.g. "orphan_pct < 0.1%") rather than hard-failing on one bad row.

Scale design
------------
Each audit is two anti-joins (child⟂parent for orphans,
parent⟂child for childless parents) plus a map-side null/total count —
all expressed declaratively so AQE picks broadcast vs shuffled-hash per
side (the parent side of a star schema is usually the broadcastable
one). Nothing is collected; the audit output is O(#relationships).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_audit(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    relationship: str,
) -> DataFrame:
    """One-row audit of the ``child.fk_col → parent.pk_col`` relationship.

    Columns: ``relationship, child_rows, null_fk, orphans,
    childless_parents``.

    - ``orphans``: child rows with a non-null FK that matches no parent
      PK (referential-integrity violations).
    - ``childless_parents``: parent rows never referenced — not an
      error, but the signal for dimension pruning / retention audits.

    NULL semantics follow the SQL standard (and dbt's ``relationships``
    test): a NULL FK is counted separately, never as an orphan.
    """
    fk = child.select(F.col(fk_col).alias("__fk"))
    pk = parent.select(F.col(pk_col).alias("__pk"))

    base = fk.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.count_if(F.col("__fk").isNull()).alias("null_fk"),
    )
    orphans = (
        fk.where(F.col("__fk").isNotNull())
        .join(pk, fk["__fk"] == pk["__pk"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    childless = (
        pk.join(fk.where(F.col("__fk").isNotNull()),
                pk["__pk"] == fk["__fk"], "left_anti")
        .agg(F.count(F.lit(1)).alias("childless_parents"))
    )
    return (
        base.crossJoin(orphans)
        .crossJoin(childless)
        .select(
            F.lit(relationship).alias("relationship"),
            "child_rows",
            "null_fk",
            "orphans",
            "childless_parents",
        )
    )


def fk_audit_many(
    relationships: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """UNION ALL of :func:`fk_audit` over ``(child, fk, parent, pk,
    name)`` tuples — the whole star schema audited in one plan (Spark
    schedules the independent audit subtrees concurrently)."""
    out = None
    for child, fk_col, parent, pk_col, name in relationships:
        row = fk_audit(child, fk_col, parent, pk_col, name)
        out = row if out is None else out.unionAll(row)
    if out is None:
        raise ValueError("fk_audit_many needs at least one relationship")
    return out
