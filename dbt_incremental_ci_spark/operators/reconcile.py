"""Snapshot reconciliation: keyed row-level diff between two versions
of a table, plus a per-column change census.

The CI layer this engine ports (ref SRC/copier.py — production tables
copied into a CI schema) creates exactly this need: after a CI run you
want "what changed between prod and CI output" as a RELATION, not a
diff tool — added/removed/changed keys, which columns changed, and
how many rows each column touched. The same operator audits
incremental-merge correctness (`incremental/merge.py`) and day-over-day
corpus snapshots.

Scale design (the 100 TB story):

- One full-outer shuffle join on the key — the minimum possible for a
  keyed diff; both sides arrive hash-partitioned, no sort.
- Per-column comparison is a pure expression over the joined row
  (null-safe <=>), so the change census is map-side; the summary is a
  single tiny aggregate (one row per column, driver-safe).
- No collect, no Python, no per-column job: ALL columns are compared
  in one pass over one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
) -> DataFrame:
    """Row-level diff keyed by ``key_cols``.

    Output: key columns + ``diff_status`` in
    {'added', 'removed', 'changed', 'unchanged'} +
    ``changed_cols`` (sorted array of value-column names whose values
    differ, null-safe; empty for non-'changed' rows).

    Both sides must share the same schema; duplicate keys on either
    side are rejected loudly (a keyed diff over non-unique keys is
    ill-defined — dedupe or aggregate first).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    value_cols = [c for c in old.columns if c not in keys]

    def tagged(df: DataFrame, side: str) -> DataFrame:
        cols = [F.col(k) for k in keys] + [
            F.col(c).alias(f"__{side}_{c}") for c in value_cols
        ]
        return df.select(*cols, F.lit(1).alias(f"__in_{side}"))

    j = tagged(old, "o").join(tagged(new, "n"), keys, "full_outer")
    in_old = F.col("__in_o").isNotNull()
    in_new = F.col("__in_n").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in value_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("diff_status"),
        F.when(
            in_old & in_new, diffs
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )
    return _reject_dup_keys(out, old, new, keys)


def _reject_dup_keys(
    out: DataFrame, old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Fail at execution time (not silently fan out) on duplicate keys.

    A one-row duplicate census is broadcast-crossed into the result
    and the row filter runs ``assert_true(dup_count == 0)`` — the
    filter REFERENCES the census, so Catalyst cannot prune the check
    (an anti-join guard gets its raising projection pruned away:
    existence joins don't evaluate unused columns). Costs one extra
    grouped aggregate per side; stays fully distributed."""
    checks = []
    for side, df in (("old", old), ("new", new)):
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .limit(1)
            .select(
                F.concat(
                    F.lit(side + " side: "),
                    F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                ).alias("__where")
            )
        )
        checks.append(dup)
    census = (
        checks[0]
        .unionByName(checks[1])
        .agg(
            F.count(F.lit(1)).alias("__dups"),
            F.coalesce(F.first("__where"), F.lit("")).alias("__where"),
        )
    )
    guarded = out.crossJoin(F.broadcast(census)).filter(
        F.assert_true(
            F.col("__dups") == 0,
            F.concat(F.lit("snapshot_diff: duplicate key in "), F.col("__where")),
        ).isNull()
    )
    return guarded.drop("__dups", "__where")


def diff_summary(diff: DataFrame) -> DataFrame:
    """(diff_status, n_rows) + one ``col:<name>`` row per value column
    that changed anywhere, counting rows where it changed."""
    by_status = diff.groupBy("diff_status").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    per_col = (
        diff.select(F.explode("changed_cols").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.concat(F.lit("col:"), F.col("c")).alias("diff_status"), "n_rows")
    )
    return by_status.unionByName(per_col)
