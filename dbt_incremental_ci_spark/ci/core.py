"""Slim-CI orchestration: detect → filter → copy.

Mirrors the reference's three-step ``run()`` (SRC/core.py:165-218):

1. modified-node detection (state fingerprint diff + ``+`` closure);
2. filter to incremental models and snapshots that exist in production
   (SRC/dbt_helper.py:86-162) — those are the only nodes worth
   pre-seeding, because CI rebuilds everything else cheaply;
3. copy their production tables into the CI schema.

Empty-result early exits match the reference (core.py:183-199).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from dbt_incremental_ci_spark.ci.copier import CopyResult, TableCopier
from dbt_incremental_ci_spark.ci.state import StateStore, modified_plus
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


@dataclass
class CIRunResult:
    modified: set[str] = field(default_factory=set)
    to_copy: list[str] = field(default_factory=list)
    copies: list[CopyResult] = field(default_factory=list)
    ok: bool = True


class SlimCI:
    def __init__(
        self,
        spark: SparkSession,
        registry: ModelRegistry,
        state: StateStore,
        base_schema: str,
        ci_schema: str,
        threads: int = 1,
        dry_run: bool = False,
    ) -> None:
        self.spark = spark
        self.registry = registry
        self.state = state
        self.base_schema = base_schema
        self.ci_schema = ci_schema
        self.copier = TableCopier(spark, base_schema, ci_schema, threads, dry_run)

    def _qualified(self, name: str) -> str:
        m = self.registry.get(name)
        schema = (
            self.base_schema if m.schema is None else f"{self.base_schema}_{m.schema}"
        )
        return f"{schema}.{name}"

    def filter_incremental_and_snapshots(self, names: set[str]) -> list[str]:
        """Keep incremental models + snapshots whose prod table exists
        (ref SRC/dbt_helper.py:116-156: suffix match against manifest,
        incremental or snapshot only)."""
        out = []
        for name in sorted(names):
            if name not in self.registry:
                continue
            m = self.registry.get(name)
            if m.materialized == "incremental" or m.resource_type == "snapshot":
                if self.spark.catalog.tableExists(self._qualified(name)):
                    out.append(self._qualified(name))
        return out

    def run(self) -> CIRunResult:
        result = CIRunResult()
        result.modified = modified_plus(self.registry, self.state.load())
        if not result.modified:
            return result  # nothing modified → nothing to do (core.py:183)
        result.to_copy = self.filter_incremental_and_snapshots(result.modified)
        if not result.to_copy:
            return result  # no incremental/snapshots affected (core.py:192)
        result.copies = self.copier.copy_tables(result.to_copy)
        result.ok = all(c.status != "error" for c in result.copies)
        return result
