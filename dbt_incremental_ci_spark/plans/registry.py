"""Model registry — the engine-level analogue of dbt's manifest.

A *model* is a named node: dependencies + a builder producing a
DataFrame (or a SQL string), plus materialization config. This mirrors
the manifest node shape the reference operates on (`unique_id`,
`resource_type`, `config.materialized`, `schema`, `alias`,
`parent_map`/`child_map` — see /root/reference/prod_state/manifest.json
and SRC/dbt_helper.py:86-162), but the "compiled SQL" is a Catalyst
logical plan instead of warehouse SQL text.
"""

from __future__ import annotations

import hashlib
import inspect
import json
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# builder signature: (spark, engine_context) -> DataFrame | SQL string
Builder = Callable[..., Any]


@dataclass
class Model:
    name: str
    builder: Builder
    deps: list[str] = field(default_factory=list)
    materialized: str = "view"  # view | table | incremental | ephemeral
    schema: str | None = None  # custom schema suffix (ref SRC/copier.py:38-64)
    unique_key: str | None = None  # incremental upsert key
    watermark_col: str | None = None  # incremental watermark column
    watermark_strict: bool = True  # > (strict) vs >= (boundary re-read)
    on_schema_change: str = "ignore"  # ignore | append_new_columns
    partition_by: list[str] = field(default_factory=list)  # write partitioning
    tags: list[str] = field(default_factory=list)
    resource_type: str = "model"  # model | seed | test | snapshot

    def fingerprint(self) -> str:
        """Content hash of the model's logic + config — the engine's
        substitute for dbt's ``state:modified`` detection
        (ref SRC/dbt_helper.py:28-84 shells out to ``dbt ls``; we hash
        the builder source instead, no subprocess needed)."""
        try:
            src = inspect.getsource(self.builder)
        except (OSError, TypeError):
            src = repr(self.builder)
        closure = getattr(self.builder, "__closure__", None)
        if closure:
            # Captured variables are model logic too (the dbt-vars
            # analogue) — a builder parameterized by a closure value
            # must re-fingerprint when that value changes.
            src += "\nclosure:" + repr([c.cell_contents for c in closure])
        cfg = json.dumps(
            {
                "deps": sorted(self.deps),
                "materialized": self.materialized,
                "schema": self.schema,
                "unique_key": self.unique_key,
                "watermark_col": self.watermark_col,
                "on_schema_change": self.on_schema_change,
                "partition_by": self.partition_by,
            },
            sort_keys=True,
        )
        return hashlib.sha256((src + "\n" + cfg).encode()).hexdigest()


class ModelRegistry:
    """Name → Model mapping plus parent/child maps (dbt manifest analogue)."""

    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def register(self, m: Model) -> Model:
        if m.name in self._models:
            raise ValueError(f"duplicate model name: {m.name}")
        self._models[m.name] = m
        return m

    def get(self, name: str) -> Model:
        return self._models[name]

    def __contains__(self, name: str) -> bool:
        return name in self._models

    def names(self) -> list[str]:
        return list(self._models)

    def models(self) -> list[Model]:
        return list(self._models.values())

    def parent_map(self) -> dict[str, list[str]]:
        return {m.name: list(m.deps) for m in self._models.values()}

    def child_map(self) -> dict[str, list[str]]:
        children: dict[str, list[str]] = {n: [] for n in self._models}
        for m in self._models.values():
            for d in m.deps:
                children.setdefault(d, []).append(m.name)
        return children

    def fingerprints(self) -> dict[str, str]:
        return {m.name: m.fingerprint() for m in self._models.values()}

    def model(
        self,
        name: str,
        deps: list[str] | None = None,
        materialized: str = "view",
        **cfg: Any,
    ) -> Callable[[Builder], Builder]:
        """Decorator: ``@registry.model("stg_x", deps=["raw_x"])``."""

        def wrap(fn: Builder) -> Builder:
            self.register(
                Model(name=name, builder=fn, deps=deps or [], materialized=materialized, **cfg)
            )
            return fn

        return wrap


# Default module-level registry + decorator, for the common single-project case.
DEFAULT_REGISTRY = ModelRegistry()
model = DEFAULT_REGISTRY.model
