"""Production-state fingerprinting and modified-node detection.

The reference shells out to ``dbt ls --select state:modified+ --defer
--state <dir>`` and parses stdout (SRC/dbt_helper.py:28-84). This
engine is manifest-free: production state is a JSON snapshot of each
model's content fingerprint (builder source + config, see
``Model.fingerprint``); the modified set is a dict diff, and the ``+``
closure expands through the registry's child_map — no subprocess, no
stdout scraping.
"""

from __future__ import annotations

import json
from pathlib import Path

from dbt_incremental_ci_spark.plans.dag import descendants
from dbt_incremental_ci_spark.plans.registry import ModelRegistry


class StateStore:
    """Reads/writes the production fingerprint snapshot (the analogue of
    the reference's ``--state`` manifest directory)."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)

    def save(self, registry: ModelRegistry) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "fingerprints": registry.fingerprints(),
            "configs": {
                m.name: {
                    "materialized": m.materialized,
                    "resource_type": m.resource_type,
                    "schema": m.schema,
                }
                for m in registry.models()
            },
        }
        self.path.write_text(json.dumps(payload, indent=2, sort_keys=True))

    def load(self) -> dict:
        if not self.path.exists():
            return {"fingerprints": {}, "configs": {}}
        return json.loads(self.path.read_text())


def diff_state(registry: ModelRegistry, prod_state: dict) -> set[str]:
    """Names whose fingerprint changed or that are new vs production
    (``state:modified`` semantics)."""
    prod_fp = prod_state.get("fingerprints", {})
    return {
        name
        for name, fp in registry.fingerprints().items()
        if prod_fp.get(name) != fp
    }


def modified_plus(registry: ModelRegistry, prod_state: dict) -> set[str]:
    """``state:modified+``: the modified set plus all transitive
    descendants (ref SRC/dbt_helper.py:35-42 uses the ``+`` selector)."""
    modified = diff_state(registry, prod_state)
    return modified | descendants(registry.child_map(), modified)
