"""CLI for the slim-CI engine (ref SRC/cli.py:22-243).

Usage:
    python -m dbt_incremental_ci_spark.ci.cli \
        --models-module my_project.models \
        --state /path/to/prod_state.json \
        --base-schema analytics --ci-schema ci_analytics \
        [--threads 4] [--dry-run] [--save-state]

Exit codes: 0 on success / nothing to do, 1 if any copy failed
(ref SRC/cli.py:233-234).
"""

from __future__ import annotations

import argparse
import importlib
import sys

from dbt_incremental_ci_spark.ci.core import SlimCI
from dbt_incremental_ci_spark.ci.state import StateStore
from dbt_incremental_ci_spark.plans.registry import DEFAULT_REGISTRY
from dbt_incremental_ci_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dbt-incremental-ci-spark")
    ap.add_argument(
        "--models-module",
        required=True,
        help="importable module that registers models on the default registry",
    )
    ap.add_argument("--state", required=True, help="prod-state JSON path")
    ap.add_argument("--base-schema", required=True)
    ap.add_argument("--ci-schema", required=True)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--save-state",
        action="store_true",
        help="write the current fingerprints as the new prod state and exit",
    )
    args = ap.parse_args(argv)

    importlib.import_module(args.models_module)
    registry = DEFAULT_REGISTRY
    store = StateStore(args.state)

    if args.save_state:
        store.save(registry)
        print(f"state saved: {args.state} ({len(registry.names())} models)")
        return 0

    spark = get_spark(app_name="slim-ci")
    ci = SlimCI(
        spark,
        registry,
        store,
        base_schema=args.base_schema,
        ci_schema=args.ci_schema,
        threads=args.threads,
        dry_run=args.dry_run,
    )
    result = ci.run()
    print(f"modified(+descendants): {len(result.modified)}")
    print(f"to copy: {len(result.to_copy)}")
    for c in result.copies:
        line = f"  {c.status:8s} {c.table} -> {c.target}"
        if c.error:
            line += f"  ({c.error})"
        print(line)
        if c.status == "dry_run" and c.sql:
            print("    " + c.sql.replace("\n", "\n    "))
    return 0 if result.ok else 1


if __name__ == "__main__":
    sys.exit(main())
