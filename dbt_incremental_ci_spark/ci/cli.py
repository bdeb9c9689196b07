"""CLI for the slim-CI engine (ref SRC/cli.py:22-243).

Usage:
    python -m dbt_incremental_ci_spark.ci.cli \
        --models-module my_project.models \
        --state /path/to/prod_state.json \
        --base-schema analytics --ci-schema ci_analytics \
        [--threads 4] [--dry-run] [--save-state]

Production state comes from EITHER a local ``--state`` path OR the
dbt-Cloud-shaped artifacts API (``--cloud-token/--cloud-account-id/
--cloud-job-id[/--cloud-run-id]``, credentials defaulting to the
``DBT_CLOUD_API_TOKEN`` / ``DBT_CLOUD_ACCOUNT_ID`` env vars) — the
same dual surface and precedence as the reference (SRC/cli.py:22-160:
local wins with a warning when both are given).

Exit codes: 0 on success / nothing to do, 1 if any copy failed
(ref SRC/cli.py:233-234).
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import tempfile

from dbt_incremental_ci_spark.ci.artifacts import DEFAULT_BASE_URL, CloudArtifactClient
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
    ap.add_argument(
        "--state", help="prod-state JSON path (use this OR the --cloud-* options)"
    )
    ap.add_argument(
        "--cloud-token",
        default=os.environ.get("DBT_CLOUD_API_TOKEN"),
        help="artifacts API token (or set DBT_CLOUD_API_TOKEN)",
    )
    ap.add_argument(
        "--cloud-account-id",
        default=os.environ.get("DBT_CLOUD_ACCOUNT_ID"),
        help="artifacts API account id (or set DBT_CLOUD_ACCOUNT_ID)",
    )
    ap.add_argument("--cloud-job-id", help="job whose latest successful run to use")
    ap.add_argument(
        "--cloud-run-id",
        help="specific run id (defaults to the job's latest successful run)",
    )
    ap.add_argument(
        "--cloud-base-url",
        default=DEFAULT_BASE_URL,
        help="artifacts API root (override for self-hosted stores/tests)",
    )
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

    has_local = args.state is not None
    has_cloud = all([args.cloud_token, args.cloud_account_id, args.cloud_job_id])
    if not has_local and not has_cloud:
        print(
            "Error: must provide either --state OR "
            "(--cloud-token, --cloud-account-id, --cloud-job-id)",
            file=sys.stderr,
        )
        return 1
    if has_local and has_cloud:
        print(
            "Warning: both --state and cloud options provided; using --state.",
            file=sys.stderr,
        )

    importlib.import_module(args.models_module)
    registry = DEFAULT_REGISTRY

    if has_local:
        store = StateStore(args.state)
    else:
        client = CloudArtifactClient(
            args.cloud_token, args.cloud_account_id, base_url=args.cloud_base_url
        )
        doc = client.get_state_from_job(args.cloud_job_id, args.cloud_run_id)
        # SlimCI consumes a StateStore; park the fetched doc in a temp file
        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".state.json", delete=False, encoding="utf-8"
        )
        with tmp:
            json.dump(doc, tmp)
        store = StateStore(tmp.name)

    if args.save_state:
        if not has_local:
            print("Error: --save-state requires --state", file=sys.stderr)
            return 1
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
            print("    -- spark dialect")
            print("    " + c.sql.replace("\n", "\n    "))
            if c.sql_duckdb:
                print("    -- duckdb dialect")
                print("    " + c.sql_duckdb.replace("\n", "\n    "))
    return 0 if result.ok else 1


if __name__ == "__main__":
    sys.exit(main())
