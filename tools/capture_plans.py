"""Capture .explain("formatted") for named queries into a directory.

Round deliverable support: the optimization rounds commit
``plans/r<N>/<query>_before.txt`` / ``..._after.txt`` so the judge can
check plan claims (Exchange count, join strategy, PushedFilters,
Python stages) without running Spark.  "before" files are captured
from a git worktree at the round's base commit, "after" files at HEAD.

Usage:
    python tools/capture_plans.py OUTDIR SUFFIX query [query ...]

writes OUTDIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_incremental_ci_spark import workload
from dbt_incremental_ci_spark.session import get_spark


def formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("formatted"))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        df = workload.QUERIES[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(path)


if __name__ == "__main__":
    main()
