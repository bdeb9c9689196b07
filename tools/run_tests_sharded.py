#!/usr/bin/env python
"""Sharded test runner (round-10 judge item 5: solo pytest crept to
932–988 s against a <1,100 s bar; pytest-xdist is not installed in
this environment, so shard at the PROCESS level instead).

Splits the test files across N worker processes, each running its own
pytest (and therefore its own Spark JVM) with SPARK_GRAFT_CPUS scaled
so the workers share the box instead of each grabbing local[32].
Files are greedy-packed by a measured-weight table (falling back to
file size) so the heavy modules spread across shards.

    python tools/run_tests_sharded.py            # 4 shards
    python tools/run_tests_sharded.py --shards 6

Exit code is non-zero if any shard fails; each shard's tail is
printed with its shard id so failures are attributable.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Measured solo-run weights (seconds, round-11 box) for the modules
# that dominate the wall clock; unlisted files fall back to
# size-proportional estimates. Keeping the list approximate is fine —
# greedy packing only needs relative order.
WEIGHTS = {
    "test_plan_contracts.py": 110,
    "test_edu_oracle.py": 90,
    "test_pipeline_ops.py": 80,
    "test_streaming.py": 70,
    "test_r4b_ops.py": 60,
    "test_r6_ops.py": 55,
    "test_operators.py": 50,
    "test_setsim.py": 45,
    "test_r5_ops.py": 40,
    "test_r8_band2_ops.py": 40,
    "test_quality_ops.py": 40,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--cpus-per-shard", type=int, default=None)
    args = ap.parse_args()

    files = sorted((REPO / "tests").glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    def weight(p: Path) -> float:
        return WEIGHTS.get(p.name, p.stat().st_size / 1000.0)

    shards: list[tuple[float, list[Path]]] = [
        (0.0, []) for _ in range(args.shards)
    ]
    for f in sorted(files, key=weight, reverse=True):
        i = min(range(len(shards)), key=lambda k: shards[k][0])
        w, lst = shards[i]
        lst.append(f)
        shards[i] = (w + weight(f), lst)

    ncpu = os.cpu_count() or 8
    cpus = args.cpus_per_shard or max(2, ncpu // args.shards)
    t0 = time.time()
    procs = []
    for i, (_w, lst) in enumerate(shards):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        procs.append(
            (
                i,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q",
                     *[str(p) for p in lst]],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )
    rc = 0
    for i, p in procs:
        out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-6:])
        status = "OK" if p.returncode == 0 else f"FAIL rc={p.returncode}"
        print(f"--- shard {i}: {status}\n{tail}\n")
        if p.returncode != 0:
            rc = 1
    print(f"total wall: {round(time.time() - t0, 1)}s "
          f"({args.shards} shards x local[{cpus}])")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
