#!/usr/bin/env python
"""Adopt untracked driver artifacts — the mandatory first command of
every round (round-10 judge item 8).

The driver writes CORRECTNESS_r{N}.json / BENCH_r{N}.json /
BENCH_FULL_r{N}.json *after* the builder's final commit, so they open
the next round untracked (this bit rounds 5, 9 and 10).  This script
``git add``s any untracked CORRECTNESS_*/BENCH_* artifact and then runs
the ledger tests so the round starts from a provably-consistent state.

Usage:  python tools/adopt_artifacts.py        # add + verify
        python tools/adopt_artifacts.py --check  # verify only, no add
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PATTERNS = ("CORRECTNESS_*.json", "BENCH*.json")


def main() -> int:
    check_only = "--check" in sys.argv[1:]

    tracked = set(
        subprocess.run(
            ["git", "ls-files", *PATTERNS],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    on_disk = sorted({p.name for pat in PATTERNS for p in REPO.glob(pat)})
    untracked = [f for f in on_disk if f not in tracked]

    if untracked:
        print(f"untracked driver artifacts: {untracked}")
        if check_only:
            print("(--check: not adding; run without --check to adopt)")
        else:
            subprocess.run(["git", "add", "--", *untracked], cwd=REPO, check=True)
            print(f"git add'ed {len(untracked)} artifact(s) — commit them now")
    else:
        print(f"all {len(on_disk)} driver artifacts on disk are git-tracked")

    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_driver_ledger.py", "-q"],
        cwd=REPO,
    ).returncode
    return 1 if (rc != 0 or (untracked and check_only)) else 0


if __name__ == "__main__":
    raise SystemExit(main())
