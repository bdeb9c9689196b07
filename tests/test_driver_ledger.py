"""Driver-evidence ledger: every query name must either have a row in a
git-committed CORRECTNESS_r*.json or sit in the current driver window
(first 50 of ``__spark_entry__.queries()``) / the documented next-round
queue.  Round-8 judge item 1/8: the round-5 artifact was never committed,
silently erasing 51 names' driver evidence — this test makes that class
of hole impossible to miss again."""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Names queued for a future driver window because the current 50-slot
# window can't fit them.  Empty since round 10: every missing name fits
# the current window, which closes the ledger once it lands.
NEXT_ROUND_QUEUE: set[int] = set()


def _qnum(name: str) -> int:
    return int(re.match(r"q(\d+)", name).group(1))


def test_every_query_has_committed_driver_row_or_is_windowed():
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    tracked = set(
        subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    assert tracked, "no committed CORRECTNESS_r*.json artifacts found"

    recorded: set[str] = set()
    for f in tracked:
        recorded |= set(json.load(open(REPO / f)))

    names = list(entry.queries())
    window = set(names[:50])
    missing = {n for n in names if n not in recorded}

    uncovered = {
        n for n in missing if n not in window and _qnum(n) not in NEXT_ROUND_QUEUE
    }
    assert not uncovered, (
        f"{len(uncovered)} query names have no committed driver row and are "
        f"neither in the current 50-name driver window nor the documented "
        f"next-round queue: {sorted(uncovered)[:10]} ... Rotate "
        f"__spark_entry__.queries() or update NEXT_ROUND_QUEUE."
    )


def test_window_leads_with_unrecorded_names():
    """The 50-slot window is scarce: it must not waste slots on names that
    already have committed driver rows while unrecorded names wait."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    recorded: set[str] = set()
    for f in tracked:
        recorded |= set(json.load(open(REPO / f)))

    names = list(entry.queries())
    window = set(names[:50])
    missing_total = {n for n in names if n not in recorded}
    # Every name still missing a committed driver row must occupy a window
    # slot (re-verification picks may fill whatever slots remain).  Once
    # nothing is missing, steady-state re-verification rotation is free.
    displaced = sorted(missing_total - window - {n for n in missing_total if _qnum(n) in NEXT_ROUND_QUEUE})
    assert not displaced, (
        f"{len(displaced)} unrecorded names are displaced out of the "
        f"50-slot driver window by already-recorded names: {displaced[:5]}"
    )


def test_window_order_policy_branches():
    """Unit test of the pure window policy (__spark_entry__.window_order)
    — the steady-state branch only activates once every name has a
    committed driver row, so it must be proven here BEFORE that round
    arrives."""
    sys.path.insert(0, str(REPO))
    from __spark_entry__ import window_order

    names = [f"q{n:03d}_x" for n in range(1, 101)]

    # catch-up: unrecorded names lead, then re-verify picks, no dups
    recorded = {n: 2 for n in names if not n.startswith("q09")}
    order = window_order(names, recorded, reverify={1, 2})
    missing = [n for n in names if n.startswith("q09")]
    assert order[: len(missing)] == missing
    assert order[len(missing) : len(missing) + 2] == ["q001_x", "q002_x"]
    assert sorted(order) == sorted(names) and len(set(order)) == len(names)

    # steady state: the round's re-verify picks lead (touched code
    # gets fresh driver evidence the same round), then the
    # least-recently recorded names fill the window, ties by number
    recorded = {n: 2 for n in names}
    for n in names[:30]:
        recorded[n] = 9  # first 30 freshly re-verified
    order = window_order(names, recorded, reverify={1, 2})
    assert order[:2] == ["q001_x", "q002_x"]  # picks first, even if fresh
    assert order[2:50] == names[30:78]  # round-2 names, oldest first
    assert sorted(order) == sorted(names)


def test_latest_artifacts_on_disk_are_git_tracked():
    """Round-9 judge item 1: the round-5 and round-9 driver artifacts both
    sat untracked in the working tree — one crash away from erasing driver
    evidence.  Any CORRECTNESS_r*.json / BENCH*.json present on disk must
    be git-tracked."""
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "CORRECTNESS_*.json", "BENCH*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    on_disk = {
        p.name
        for pat in ("CORRECTNESS_*.json", "BENCH*.json")
        for p in REPO.glob(pat)
    }
    untracked = sorted(on_disk - tracked)
    assert not untracked, (
        f"driver/bench artifacts on disk but NOT git-tracked (one crash "
        f"away from losing evidence): {untracked} — `git add` them now"
    )


def test_recorded_rounds_reads_git_not_disk(tmp_path, monkeypatch):
    """Round-10 judge item 1: recorded_rounds() must key the window
    policy off git-tracked artifacts, not whatever sits on disk — an
    untracked artifact must NOT rotate the window past names the ledger
    test considers unproven.  Pin both halves: (a) on the real repo,
    git-tracked and disk views agree (no untracked artifact skew right
    now), and (b) an artifact dropped on disk without `git add` does not
    change the result."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    before = entry.recorded_rounds()
    assert before, "no committed driver rows found"

    # (a) agreement: every git-tracked artifact is also on disk, and the
    # policy's view equals a direct parse of the tracked files.
    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    expect: dict[str, int] = {}
    for f in tracked:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", f).group(1))
        for n in json.load(open(REPO / f)):
            expect[n] = max(expect.get(n, 0), rnd)
    assert before == expect

    # (b) an untracked artifact on disk is invisible to the policy.
    fake = REPO / "CORRECTNESS_r98.json"
    assert not fake.exists(), "stale test artifact left behind"
    try:
        fake.write_text(json.dumps({n: {"status": "ok"} for n in list(before)[:3]}))
        assert entry.recorded_rounds() == before, (
            "recorded_rounds() picked up an UNTRACKED artifact — window "
            "policy and ledger test have diverging sources of truth again"
        )
    finally:
        fake.unlink()


def test_parity_artifact_block_is_current():
    """Round-10 judge item 7: the hand-edited PARITY.md artifact
    pointers drifted two rounds running; the block is now generated
    from disk — this test fails whenever a new artifact lands without
    rerunning tools/gen_parity_header.py."""
    rc = subprocess.run(
        [sys.executable, "tools/gen_parity_header.py", "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
