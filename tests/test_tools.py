"""Tool-script regression tests (no SparkSession needed)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gate_doc(queries, extra=None, errors=None):
    return {
        "queries": dict(queries),
        "queries_extra": dict(extra or {}),
        "errors": dict(errors or {}),
        "value": round(sum(queries.values()), 3),
    }


def test_merge_gate_clears_stale_errors_and_timings(tmp_path):
    """Round-4 ADVICE: a query that succeeded in the remeasure must lose
    its stale base error; one that errored must lose its stale timing —
    never both a timing and an error for the same query."""
    base = {
        "sf0.1": _gate_doc(
            {"q1": 1.0, "q2": 2.0}, {"q3": 3.0}, {"q4": "OldError: boom"}
        ),
        "sf1": _gate_doc(
            {"q1": 9.0, "q2": 4.0}, {"q3": 30.0}, {"q4": "OldError: boom"}
        ),
    }
    # remeasure: q4 now succeeds (was error), q2 now errors (was timed)
    supp = {
        "sf0.1": _gate_doc({"q4": 0.5}, {}, {"q2": "NewError: crash"}),
        "sf1": _gate_doc({"q4": 5.0}, {}, {"q2": "NewError: crash"}),
    }
    bp, sp = tmp_path / "base.json", tmp_path / "supp.json"
    bp.write_text(json.dumps(base))
    sp.write_text(json.dumps(supp))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "merge_gate.py"),
         str(bp), str(sp)],
        capture_output=True, text=True, check=True,
    )
    merged = json.loads(bp.read_text())
    for sf in ("sf0.1", "sf1"):
        timed = set(merged[sf]["queries"]) | set(merged[sf]["queries_extra"])
        errored = set(merged[sf]["errors"])
        assert not (timed & errored), f"{sf}: query both timed and errored"
        assert "q4" in timed and "q4" not in errored
        assert "q2" in errored and "q2" not in timed
    # totals recomputed from the merged (q2-less) headline set
    assert merged["sf0.1"]["value"] == round(1.0 + 0.5, 3)
    # step ratios only over queries timed at BOTH scales
    assert set(merged["step_ratio"]) == {"q1", "q3", "q4"}
    assert json.loads(out.stdout.strip())["merged"] == ["q4"]
