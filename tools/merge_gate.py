"""Merge a supplemental sf1_gate run (SPARK_GRAFT_GATE_ONLY subset)
into the committed BENCH_SF1 artifact: per-query entries from the
supplement replace/extend the base artifact's, totals and the
over_10x list are recomputed. Methodology (replica, reps, noop sink)
must match — the gate script records both runs the same way, so the
merge is pure bookkeeping.

Usage: python tools/merge_gate.py BASE.json SUPPLEMENT.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path, supp_path = sys.argv[1], sys.argv[2]
    base = json.load(open(base_path))
    supp = json.load(open(supp_path))
    for sf in ("sf0.1", "sf1"):
        for sect in ("queries", "queries_extra"):
            base[sf][sect].update(supp[sf].get(sect, {}))
        base[sf]["errors"].update(supp[sf].get("errors", {}))
        # Keep error/timing state consistent (round-4 ADVICE): a query
        # that SUCCEEDED in the remeasure must lose its stale base
        # error, and one that ERRORED in the remeasure must lose its
        # stale base timing — otherwise the merged artifact reports
        # both a timing and an error for the same query.
        supp_ok = {
            n
            for sect in ("queries", "queries_extra")
            for n in supp[sf].get(sect, {})
        }
        for n in supp_ok:
            base[sf]["errors"].pop(n, None)
        for n in supp[sf].get("errors", {}):
            for sect in ("queries", "queries_extra"):
                base[sf][sect].pop(n, None)
        base[sf]["value"] = round(sum(base[sf]["queries"].values()), 3)
    qs = {**base["sf0.1"]["queries"], **base["sf0.1"]["queries_extra"]}
    qb = {**base["sf1"]["queries"], **base["sf1"]["queries_extra"]}
    base["step_ratio"] = {
        n: round(qb[n] / qs[n], 2) if qs[n] > 0 else None
        for n in qs
        if n in qb
    }
    base["over_10x"] = sorted(
        n for n, r in base["step_ratio"].items() if r and r > 10
    )
    with open(base_path, "w") as fh:
        json.dump(base, fh, indent=1)
    print(json.dumps({"merged": sorted(
        {**supp["sf1"].get("queries", {}),
         **supp["sf1"].get("queries_extra", {})}.keys()),
        "over_10x": base["over_10x"]}))


if __name__ == "__main__":
    main()
