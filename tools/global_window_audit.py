"""Global-window bounds sweep (round-12, VERDICT r11 item 9).

A ``Window`` with no ``partitionBy`` funnels its whole input frame into
ONE task (the ``WindowExec: No Partition Defined`` warning class).
That is fine — and deliberate — when the frame is provably bounded by
something other than the data (partition count, bins, vocabulary,
calendar, a model's dimensions), and fatal when a data-sized frame
sneaks in. This sweep statically enumerates every partition-less
Window site in the package and requires an explicit bound note per
(file, enclosing function); a site with no note prints UNEXPLAINED and
the audit exits non-zero (enforced by tests/test_plan_contracts.py).

Usage: python tools/global_window_audit.py   # prints the markdown section
"""

from __future__ import annotations

import os
import re
import sys

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dbt_incremental_ci_spark",
)

# (file basename, enclosing function) -> why the windowed frame is
# domain-bounded. "O(x)" bounds never scale with the corpus.
GLOBAL_WINDOW_NOTES: dict[tuple[str, str], str] = {
    # ---- workloads -------------------------------------------------
    ("workload_q12.py", "q366"): "bigram-TYPE frame (vocab-bounded) top rank",
    ("workload_q12.py", "q369"): "16-row eigenvector loading frame (model-sized)",
    ("workload_q12.py", "q377"): "vocab-bounded term-count frame, full-top rank",
    ("workload_q12.py", "q379"): "vocab-bounded z frame, two top-15 rank windows",
    ("workload_q12.py", "q381"): "10-row decile summary cumulative",
    ("workload_q13.py", "q389"): "vocab-bounded top-50 rank over count>=5 terms",
    ("workload_q13.py", "q390"): "10-row decile summary cumulative",
    ("workload_q1.py", "q11"): "month frame (calendar-bounded: one row per ym)",
    ("workload_q10.py", "q340"): "8-row temperature-grid rank",
    ("workload_q10.py", "q348"): (
        "freq-of-freq cumulative: |distinct group sizes| <= max group "
        "size, never key count"
    ),
    ("workload_q11.py", "q364"): "vocab-bounded (df>=20) term frame rank",
    ("workload_q2.py", "q59"): "day frame (calendar-bounded: one row per day)",
    ("workload_q2.py", "q69"): "event-type-sized (5-row) frame",
    ("workload_q2.py", "q87"): "day frame (calendar-bounded), 30-day range",
    ("workload_q9.py", "q326"): "2-dp value grid (<=10^4 cells) cumulative + lead",
    ("workload_q9.py", "q328"): (
        "month frame row_number + months^2-bounded breakpoint-candidate rank"
    ),
    ("workload_q8.py", "q290"): (
        "textrank vocabulary frame (distinct words of the bounded "
        "keyword slice), id-assignment rank"
    ),
    ("workload_q8.py", "q300"): "source-cardinality (metadata-sized) cumsum",
    # ---- operators -------------------------------------------------
    ("sampling.py", "per_category_cap"): (
        "exclusive prefix over O(#categories) per-category totals"
    ),
    ("sampling.py", "epoch_shuffle_rank"): (
        "exclusive prefix over O(num_partitions) per-partition totals "
        "(two-phase rank offsets)"
    ),
    ("sampling.py", "weighted_sample_wor"): (
        "rank over the threshold-prefiltered candidate frame: "
        "O(oversample*n) rows by the bounded-hash-sample contract, "
        "never corpus-sized"
    ),
    ("sampling.py", "token_budget_mix"): (
        "exclusive prefix over O(#mixture keys) per-key totals"
    ),
    ("sampling.py", "group_snake_kfold"): (
        "group-sized frame (one row per group) snake-order rank + total"
    ),
    ("dsir.py", "dsir_select"): (
        "exclusive prefix over O(num_partitions) per-partition totals "
        "(two-phase rank offsets)"
    ),
    ("patterns.py", "funnel_counts"): (
        "funnel step spine: O(#steps) rows (lag + first-step frame)"
    ),
    ("survival.py", "kaplan_meier"): (
        "life table: one row per distinct duration (duration-domain-"
        "bounded, the q228 class)"
    ),
    ("survival.py", "logrank_test"): "life table (duration-domain-bounded)",
    ("survival.py", "competing_risks"): "life table (duration-domain-bounded)",
    ("text.py", "heaps_checkpoints"): "O(#checkpoints) k-spine cumulative",
    ("skyline.py", "skyline_2d"): (
        "prefix-min over O(#buckets) per-bucket minima (two-phase "
        "skyline reduction)"
    ),
    ("histsketch.py", "histogram_quantiles"): "bin frame (O(#bins)) cumulative",
    ("stump.py", "decision_stump"): "threshold-grid frame (O(k)) best rank",
    ("packing.py", "global_cumsum"): (
        "exclusive prefix over O(num_partitions) per-bucket totals "
        "(two-phase cumsum offsets)"
    ),
    ("robust.py", "quantile_normalize"): (
        "DOCUMENTED data-sized reference rank (in-code scale note: at "
        "100 TB the reference side moves to ranks.two_phase_row_number; "
        "the operator contract is measurement frames, not the corpus)"
    ),
    ("ranks.py", "two_phase_row_number"): (
        "exclusive prefix over O(num_partitions) per-partition totals "
        "(THE two-phase rank offsets primitive)"
    ),
    ("evalmetrics.py", "binned_pr_curve"): "bin frame (O(#bins)) cumulative",
    ("evalmetrics.py", "srm_check"): "variant frame (O(#variants)) total",
    ("evalmetrics.py", "decile_lift"): (
        "n_tiles-row summary cumulative + DOCUMENTED eval-frame-sized "
        "global ntile (in-code scale note: sampled prediction frames; "
        "at 100 TB bin first or use the two-phase rank)"
    ),
    ("evalmetrics.py", "slice_ztest_bh"): (
        "slice frame (O(#slices)) BH rank + total"
    ),
    ("evalmetrics.py", "best_threshold"): "bin frame (O(#bins)) argmin ranks",
    ("embstats.py", "dim_variance_profile"): "dimension frame (O(dims)) rank",
    ("isotonic.py", "isotonic_calibrate_binned"): (
        "bin frame (O(#bins)) PAV cumulative"
    ),
    # ---- edu marts (dimension-scaled report tables) ---------------
    ("marts_bench.py", "competitive_program_benchmarking"): (
        "program-dimension frame (one row per program)"
    ),
    ("marts_ied.py", "institutional_effectiveness_dashboard"): (
        "semester-dimension frame (one row per semester)"
    ),
    ("marts_budget.py", "budget_allocation_optimization"): (
        "department-dimension frame (one row per department)"
    ),
    ("marts5.py", "instructor_effectiveness_scorecard"): (
        "faculty-dimension frame (one row per instructor)"
    ),
    ("marts2.py", "semester_enrollment_trends"): (
        "semester-dimension frame (one row per semester)"
    ),
}

_WIN_RE = re.compile(r"Window\.(orderBy|rowsBetween|rangeBetween)\(")


def scan() -> list[tuple[str, int, str, str]]:
    """(relpath, line, func, note-or-UNEXPLAINED) per site."""
    out = []
    for dirpath, _, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            src = open(path).read().splitlines()
            func = "<module>"
            in_doc = False
            for i, ln in enumerate(src, 1):
                if ln.count('"""') % 2 == 1:
                    in_doc = not in_doc
                m = re.match(r"\s*def (\w+)", ln)
                if m:
                    func = m.group(1)
                if in_doc or ln.lstrip().startswith("#"):
                    continue
                if _WIN_RE.search(ln) and "partitionBy" not in "".join(
                    src[i - 1 : i + 1]
                ):
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    note = GLOBAL_WINDOW_NOTES.get(
                        (fname, func), "UNEXPLAINED"
                    )
                    out.append((rel, i, func, note))
    return out


def main() -> int:
    sites = scan()
    print("\n## Global windows, accounted for\n")
    print(
        "Every `Window` without a `partitionBy` below runs its input "
        "frame through one task. The sweep (tools/global_window_audit."
        "py, statically enforced by tests/test_plan_contracts.py) "
        "requires each site's frame to be domain-bounded — partition "
        "count, bins, vocabulary, calendar, model dimensions — or to "
        "carry an explicit in-code scale note. Any UNEXPLAINED entry "
        "is a regression to investigate before shipping.\n"
    )
    bad = 0
    seen = set()
    for rel, line, func, note in sites:
        key = (rel, func, note)
        mark = "" if key not in seen else " (same note as above)"
        seen.add(key)
        if note == "UNEXPLAINED":
            bad += 1
        print(f"- `{rel}:{line}` [{func}]: {note}{mark}")
    print(f"\n{len(sites)} sites, {bad} unexplained.")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
