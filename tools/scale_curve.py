"""Scaling-curve probe: times representative queries at the three
driver scale factors (sf0.001 / sf0.01 / sf0.1 — 100× row-count span)
and reports best-of-N wall times plus the 0.01→0.1 scaling ratio.

A 10× data step costing ≪10× wall time means fixed overhead (driver,
planning, Python worker spin-up) still dominates at local scale — the
regime where per-row costs are amortized is exactly what a real
cluster run looks like, so ratios well under 10 are the healthy sign
for the 100 TB extrapolation (compute-bound operators should approach
the data ratio; scan-light aggregates stay near 1).

Usage: python tools/scale_curve.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dbt_incremental_ci_spark import workload
from dbt_incremental_ci_spark.session import get_spark

DEFAULT = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q17_late_shipments",
    "q26_exact_dedup",
    "q29_cosine_topk",
    "q32_minhash_near_dups",
    "q58_fuzzy_match",
    "q62_tfidf_top_terms",
    "q68_curation_pipeline",
    "q83_text_chunking",
]

SFS = ["0.001", "0.01", "0.1"]


def best_of(fn, spark, sf_dir, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark()
    # warm codegen/session paths once
    workload.QUERIES["q06_global_kpis"](spark, "/root/testdata/sf0.001").count()
    print(f"{'query':32s} " + " ".join(f"sf{s:>6s}" for s in SFS) + "  x(0.01->0.1)")
    for name in names:
        fn = workload.QUERIES[name]
        times = [best_of(fn, spark, f"/root/testdata/sf{s}") for s in SFS]
        ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        print(
            f"{name:32s} "
            + " ".join(f"{t:8.3f}" for t in times)
            + f"  {ratio:5.2f}"
        )


if __name__ == "__main__":
    main()
