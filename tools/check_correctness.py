"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [--json OUT.json] [--smoke] [sf_dir] [query ...]

``--smoke`` runs the committed smoke set (round-10 judge item 6): the
current round's touched query paths plus the bench watch-list plus a
cross-band sample — the exact set the round-10 judge re-verified by
hand — in under ~4 minutes, so perf commits can be re-verified without
waiting for the full 391-query sweep.  Update SMOKE each round to the
paths that round touches.

``--json`` additionally writes a driver-CORRECTNESS-shaped artifact
(per-query rows/schema/hash match booleans) so a full local run over
all queries can be committed for the judge to diff instead of re-run —
the driver's own window caps at 50 entries.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from dbt_incremental_ci_spark.session import get_spark
from dbt_incremental_ci_spark.sources.catalog import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable order-insensitive comparison
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


# The committed smoke set: round-touched paths + bench watch-list +
# cross-band sample.  Round 11 first half touches q146 (k-step BFS),
# q127 (setsim alpha guard), q357 (embstats NULL-semantics mirror),
# q140 (components), q344 (workload_q10 replica anchor); the
# optimization half adds its touched paths (q318/q367/q253/q257/q295/
# q77/q106/q221/q132/q238 + the exact_quantiles riders and the
# q263/q280 revert); watch-list is the four r17 bench flags
# (q353/q357/q375/q384); the rest is the judge's cross-band sample
# from round 10.
# Round 12 adds its touched paths: the iterative band (q112/q290
# pagerank, q222 HITS, q150 k-core), the components users
# (q52/q227/q288/q345 — q140/q388 already present), the basket prefix
# (q263/q280), the exact_quantiles riders (q77/q285/q286/q374/q375),
# and keeps the q344/q318 negative-result/alias paths.
SMOKE = [
    "q03_top_revenue_orders", "q24_recursive_hierarchy",
    "q32_minhash_near_dups", "q50_salted_join",
    "q52_dedup_components",
    "q77_equidepth_bins",
    "q101_incremental_dedup", "q106_curation_v2", "q112_pagerank",
    "q127_setsim_join", "q129_triangle_census",
    "q132_maxsim_topk", "q140_entity_resolution",
    "q146_bfs_levels", "q150_kcore", "q196_moments_profile", "q204_ndcg",
    "q221_lsh_banding_eval", "q222_hits", "q227_cluster_size_profile",
    "q238_nearest_centroid",
    "q253_two_hop_neighbors", "q257_degree_assortativity",
    "q263_item_cooccurrence", "q280_rec_coverage",
    "q285_time_to_convert", "q286_key_skew_audit",
    "q288_grid_density_clusters", "q290_textrank",
    "q295_dedup_pair_report",
    "q318_quantile_reg_grid",
    "q344_facility_location", "q345_license_conflict",
    "q351_shapley_reach", "q353_shingle_curve",
    "q357_simplified_silhouette", "q367_fixed_effects",
    "q374_geometric_median", "q375_fd_histogram",
    "q384_pca2_explained", "q385_packing_audit", "q388_dedup_retention",
    "q390_quality_retention",
]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    smoke = False
    if "--smoke" in argv:
        smoke = True
        argv.remove("--smoke")
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if smoke:
        only |= set(SMOKE)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    failures = []
    report: dict[str, dict] = {}

    def record(name, rows_match, schema_match, hash_match, s_rows, o_rows, err):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": s_rows,
            "oracle_rows": o_rows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, False, False, False, None, None, f"spark error: {e}")
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            record(name, True, None, None, len(sdf), None, "rows-only (no oracle)")
            print(f"ok    {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, False, False, False, len(sdf), None, f"duckdb error: {e}")
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        s_n, o_n = normalize(sdf), normalize(odf)
        if list(s_n.columns) != list(o_n.columns):
            failures.append(name)
            record(name, len(s_n) == len(o_n), False, False, len(sdf), len(odf), "column mismatch")
            print(f"FAIL  {name}: columns {list(s_n.columns)} vs {list(o_n.columns)}")
            continue
        if len(s_n) != len(o_n):
            failures.append(name)
            record(name, False, True, False, len(sdf), len(odf), "rowcount mismatch")
            print(f"FAIL  {name}: rowcount {len(s_n)} vs {len(o_n)}")
            continue
        if not s_n.equals(o_n):
            failures.append(name)
            diff = (s_n != o_n).any(axis=1)
            record(name, True, True, False, len(sdf), len(odf),
                   f"value mismatch in {int(diff.sum())}/{len(s_n)} rows")
            print(f"FAIL  {name}: value mismatch in {int(diff.sum())}/{len(s_n)} rows")
            bad = diff[diff].index[:3]
            for i in bad:
                print(f"      spark : {s_n.loc[i].to_dict()}")
                print(f"      duckdb: {o_n.loc[i].to_dict()}")
        else:
            record(name, True, True, True, len(sdf), len(odf), None)
            print(f"ok    {name}: {len(s_n)} rows match")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": report}, fh, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
