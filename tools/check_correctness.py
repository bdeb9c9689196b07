"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        s_n, o_n = normalize(sdf), normalize(odf)
        if list(s_n.columns) != list(o_n.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s_n.columns)} vs {list(o_n.columns)}")
            continue
        if len(s_n) != len(o_n):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(s_n)} vs {len(o_n)}")
            continue
        if not s_n.equals(o_n):
            failures.append(name)
            diff = (s_n != o_n).any(axis=1)
            print(f"FAIL  {name}: value mismatch in {int(diff.sum())}/{len(s_n)} rows")
            bad = diff[diff].index[:3]
            for i in bad:
                print(f"      spark : {s_n.loc[i].to_dict()}")
                print(f"      duckdb: {o_n.loc[i].to_dict()}")
        else:
            print(f"ok    {name}: {len(s_n)} rows match")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
