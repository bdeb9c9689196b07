"""Typed source catalog over the driver's Parquet test tables.

The reference declares fixed source schemas in DDL + sources.yml
(SURVEY §1.2); here sources are Parquet (self-describing), so the
catalog's job is resolution + registration, not schema declaration.
Parquet scans give Catalyst column pruning and predicate pushdown for
free — check with ``.explain``: ``PushedFilters``/``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL API path)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs


def load_seed_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Seed loader (ref DEDP/seeds/*.csv — small reference CSVs,
    SURVEY §2.1 S3). Explicit schema preferred; header inference as a
    fallback for tiny files only."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    bad_records_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines source — the interchange format of most raw
    web/crawl/training-data drops. Schema is REQUIRED: at 100 TB,
    schema inference is a full extra pass over the data, and drifting
    inferred types silently fork pipelines. ``PERMISSIVE`` mode parks
    malformed lines in ``bad_records_col`` instead of failing the job —
    callers route them to a quarantine sink."""
    full_schema = f"{schema}, {bad_records_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", bad_records_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, bad_records_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantine_rows) from a PERMISSIVE JSONL read.

    Quarantine rows keep ALL columns, not just the raw line — partly
    for triage, partly because Spark disallows queries that reference
    only the internal corrupt-record column of a JSON scan."""
    from pyspark.sql import functions as F

    clean = df.filter(F.col(bad_records_col).isNull()).drop(bad_records_col)
    bad = df.filter(F.col(bad_records_col).isNotNull())
    return clean, bad
