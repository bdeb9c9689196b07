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
