"""Semi-structured (JSON) column handling: typed extraction and
key-value explosion.

Event streams land with free-form JSON payloads (the test ``events``
table's ``props`` column). Two Spark-first access paths:

- :func:`json_typed` — ``from_json`` with an explicit schema: the
  parse happens once per row inside codegen, the result is a struct
  whose fields prune/push down like real columns. This is the 100 TB
  path: parse cost is O(payload), downstream cost is columnar.
- :func:`json_kv` — ``from_json`` to ``map<string,string>`` +
  ``explode``: schema-free profiling of which keys exist at what
  frequency/type — the discovery step you run before committing to a
  typed schema.

Both are JVM-side expressions — no Python touches the payload.
Malformed documents yield NULL structs (counted, never dropped
silently) matching ``PERMISSIVE`` parse semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_typed(df: DataFrame, json_col: str, schema: str) -> DataFrame:
    """Parse ``json_col`` with the DDL ``schema`` into struct column
    ``parsed`` plus a ``parse_ok`` flag (NULL struct = malformed)."""
    parsed = F.from_json(F.col(json_col), schema)
    return df.withColumn("parsed", parsed).withColumn(
        "parse_ok", parsed.isNotNull()
    )


def json_kv(df: DataFrame, json_col: str) -> DataFrame:
    """Explode the payload into (key, value-string) rows for key
    census / schema discovery. Map-only until the caller aggregates."""
    m = F.from_json(F.col(json_col), "map<string,string>")
    return df.select(
        "*", F.explode_outer(m).alias("json_key", "json_value")
    )


def key_census(df: DataFrame, json_col: str) -> DataFrame:
    """Per-key frequency + inferred-type census across the corpus:
    how many payloads carry each key, and whether its values are all
    integral / numeric (the decision input for a typed schema)."""
    kv = json_kv(df, json_col)
    v = F.col("json_value")
    return kv.filter(F.col("json_key").isNotNull()).groupBy("json_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(v.rlike(r"^-?\d+$"), 1).otherwise(0)
        ).alias("n_integral"),
        F.sum(
            F.when(v.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), 1).otherwise(0)
        ).alias("n_numeric"),
    )
