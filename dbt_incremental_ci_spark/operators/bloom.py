"""Bloom-filter membership over a key column — approximate "have we
ingested this before?" checks without joining the full historical
corpus.

The incremental-ingestion primitive: a web-crawl pipeline keeps a
Bloom filter of every document fingerprint ever accepted; a new batch
probes the filter and only the (tiny) might-be-duplicate fraction pays
for an exact verification join against history. The filter is
orders-of-magnitude smaller than the corpus and UNIONS are its merge
operation — perfectly mergeable state (the aggstate monoid story).

Representation: SPARSE — a DataFrame of the distinct set bit
positions rather than a packed bitmap. At most ``min(m, n*k)`` rows,
so for practical m (2^16..2^24) the bits table broadcasts, and
"membership" becomes a relational join: a key might be contained iff
ALL ``k`` of its probe positions hit the bits table (count == k).
Every step is exact relational algebra over deterministic md5-derived
positions (the house ``sampling.hash_uniform`` hash family), so the
whole construction — including which probes are FALSE POSITIVES —
replays value-exactly in the DuckDB oracle. Merging two filters built
with the same (m, k, salt) is ``union → distinct``.

False-positive rate: standard ``(1 - e^{-kn/m})^k``; with the
defaults (m=65536, k=4) a 5k-key filter sits near 1e-4. Position
hashing uses k independent salted md5 draws, not double hashing, to
keep the oracle twin a one-liner.

No counterpart in the reference repo; part of the training-data
operator surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m: int, k: int, salt: str) -> Column:
    """Array of the key's k bit positions in [0, m)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f":{salt}:{i}"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % m
            for i in range(k)
        ]
    )


def position_sql(key_expr: str, m: int, salt: str, i: int) -> str:
    """DuckDB twin of one probe position (for oracle builders)."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}:{i}'),"
        f" 1, 8))::BIGINT % {m})"
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "doc_id",
    m: int = 65536,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """The filter: distinct set bit positions, one row each
    (``bit_pos``). Shuffle cost: one distinct over <= n*k 8-byte
    values capped at m rows."""
    return (
        df.select(
            F.explode(_positions(F.col(key_col), m, k, salt)).alias("bit_pos")
        )
        .dropDuplicates(["bit_pos"])
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of filters built with identical (m, k, salt)."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates(["bit_pos"])


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str = "doc_id",
    m: int = 65536,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe rows + ``might_contain``: true iff all k positions are
    set. The bits side is filter-sized (<= m rows) — AQE broadcasts
    it; the probe side never shuffles on data size, only the per-probe
    k-row explode aggregates back by key."""
    pp = probes.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), m, k, salt)).alias("bit_pos"),
    )
    hits = (
        pp.join(bits.withColumn("__set", F.lit(1)), "bit_pos", "left")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0)))).alias(
            "might_contain"
        ))
    )
    return probes.join(hits, key_col, "left").withColumn(
        "might_contain", F.coalesce("might_contain", F.lit(False))
    )


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 65536,
    k: int = 4,
    salt: str = "bloomjoin",
) -> DataFrame:
    """Inner equi-join with an explicit Bloom runtime filter: build a
    filter over the dim keys, pre-drop every fact row whose key cannot
    match (no false negatives — the result is EXACTLY the plain inner
    join; false positives just ride through to the exact join and die
    there), then join only the surviving sliver.

    This is the semi-join-reduction pattern Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects for
    shuffle joins, materialized as a first-class operator: at 100 TB a
    fact-side shuffle is the dominant cost, and when the dim selects
    <1% of fact rows the Bloom prefilter turns a full-fact shuffle
    into a sliver shuffle for the price of one broadcast-sized bits
    table probe (map-only on the fact side).
    """
    bits = bloom_build(dim, dim_key, m, k, salt)
    pre = bloom_might_contain(bits, fact, fact_key, m, k, salt)
    sliver = pre.filter(F.col("might_contain")).drop("might_contain")
    return sliver.join(dim, sliver[fact_key] == dim[dim_key])
