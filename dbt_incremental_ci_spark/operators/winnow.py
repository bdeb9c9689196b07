"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003) — the rolling-hash fingerprinting scheme behind MOSS-style
plagiarism/overlap detection, and the "document fingerprinting" entry
of the training-data operator charter.

Scheme: hash every k-token shingle (rolling k-gram), slide a window of
``w`` consecutive gram hashes over the document, keep the MINIMUM hash
of each window. The guarantee: any shared substring of at least
``k + w - 1`` tokens between two documents yields at least one shared
fingerprint — so fingerprint-postings overlap is a sound detector for
long verbatim overlaps (quotes, mirrored passages, template reuse),
which MinHash (whole-document set similarity) cannot localize.

Spark-first shape — the entire fingerprint derivation is ARRAY math on
the document row (tokens → gram-hash array → sliding-window minima →
distinct), pure codegen'd higher-order functions with ZERO shuffles
until the postings explode:

- per-doc work is O(grams × w) with w small (the classic time/guarantee
  trade); gram hashes are the house md5 32-bit variate so the DuckDB
  oracle replays them bit-for-bit;
- documents shorter than a full window (but >= k tokens) contribute
  their single global-min fingerprint — the SIGMOD paper's boundary
  convention, so every fingerprintable doc has >= 1 fingerprint;
- overlap detection explodes (doc, fp) postings, drops fingerprints
  with document frequency above ``max_df`` (boilerplate/common spans —
  the same hot-key cap as the PPJoin prefix and MinHash band joins:
  ubiquitous fingerprints cost O(df^2) pairs and identify nothing),
  then counts shared fingerprints per pair. Join fan-out is bounded by
  max_df^2 per fingerprint — never corpus-quadratic.

At 100 TB: the fingerprint table is ~|corpus tokens| / ((w+1)/2) rows
(winnowing's expected density 2/(w+1)), hash-partitioned by
fingerprint; the pair join inherits the banding-join scale story.

No counterpart in the reference repo (its workload is dbt-model SQL);
part of the training-data surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def _gram_hashes(toks: Column, k: int, salt: str) -> Column:
    """32-bit md5 variate of every k-token shingle, as an array aligned
    with gram start positions (empty when the doc has < k tokens)."""
    n_grams = F.size(toks) - F.lit(k - 1)
    return F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.array_join(F.slice(toks, i, k), " "),
                            F.lit(":" + salt),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    salt: str = "wn",
) -> DataFrame:
    """(id, fp) postings: the distinct winnowing fingerprints of each
    document. Documents with fewer than ``k`` tokens emit no rows;
    documents with >= k tokens but fewer than ``w`` full windows emit
    their single minimum gram hash (boundary convention).

    Map-only until the final explode — no shuffle in this function.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    toks = _tokens(text_col)
    gh = _gram_hashes(toks, k, salt)
    n_windows = F.size(gh) - F.lit(w - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(gh, i, w)),
        ),
    ).otherwise(
        F.when(F.size(gh) >= 1, F.array(F.array_min(gh))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return (
        df.select(F.col(id_col), F.array_distinct(mins).alias("__fps"))
        .select(F.col(id_col), F.explode("__fps").alias("fp"))
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    salt: str = "wn",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (id_a < id_b), i.e. candidates for long verbatim overlap.

    Fingerprints appearing in more than ``max_df`` documents are
    dropped before pairing (boilerplate spans; O(df^2) fan-out with no
    discriminative value). Output: ``id_a, id_b, shared_fps``.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w, salt=salt)
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    rare = fps.join(dfreq.filter(F.col("__df") <= max_df), "fp")
    a = rare.select(F.col(id_col).alias("id_a"), "fp")
    b = rare.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
