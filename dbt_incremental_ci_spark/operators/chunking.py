"""Context-window text chunking for LLM training pipelines.

Splits documents into fixed-size character chunks (the pre-tokenizer
coarse cut; token-exact packing is `operators/packing.py`'s job).

Two implementations of the same contract:

- :func:`chunk_text` — pure Column expressions (sequence → substr →
  posexplode). JVM-side, codegen-able, map-side only (the explode adds
  rows before any shuffle) — THE scale path, and exactly replayable in
  the SQL oracle.
- :class:`ChunkTextUDTF` — the same logic as a Python UDTF (Spark
  3.5+ `@udtf`), registered for lateral SQL use. Covered by a unit
  test asserting row-for-row equivalence with the expression path;
  exists to cover the UDTF API surface (and as the template for chunk
  logic that genuinely needs Python, e.g. a real tokenizer) — it is
  the documented SLOW path (per-row Python, pickled row transfer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame, id_col: str, text_col: str, size: int = 200
) -> DataFrame:
    """(id, chunk_idx, chunk, n_chunks) — empty/NULL texts yield no
    rows (zero-length sequence), matching the UDTF generator."""
    if size < 1:
        raise ValueError(f"chunk size must be >= 1, got {size}")
    n_chunks = F.ceil(F.length(text_col) / F.lit(float(size))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col(text_col).substr(i * size + 1, F.lit(size)),
    )
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            F.col(id_col),
            n_chunks.alias("n_chunks"),
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .select(id_col, "chunk_idx", "chunk", "n_chunks")
    )


def make_chunk_udtf(size: int = 200):
    """Build the UDTF class (deferred so importing this module never
    requires the UDTF runtime); register with
    ``spark.udtf.register("chunk_text", make_chunk_udtf(200))``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_chunks int")
    class ChunkTextUDTF:
        def eval(self, text: str):
            if not text:
                return
            n = (len(text) + size - 1) // size
            for i in range(n):
                yield i, text[i * size : (i + 1) * size], n

    return ChunkTextUDTF
