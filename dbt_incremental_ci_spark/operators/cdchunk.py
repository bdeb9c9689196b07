"""Content-defined chunking (CDC) — the storage-level dedup split
(Muthitacharoen et al., LBFS/SOSP 2001; rsync's rolling-window idea):
a chunk boundary falls BEFORE position p whenever the hash of the
w-char window starting at p satisfies ``hash % mask == 0``. Because
the boundary decision depends only on CONTENT, a substring shared by
two documents chunks identically regardless of its byte offset —
which is exactly what fixed-size blocking cannot do, and why CDC
dedups partially-overlapping documents that exact whole-doc dedup
misses.

Shape: the boundary scan is a positions explode (corpus × length —
the shingle class, q53/q353 precedent) feeding map-side-combinable
aggregates; the span assembly is a per-document lag window (frame
bounded by that document's cut count). The window hash is md5 of the
slice — identical in Spark and DuckDB, so the whole pipeline replays
value-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mask: int = 32,
) -> DataFrame:
    """Chunk every document by content-defined boundaries; expected
    chunk length ≈ ``mask`` chars. Documents shorter than ``window``
    are excluded (no interior window fits). Returns one row per chunk:
    ``(<id_col>, h, ln)`` — md5 of the chunk text and its length;
    chunk equality (the dedup key) is hash equality.
    """
    d = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__tx")
    ).where(F.length("__tx") >= window)
    # Guard the position range: for a document of length exactly
    # ``window`` the upper bound is 1, and Spark's sequence(2, 1)
    # DESCENDS ([2, 1] — step defaults to -1 when start > stop) while
    # DuckDB's generate_series(2, 1) is empty; the two spurious
    # positions fired the hash-mask cut for ~6% of such docs, chunking
    # them differently across engines (round-8 ADVICE item 1). Emit no
    # interior positions for those docs — they still get their
    # whole-doc chunk from the ``finals`` branch below.
    pos = d.select(
        "__id",
        "__tx",
        F.explode(
            F.when(
                F.length("__tx") - (window - 1) >= 2,
                F.sequence(F.lit(2), F.length("__tx") - (window - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    )
    cut = pos.where(
        F.conv(
            F.substring(
                F.md5(F.expr(f"substring(__tx, p, {window})")), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        % mask
        == 0
    ).select("__id", "p")
    w = Window.partitionBy("__id").orderBy("p")
    spans = cut.select(
        "__id",
        F.coalesce(F.lag("p").over(w), F.lit(1)).alias("s"),
        F.col("p").alias("e"),
    )
    finals = (
        d.join(
            cut.groupBy("__id").agg(F.max("p").alias("__mp")),
            "__id",
            "left",
        )
        .select(
            "__id",
            F.coalesce(F.col("__mp"), F.lit(1)).alias("s"),
            (F.length("__tx") + 1).alias("e"),
        )
    )
    return (
        spans.unionByName(finals)
        .join(d, "__id")
        .select(
            F.col("__id").alias(id_col),
            F.md5(F.expr("substring(__tx, s, e - s)")).alias("h"),
            (F.col("e") - F.col("s")).cast("bigint").alias("ln"),
        )
    )


def cdc_chunks_sql(
    rows: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mask: int = 32,
) -> str:
    """DuckDB twin of :func:`cdc_chunks` (a CTE body ending in the
    ``chunks`` relation ``(id, h, ln)``) — embed inside a WITH."""
    return f"""
    d AS (
      SELECT {id_col} AS id, {text_col} AS tx FROM {rows}
      WHERE length({text_col}) >= {window}
    ),
    cut AS (
      SELECT id, p
      FROM d, unnest(generate_series(2, length(tx) - {window - 1}))
        AS g(p)
      WHERE ('0x' || substr(md5(substr(tx, p, {window})), 1, 4))::BIGINT
            % {mask} = 0
    ),
    spans AS (
      SELECT id,
             COALESCE(lag(p) OVER (PARTITION BY id ORDER BY p), 1) AS s,
             p AS e
      FROM cut
    ),
    finals AS (
      SELECT d.id, COALESCE(m.mp, 1) AS s, length(d.tx) + 1 AS e
      FROM d LEFT JOIN (SELECT id, max(p) AS mp FROM cut
                        GROUP BY 1) m USING (id)
    ),
    chunks AS (
      SELECT d.id, md5(substr(d.tx, sp.s, sp.e - sp.s)) AS h,
             CAST(sp.e - sp.s AS BIGINT) AS ln
      FROM (SELECT * FROM spans UNION ALL SELECT * FROM finals) sp
      JOIN d USING (id)
    )
    """
