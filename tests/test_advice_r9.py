"""Round-9 ADVICE regression tests: ragged-input cross-engine
divergences in q344 facility location and simplified_silhouette, and
the q385 zero-token-source division guard. Each test fails on the
pre-fix code."""

import duckdb

from dbt_incremental_ci_spark.operators.embstats import (
    simplified_silhouette,
    simplified_silhouette_sql,
)
from dbt_incremental_ci_spark.workload import ORACLES, QUERIES
from dbt_incremental_ci_spark.workload_q10 import _q344_replica


def test_q344_ragged_vectors_match_replica(spark, tmp_path):
    """Round-9 ADVICE item 2: a ragged vector null-pads through
    zip_with to si = 0 in Spark while the replica's zip() truncates to
    a partial dot.  Both sides now drop rows (and candidates) whose
    dimension differs from the first candidate's, so a mixed-dimension
    corpus produces the identical greedy trace."""
    rows = []
    for i in range(20):
        rows.append((i, [float((i * 7 + d * 3) % 11) / 10.0 for d in range(4)]))
    rows.append((20, [0.9, 0.9, 0.9]))        # ragged CANDIDATE (id < 64)
    rows.append((100, [1.0, 1.0]))            # ragged corpus row
    rows.append((101, [0.5, 0.5, 0.5, 0.5, 0.5]))  # over-long corpus row
    # single parquet FILE (not a Spark part-dir): the replica's DuckDB
    # read_parquet takes the literal path
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    got = [
        (r["step"], r["chosen_id"], r["gain"], r["coverage"])
        for r in QUERIES["q344_facility_location"](
            spark, str(tmp_path)
        ).collect()
    ]
    want = _q344_replica(str(tmp_path))
    assert got == want
    assert got, "greedy trace must be non-empty on well-formed rows"
    # the ragged candidate must never be chosen on either engine
    assert all(c != 20 for _s, c, _g, _cv in got)


def test_silhouette_ragged_matches_duckdb_twin(spark):
    """Round-9 ADVICE item 3: the DuckDB twin previously kept
    partial-dot cosines for ragged vectors (dim inner join) while
    Spark dropped them via NULL zip_with cosines.  The twin's new
    cdim/vlen guard must make a mixed-dimension corpus score
    identically cross-engine."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [0.5], 2),             # ragged class: short row
        (6, [0.2, 0.8, 0.3], 2),   # ragged class: long row
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = sorted(tuple(r) for r in simplified_silhouette(df).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {[round(float(x), 6) for x in v]}::DOUBLE[], {c})"
            for i, v, c in rows
        )
        + ") t(vec_id, embedding, label)"
    )
    want = sorted(
        tuple(r) for r in con.execute(simplified_silhouette_sql("emb")).fetchall()
    )
    con.close()
    assert got == want
    # the well-formed classes score all their rows; the all-ragged
    # class has no scorable (own AND best-other non-NULL) rows and
    # must vanish from the output on BOTH engines — pre-fix, the twin
    # kept partial-dot cosines and emitted a class-2 row
    by_label = {r[0]: r for r in got}
    assert by_label[0][1] == 2 and by_label[1][1] == 2
    assert 2 not in by_label


def test_q385_zero_token_source_yields_null_fill_ratio(spark, tmp_path):
    """Round-9 ADVICE item 5: a source whose docs all tokenize empty
    has usable_tokens = 0 and windows_lb = 0; the fill_ratio division
    must CASE to NULL on both engines instead of Spark-NULL vs a
    DuckDB '//' zero-division error."""
    rows = [
        ("empty_src", "   "),
        ("empty_src", ""),
        ("web", "alpha beta gamma"),
        ("web", "delta " * 3000),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: tuple(r)[1:]
        for r in QUERIES["q385_packing_audit"](spark, str(tmp_path)).collect()
    }
    assert got["empty_src"][-1] is None  # fill_ratio NULL, not a crash
    assert got["web"][-1] is not None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(ORACLES["q385_packing_audit"]).fetchall()
    }
    con.close()
    assert got == want
