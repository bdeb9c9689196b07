"""Round-10 ADVICE regression tests: the simplified-silhouette
other_best-NULL corner (Spark counted an s=0 row the DuckDB twin's
inner join dropped) and the q344 replica's explicit min-vec_id anchor.
The pathological-threshold setsim guard is regression-tested in
tests/test_setsim.py."""

import duckdb

from dbt_incremental_ci_spark.operators.embstats import (
    simplified_silhouette,
    simplified_silhouette_sql,
)


def test_silhouette_other_best_null_at_own_cos_one(spark):
    """A row matching its own class's centroid dimension but NO other
    class's has other_best NULL.  When its own-class cosine is exactly
    1.0 (a singleton class: centroid == the vector, a = 0), Spark's
    ``greatest(0, NULL) = 0`` previously fell to the .otherwise(0.0)
    branch and COUNTED the row with s = 0, while the DuckDB twin's
    inner join on the other-class cosine subquery dropped it.  Chosen
    semantics: silhouette is undefined without a reachable second
    cluster → the row is dropped on BOTH engines."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        # singleton dim-3 class: own centroid == the vector → own cos
        # exactly 1.0 (unit vector, exact 6-decimal values); both other
        # classes are dim-2 → every other-class cosine NULL
        (5, [0.6, 0.8, 0.0], 2),
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
        tuple(r)
        for r in con.execute(simplified_silhouette_sql("emb")).fetchall()
    )
    con.close()
    assert got == want
    by_label = {r[0]: r for r in got}
    # pre-fix Spark emitted (2, 1, 0.0, 0, 0.0) here
    assert 2 not in by_label, "unreachable-other row must be dropped"
    assert by_label[0][1] == 2 and by_label[1][1] == 2


def test_q344_replica_anchor_is_min_vec_id(tmp_path):
    """The replica's dim guard must anchor to the MIN-vec_id candidate
    (matching Spark's orderBy("x")), not parquet row order: write the
    candidates physically out of order with ragged dims and check the
    surviving dimension is the min-id candidate's."""
    import pandas as pd

    from dbt_incremental_ci_spark.workload_q10 import _q344_replica

    # physical row order puts a dim-4 candidate FIRST; min vec_id (0)
    # is dim-3.  A row-order anchor would pick dim 4 and drop vec 0/2.
    pd.DataFrame(
        {
            "vec_id": [1, 0, 2, 3],
            "embedding": [
                [0.5, 0.5, 0.5, 0.5],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    out = _q344_replica(str(tmp_path))
    chosen = {c for _s, c, _g, _cv in out}
    assert 1 not in chosen, "the dim-4 row-order-first candidate must be dropped"
    assert chosen, "dim-3 candidates must survive and be chosen"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # label
            st.integers(2, 4),  # dimension
            st.integers(0, 10**6),  # value seed
        ),
        min_size=2,
        max_size=14,
    )
)
def test_silhouette_twin_agreement_on_random_mixed_dim(spark, rows):
    """Property: on arbitrary mixed-dimension corpora (ragged classes,
    singleton classes, off-dimension rows with no reachable other
    class) the Spark simplified_silhouette and its DuckDB twin agree
    exactly — the round-9 cdim/vlen guard plus the round-10
    other_best-NULL guard together close every known corner."""
    import duckdb as _duck

    data = []
    for i, (lbl, dim, seed) in enumerate(rows):
        vec = [round(((seed >> (4 * k)) % 16) / 8.0 - 1.0, 6) for k in range(dim)]
        if all(x == 0.0 for x in vec):
            vec[0] = 0.5
        data.append((i, vec, lbl))
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    got = sorted(tuple(r) for r in simplified_silhouette(df).collect())

    con = _duck.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {[round(float(x), 6) for x in v]}::DOUBLE[], {c})"
            for i, v, c in data
        )
        + ") t(vec_id, embedding, label)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(simplified_silhouette_sql("emb")).fetchall()
    )
    con.close()
    assert got == want
