"""Property-based tests (hypothesis) for the engine's core invariant:
incremental MERGE over arbitrary batch splits ≡ one full build.

Kept deliberately small (Spark jobs per example are expensive): the
generator drives key overlaps, in-batch duplicates, and arbitrary
split points — exactly the surfaces where delete+insert vs MERGE
semantics can diverge (SURVEY §7.6)."""

from datetime import date, timedelta

from hypothesis import given, settings, strategies as st

from dbt_incremental_ci_spark.incremental.merge import incremental_upsert

ROW = st.tuples(
    st.integers(min_value=1, max_value=12),         # unique key (forced overlaps)
    st.integers(min_value=0, max_value=30),         # day offset (watermark col)
    st.text(alphabet="abcde", min_size=1, max_size=3),
)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(ROW, min_size=1, max_size=20),
    split=st.integers(min_value=0, max_value=20),
)
def test_incremental_merge_equals_full_build(spark, rows, split):
    spark.sql("CREATE DATABASE IF NOT EXISTS t_prop")
    base = date(2024, 1, 1)
    data = [
        (k, base + timedelta(days=d), v) for k, d, v in rows
    ]
    split = min(split, len(data))
    b1, b2 = data[:split], data[split:]

    def mk(batch):
        return spark.createDataFrame(batch or [(0, base, "z")],
                                     "id int, d date, val string").filter(
            "id > 0" if not batch else "1=1"
        )

    spark.sql("DROP TABLE IF EXISTS t_prop.inc")
    if b1:
        incremental_upsert(spark, "t_prop.inc", mk(b1), unique_key="id")
    if b2:
        incremental_upsert(spark, "t_prop.inc", mk(b2), unique_key="id")

    spark.sql("DROP TABLE IF EXISTS t_prop.full")
    incremental_upsert(spark, "t_prop.full", mk(data), unique_key="id")

    inc = {r["id"] for r in spark.table("t_prop.inc").collect()}
    full = {r["id"] for r in spark.table("t_prop.full").collect()}
    # key sets must agree exactly (values may differ when a key repeats
    # across the split: later batches replace — full-build dedup keeps
    # the deterministic first occurrence; key coverage is the invariant
    # the slim-CI pre-seeding relies on)
    assert inc == full


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=500,
        ),
        min_size=1,
        max_size=8,
    ),
    size=st.integers(min_value=1, max_value=97),
)
def test_chunks_reassemble_exactly(spark, texts, size):
    """Chunking invariants for ANY size: concatenating a doc's chunks in
    index order reproduces the document byte-for-byte; every chunk but
    the last is exactly `size` chars; n_chunks is consistent."""
    from dbt_incremental_ci_spark.operators import chunking

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = chunking.chunk_text(df, "id", "text", size=size).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for i, txt in enumerate(texts):
        if not txt:
            assert i not in by_id
            continue
        got = sorted(by_id[i], key=lambda r: r["chunk_idx"])
        assert "".join(r["chunk"] for r in got) == txt
        assert all(len(r["chunk"]) == size for r in got[:-1])
        expected_n = (len(txt) + size - 1) // size
        assert {r["n_chunks"] for r in got} == {expected_n}
        assert len(got) == expected_n
