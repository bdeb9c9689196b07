"""Round-8 second-batch operators (q357–q364 band): interval-overlap
range join, simplified silhouette, perceptual aHash, keyframe
selection. Hand-computable cases; the closed-form corpus oracles live
in the workload twins."""

import numpy as np
import pytest

from dbt_incremental_ci_spark.operators import multimodal as mm
from dbt_incremental_ci_spark.operators.embstats import (
    simplified_silhouette,
)
from dbt_incremental_ci_spark.operators.intervals import overlap_pairs


def test_overlap_pairs_hand_case(spark):
    """Half-open semantics: touching intervals (end == start) do NOT
    overlap; a pair spanning many shared buckets is still emitted
    exactly once; overlap length is exact."""
    rows = [
        (1, 0, 100),      # overlaps 2 (50..100) and contains 3
        (2, 50, 7300),    # spans 3 bucket boundaries vs 4
        (3, 10, 20),      # inside 1
        (4, 7200, 7400),  # overlaps 2 in a later bucket
        (5, 100, 110),    # touches 1 at 100 -> NO overlap (half-open)
    ]
    df = spark.createDataFrame(rows, "iv_id int, start long, end long")
    got = {
        (r["id_a"], r["id_b"]): (r["ov_start"], r["ov_end"], r["overlap"])
        for r in overlap_pairs(df, bucket_width=3600).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 4), (2, 5)}
    assert got[(1, 2)] == (50, 100, 50)
    assert got[(1, 3)] == (10, 20, 10)
    assert got[(2, 4)] == (7200, 7300, 100)
    assert got[(2, 5)] == (100, 110, 10)  # 5 touches 1 but overlaps 2


def test_overlap_pairs_extra_columns(spark):
    rows = [(1, 0, 10, "u1"), (2, 5, 15, "u2")]
    df = spark.createDataFrame(
        rows, "iv_id int, start long, end long, owner string"
    )
    out = overlap_pairs(df, bucket_width=100).collect()
    assert len(out) == 1
    assert (out[0]["a_owner"], out[0]["b_owner"]) == ("u1", "u2")


def test_image_ahash_hand_case(spark):
    """Constant image -> no cell exceeds the mean (strict) -> zero
    hash; half-bright image -> exactly the bright half's bits set,
    matching an independent numpy recompute."""
    flat = np.full((8, 8, 3), 7, dtype=np.uint8)
    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    grad[:, 4:, :] = 200  # right half bright
    rows = [
        (1, "image", mm.encode_bmp(flat), (8, 8, None, None)),
        (2, "image", mm.encode_ppm(grad), (8, 8, None, None)),
        (3, "image", b"BM\x01\x02", (None, None, None, None)),  # corrupt
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.image_ahash(df).collect()}
    assert set(got) == {1, 2}  # corrupt skipped
    assert (got[1]["hash_hi"], got[1]["hash_lo"], got[1]["popcount"]) == (
        0, 0, 0,
    )
    # independent recompute for the gradient image
    cells = grad.astype(np.int64).sum(axis=2)
    total = cells.sum()
    bits = (cells.reshape(-1) * 64) > total
    hi = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
    lo = sum(1 << i for i in range(32) if bits[i])
    assert (got[2]["hash_hi"], got[2]["hash_lo"]) == (hi, lo)
    assert got[2]["popcount"] == int(bits.sum()) == 32
    assert got[2]["fmt"] == "ppm" and got[1]["fmt"] == "bmp"


def test_image_ahash_samples_grid_not_topleft(spark):
    """A 16x16 image whose bright pixels sit only at odd coordinates
    hashes differently from its even-coordinate twin — proves the
    nearest-neighbor remap indexes (i*h)//8, not a crop."""
    odd = np.zeros((16, 16, 3), dtype=np.uint8)
    odd[1::2, 1::2, :] = 255  # sampled indices are even -> all dark
    df = spark.createDataFrame(
        [(1, "image", mm.encode_bmp(odd), (16, 16, None, None))],
        mm.MEDIA_SCHEMA,
    )
    r = mm.image_ahash(df).collect()[0]
    assert r["popcount"] == 0  # grid samples rows/cols 0,2,4,... only


def test_video_keyframe_hand_case(spark):
    """Frame 2 differs most from frame 1; single-frame video reports
    (0, 0); corrupt payload skipped."""
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    f1 = base.copy(); f1[0, 0, 0] = 10           # L1 vs f0 = 10
    f2 = base.copy(); f2[:, :, 1] = 50           # L1 vs f1 = 16*50 + 10
    vid = mm.encode_avi_rgb24([base, f1, f2], fps=10)
    solo = mm.encode_avi_rgb24([base], fps=10)
    rows = [
        (1, "video", vid, (4, 4, None, None)),
        (2, "video", solo, (4, 4, None, None)),
        (3, "video", b"RIFF\x00\x00\x00\x00AVI ", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.video_keyframe(df).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["keyframe_idx"], got[1]["max_l1"]) == (2, 16 * 50 + 10)
    assert got[1]["n_frames"] == 3
    assert (got[2]["keyframe_idx"], got[2]["max_l1"]) == (0, 0)


def test_simplified_silhouette_separated_clusters(spark):
    """Two tight, far-apart clusters -> every point closer to its own
    centroid: mean silhouette high, zero negatives; a planted
    mislabeled point goes negative for its (wrong) class."""
    rows = []
    for i in range(5):
        rows.append((i, [1.0, 0.0, 0.001 * i], 0))
        rows.append((10 + i, [0.0, 1.0, 0.001 * i], 1))
    rows.append((99, [1.0, 0.0, 0.0], 1))  # mislabeled into class 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in simplified_silhouette(df).collect()}
    assert got[0]["n"] == 5 and got[1]["n"] == 6
    assert got[0]["n_negative"] == 0
    assert got[0]["mean_silhouette"] > 0.9
    assert got[1]["n_negative"] == 1  # the planted point
    assert got[1]["share_negative"] == pytest.approx(1 / 6, abs=1e-6)


def test_simplified_silhouette_single_class_empty(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    assert simplified_silhouette(df).count() == 0


def test_cdc_chunks_offset_invariance(spark):
    """The CDC property fixed-size blocking lacks: a shared substring
    chunks identically at DIFFERENT offsets, so its interior chunks
    dedup across the two documents."""
    from dbt_incremental_ci_spark.operators.cdchunk import cdc_chunks

    # varied (non-periodic) shared text so interior chunks are distinct
    shared = " ".join(f"tok{i}word{i * 7 % 13}" for i in range(60))
    rows = [
        (1, "AAAA " + shared + " tail-one"),
        (2, "a completely different and longer prefix here "
            + shared + " other tail"),
        (3, "short but distinct text with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ch = cdc_chunks(df, "doc_id", "text").collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    # interior chunks of the shared span must coincide
    common = by_doc[1] & by_doc[2]
    assert len(common) >= 3
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # chunks tile each document exactly: lengths sum to doc length
    lens = {}
    for r in ch:
        lens[r["doc_id"]] = lens.get(r["doc_id"], 0) + r["ln"]
    assert lens == {1: len(rows[0][1]), 2: len(rows[1][1]),
                    3: len(rows[2][1])}


def test_competing_risks_hand_case(spark):
    """4 subjects: day 1 one purchase + one error (n=4), day 2 one
    censor, day 3 one purchase (n=1, extinction). Hand CIFs:
    cif1(1)=0.25, cif2(1)=0.25; day 3: S(2-)=0.5 -> cif1=0.75."""
    from dbt_incremental_ci_spark.operators.survival import (
        competing_risks,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 0), (3, 1)], "duration long, cause int"
    )
    got = {r["duration"]: r for r in competing_risks(
        df, "duration", "cause").collect()}
    assert got[1]["n_risk"] == 4 and got[1]["d_cause1"] == 1
    assert got[1]["cif1"] == pytest.approx(0.25)
    assert got[1]["cif2"] == pytest.approx(0.25)
    assert got[2]["c_censored"] == 1
    assert got[2]["cif1"] == pytest.approx(0.25)  # censoring adds nothing
    assert got[3]["n_risk"] == 1
    assert got[3]["cif1"] == pytest.approx(0.75)  # S(2-)=0.5 * 1/1
    assert got[3]["cif2"] == pytest.approx(0.25)


def test_competing_risks_vs_km_when_single_cause(spark):
    """With no cause-2 events, cif1 must equal 1 - KM survival."""
    from dbt_incremental_ci_spark.operators.survival import (
        competing_risks,
        kaplan_meier,
    )

    rows = [(d % 7, 1 if d % 3 else 0) for d in range(40)]
    df = spark.createDataFrame(rows, "duration long, event int")
    km = {r["duration"]: r["survival"] for r in kaplan_meier(
        df, "duration", "event").collect()}
    cr = {r["duration"]: r["cif1"] for r in competing_risks(
        df.selectExpr("duration", "event AS cause"), "duration", "cause"
    ).collect()}
    for day, s in km.items():
        assert cr[day] == pytest.approx(1.0 - s, abs=2e-6)


def test_audio_autocorr_hand_period(spark):
    """A pure square wave of period 8 must pick lag 8 (the exact
    integer autocorrelation peaks at the true period)."""
    sq = np.tile(
        np.array([500] * 4 + [-500] * 4, dtype=np.int16), 12
    )
    wav = mm.encode_wav_pcm16(sq, 8000)
    short = mm.encode_wav_pcm16(np.array([1], dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [
            (1, "audio", wav, (None, None, 8000, None)),
            (2, "audio", short, (None, None, 8000, None)),  # < min lag
            (3, "audio", b"ID3\x03", (None, None, None, None)),
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in mm.audio_autocorr_lag(df).collect()}
    assert set(got) == {1}  # too-short and undecodable both skipped
    assert got[1]["best_lag"] == 8
    s = sq.astype(np.int64)
    assert got[1]["best_autocorr"] == int((s[:-8] * s[8:]).sum())


def test_cdc_chunks_tiling_property(spark):
    """Hypothesis: for ANY document (unicode included), CDC chunks
    tile the text exactly — lengths sum to the doc length and
    re-chunking is deterministic (same hashes)."""
    from hypothesis import given, settings, strategies as st

    from dbt_incremental_ci_spark.operators.cdchunk import cdc_chunks

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), min_codepoint=32
                ),
                min_size=8,
                max_size=400,
            ),
            min_size=1,
            max_size=4,
        )
    )
    def check(texts):
        rows = [(i, s) for i, s in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ch = cdc_chunks(df, "doc_id", "text").collect()
        lens: dict = {}
        hashes: dict = {}
        for r in ch:
            lens[r["doc_id"]] = lens.get(r["doc_id"], 0) + r["ln"]
            hashes.setdefault(r["doc_id"], []).append(r["h"])
        assert lens == {i: len(s) for i, s in rows}
        ch2 = cdc_chunks(df, "doc_id", "text").collect()
        hashes2: dict = {}
        for r in ch2:
            hashes2.setdefault(r["doc_id"], []).append(r["h"])
        assert {k: sorted(v) for k, v in hashes.items()} == {
            k: sorted(v) for k, v in hashes2.items()
        }

    check()


def test_cdc_chunks_window_length_doc_matches_duckdb(spark):
    """Cross-engine regression (round-8 ADVICE item 1): a document of
    length exactly ``window`` (8) hits sequence(2, 1), which DESCENDS
    in Spark ([2, 1]) but is empty in DuckDB — before the guard,
    'hoyauvxt' chunked as (1, 7) in Spark vs (8) in DuckDB. Both
    engines must now emit the single whole-doc chunk, and longer docs
    must keep chunking identically."""
    import duckdb

    from dbt_incremental_ci_spark.operators.cdchunk import (
        cdc_chunks,
        cdc_chunks_sql,
    )

    rows = [
        (1, "hoyauvxt"),                     # length == window: the bug
        (2, "abcdefgh"),                     # length == window
        (3, "exactly nine"),                 # window + a few
        (4, " ".join(f"w{i}x{i * 3 % 7}" for i in range(40))),  # long
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["h"], r["ln"])
        for r in cdc_chunks(df, "doc_id", "text").collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {cdc_chunks_sql('documents', 'doc_id', 'text', 8, 32)} "
            "SELECT id, h, ln FROM chunks"
        ).fetchall()
    )
    assert got == want
    # the two window-length docs each produced exactly one whole chunk
    assert [(d, ln) for d, _h, ln in got if d in (1, 2)] == [(1, 8), (2, 8)]


def test_q380_pair_set_matches_exact_oracle(spark):
    """q380's wedge census squares any recall miss in the banded pair
    set (round-8 ADVICE item 3) — so verify the Spark pair SET, not
    just the output counts, against DuckDB's exact all-pairs Jaccard
    at sf0.001."""
    import duckdb

    from dbt_incremental_ci_spark.operators import dedup
    from dbt_incremental_ci_spark.workload import t

    sf_dir = "/root/testdata/sf0.001"
    docs = t(spark, sf_dir, "documents")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.7
        )
        .select("id_a", "id_b")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = set(
        con.execute(
            """
            WITH sh AS (
              SELECT doc_id,
                     CASE WHEN strlen(lower(text)) >= 5 THEN
                       list_distinct(list_transform(
                         generate_series(1, strlen(lower(text)) - 4),
                         i -> substr(lower(text), i, 5)))
                     ELSE [lower(text)] END AS s
              FROM documents
            )
            SELECT a.doc_id, b.doc_id
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.7
            """
        ).fetchall()
    )
    assert got == want


def test_simplified_silhouette_ragged_vector_dropped(spark):
    """Fixed-dimension contract guard (round-8 ADVICE item 4): a
    ragged vector null-pads to a NULL own-class cosine and must be
    DROPPED, not scored as s = 0 inside n."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [0.5], 0),  # ragged: wrong dimensionality
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in simplified_silhouette(df).collect()}
    # centroid model still sees the ragged row, but the score frame
    # must exclude it: class 0 scores exactly its 2 well-formed rows
    assert got[0]["n"] == 2
    assert got[1]["n"] == 2
