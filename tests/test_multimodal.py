"""Multimodal plumbing: binary columns + mapInPandas feature/frame ops.
Image decode is REAL for uncompressed formats (BMP 24-bit / PPM P6,
pure numpy); compressed codecs raise per payload. Feature extraction
keeps its digest stub (no vision model in container)."""

import pytest

from dbt_incremental_ci_spark.operators import multimodal as mm


def media_df(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes" * 10, (640, 480, None, None)),
        (2, "audio", b"RIFFfakewav" * 20, (None, None, 16000, 2000)),
        (3, "video", b"\x00\x00ftypfakemp4" * 40, (1920, 1080, None, 8000)),
        (4, "image", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(spark):
    df = media_df(spark)
    out = mm.extract_features(df, dim=8)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,n_bytes:int,"
        "digest:string,feature:array<float>>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert all(len(r["feature"]) == 8 for r in rows.values())
    assert rows[4]["n_bytes"] == 0  # null-safe
    # deterministic: same payload → same feature
    again = {r["media_id"]: r for r in mm.extract_features(df, dim=8).collect()}
    assert again[1]["feature"] == rows[1]["feature"]
    assert again[1]["digest"] == rows[1]["digest"]


def test_sample_frames_fanout(spark):
    df = media_df(spark)
    out = mm.sample_frames(df, every_n_bytes=64)
    rows = out.collect()
    assert all(r["media_id"] == 3 for r in rows)  # only video rows fan out
    n_bytes = len(b"\x00\x00ftypfakemp4" * 40)
    assert len(rows) == (n_bytes + 63) // 64
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
        range(len(rows))
    )


def _gradient(h, w, seed=0):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = (seed + 7 * x + 13 * y) % 256
    g = (3 * seed + 5 * x + y) % 256
    b = (x * y + seed) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_bmp_roundtrip_exact():
    import numpy as np

    for h, w in [(3, 4), (5, 7), (1, 1), (2, 6)]:  # odd widths hit padding
        arr = _gradient(h, w, seed=h * 31 + w)
        out = mm.decode_image(mm.encode_bmp(arr))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, arr)


def test_ppm_roundtrip_exact():
    import numpy as np

    for h, w in [(3, 4), (5, 7), (1, 1)]:
        arr = _gradient(h, w, seed=h + w)
        out = mm.decode_image(mm.encode_ppm(arr))
        assert np.array_equal(out, arr)


def test_decode_rejects_compressed_only():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nfake")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xffjpegfake")


def test_resize_real_nearest_neighbor(spark):
    import numpy as np

    src = _gradient(2, 2, seed=9)
    rows = [
        (1, "image", bytes(mm.encode_bmp(src)), (2, 2, None, None)),
        (2, "image", b"\x89PNGfake", (None, None, None, None)),  # undecodable
        (3, "audio", b"RIFFfake", (None, None, 16000, 10)),  # filtered out
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.resize_images(df, 4, 4).collect()}
    assert set(out) == {1, 2}  # image rows only; audio filtered
    assert out[2]["content"] is None  # compressed → NULL, no crash
    up = mm.decode_image(bytes(out[1]["content"]))
    # nearest-neighbor 2x2 -> 4x4: each source pixel becomes a 2x2 block
    expect = src[np.array([0, 0, 1, 1])][:, np.array([0, 0, 1, 1])]
    assert np.array_equal(up, expect)


def test_pixel_stats_exact(spark):
    import numpy as np

    arr = _gradient(3, 5, seed=2)
    rows = [
        (1, "image", bytes(mm.encode_bmp(arr)), (5, 3, None, None)),
        (2, "image", bytes(mm.encode_ppm(arr)), (5, 3, None, None)),
        (3, "image", b"\xff\xd8jpeg", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.image_pixel_stats(df).collect()}
    sr, sg, sb = (int(arr[:, :, i].astype(np.int64).sum()) for i in range(3))
    for mid, fmt in [(1, "bmp"), (2, "ppm")]:
        r = got[mid]
        assert (r["fmt"], r["width"], r["height"], r["n_pixels"]) == (fmt, 5, 3, 15)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)
        assert r["checksum"] == 3 * sr + 5 * sg + 7 * sb
    assert got[3]["fmt"] == "unsupported" and got[3]["n_pixels"] is None


def test_wav_pcm16_roundtrip_exact():
    import numpy as np

    s = (np.arange(-500, 500, 7, dtype=np.int32) * 13 % 32003 - 16000).astype(
        np.int16
    )
    arr, rate = mm.decode_wav_pcm16(mm.encode_wav_pcm16(s, 16000))
    assert rate == 16000
    assert np.array_equal(arr, s)


def test_wav_decoder_walks_extra_chunks_and_rejects_compressed():
    import struct

    import numpy as np

    s = np.array([1, -2, 3], dtype=np.int16)
    payload = mm.encode_wav_pcm16(s, 8000)
    # splice a LIST chunk between fmt and data: decoder must skip it
    hdr, data = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = (
        payload[:12]
        + payload[12:36]  # fmt chunk
        + extra
        + data  # data chunk
    )
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, rate = mm.decode_wav_pcm16(spliced)
    assert np.array_equal(arr, s) and rate == 8000
    with pytest.raises(NotImplementedError):
        mm.decode_wav_pcm16(b"\xff\xfbmp3frame")


def test_audio_sample_stats_exact(spark):
    import numpy as np

    s = np.array([100, -200, 300, -400, 0, 5], dtype=np.int16)
    rows = [
        (1, "audio", bytes(mm.encode_wav_pcm16(s, 8000)), (None, None, 8000, None)),
        (2, "audio", b"\xff\xfbjunk", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.audio_sample_stats(df).collect()}
    r = got[1]
    assert (r["n_samples"], r["sum_s"], r["sum_abs"], r["max_abs"]) == (
        6, -195, 1005, 400,
    )
    # signs: + - + - + +  -> flips at 4 boundaries (0 counts as >= 0)
    assert r["zero_crossings"] == 4
    assert r["sum_sq"] == 100**2 + 200**2 + 300**2 + 400**2 + 0 + 25
    assert got[2]["n_samples"] is None  # undecodable -> NULL stats


def test_avi_roundtrip_and_sampling(spark):
    import numpy as np

    def frame(seed, h=3, w=5):
        y, x = np.mgrid[0:h, 0:w]
        return np.stack(
            [(seed + x) % 256, (seed + y) % 256, (seed + x * y) % 256],
            axis=-1,
        ).astype(np.uint8)

    frames = [frame(s) for s in (1, 50, 99, 160, 255)]
    payload = mm.encode_avi_rgb24(frames, fps=10)
    out = mm.decode_avi_rgb24(payload)
    assert len(out) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))
    with pytest.raises(NotImplementedError):
        mm.decode_avi_rgb24(b"\x00\x00\x00\x20ftypisom")

    rows = [
        (1, "video", bytes(payload), (5, 3, None, None)),
        (2, "video", b"notavideo", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = sorted(
        mm.video_frame_stats(df, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    # undecodable row 2 contributes nothing; frames 0,2,4 sampled
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    a = frames[2].astype(np.int64)
    r2 = got[1]
    assert (r2["sum_r"], r2["sum_g"], r2["sum_b"]) == (
        int(a[:, :, 0].sum()), int(a[:, :, 1].sum()), int(a[:, :, 2].sum())
    )


def test_corrupt_payload_mix_skips_not_crashes(spark):
    """Round-7 ADVICE item 1: a truncated 'BM'-prefixed payload used to
    raise struct.error THROUGH resize_images/image_pixel_stats and kill
    the sweep; the audio/video walkers likewise on short RIFF. Every
    decode entry point must SKIP malformed payloads (None/NULL row),
    never crash."""
    import numpy as np

    arr = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    good_bmp = mm.encode_bmp(arr)
    good_wav = mm.encode_wav_pcm16(
        np.array([100, -100, 50], dtype=np.int16), 8000
    )
    rows = [
        (1, "image", good_bmp, (4, 3, None, None)),
        (2, "image", good_bmp[:10], (None, None, None, None)),  # struct.error class
        (3, "image", b"P6\n4", (None, None, None, None)),  # truncated header
        (4, "image", b"", (None, None, None, None)),
        (5, "audio", good_wav, (None, None, 8000, None)),
        (6, "audio", good_wav[:16], (None, None, None, None)),  # short chunk hdr
        (7, "video", b"RIFF\x10\x00\x00\x00AVI ", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    img = df.filter("media_type = 'image'")
    resized = mm.resize_images(img, 2, 2).collect()
    assert {r["media_id"]: r["content"] is not None for r in resized} == {
        1: True, 2: False, 3: False, 4: False,
    }
    stats = {r["media_id"]: r for r in mm.image_pixel_stats(img).collect()}
    assert stats[1]["fmt"] == "bmp" and stats[1]["n_pixels"] == 12
    assert all(stats[i]["fmt"] == "unsupported" for i in (2, 3, 4))
    aud = {
        r["media_id"]: r
        for r in mm.audio_sample_stats(
            df.filter("media_type = 'audio'")
        ).collect()
    }
    assert aud[5]["n_samples"] == 3 and aud[6]["n_samples"] is None
    vid = mm.video_frame_stats(df.filter("media_type = 'video'")).collect()
    assert vid == []  # malformed AVI skipped, no crash


def test_nearest_centroid_empty_and_sparse_model(spark):
    """Round-7 ADVICE item 4: empty input must return an empty frame
    (not crash building a zero-struct array), and the literal centroid
    arrays key off max dim so a sparse fit degrades instead of
    KeyErroring."""
    from dbt_incremental_ci_spark.operators.embstats import (
        nearest_centroid_confusion,
    )

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int"
    )
    out = nearest_centroid_confusion(empty)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "label_true", "label_pred", "n", "share",
    ]
    some = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.1, 0.9], 1),
        ],
        "vec_id bigint, embedding array<double>, label int",
    )
    rows = nearest_centroid_confusion(some).collect()
    diag = {(r["label_true"], r["label_pred"]): r["n"] for r in rows}
    assert diag[(0, 0)] == 2 and diag[(1, 1)] == 2
