"""Multimodal plumbing: binary columns + mapInPandas feature/frame ops.
Decode is stubbed (no codec libs in container); the Spark-side schema,
batching, and fan-out shapes are real and verified here."""

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


def test_resize_is_marked_stub(spark):
    with pytest.raises(NotImplementedError):
        mm.resize_images(media_df(spark), 64, 64)
