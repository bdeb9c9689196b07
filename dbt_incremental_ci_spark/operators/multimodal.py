"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

The Spark-side design is fully real — schemas, partition-friendly
iterator UDFs (``mapInPandas``: one Arrow batch in, one out, no
per-row Python), deterministic fake decoders — while the actual
codec calls are stubbed (PIL/ffmpeg are not in this container). Each
stub is a single clearly-marked function; swapping in a real decoder
changes no Spark plumbing.

Scale notes: binary payloads ride the normal columnar path (Parquet
BYTE_ARRAY); decode work is embarrassingly parallel per-partition, so
throughput scales with executors; ``spark.sql.files.maxPartitionBytes``
bounds batch memory (payloads stay off the driver entirely).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (content bytes, media_type, width/height or sample_rate/duration)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, digest string, "
    "feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_digest string"


def _decode_stub(content: bytes) -> bytes:
    """STUB — real implementation would be e.g. PIL.Image.open /
    soundfile.read; the container has neither. Deterministic identity
    so the pipeline stays testable end-to-end."""
    return content


def _feature_stub(content: bytes, dim: int = 8) -> list[float]:
    """STUB feature extractor: derives a deterministic pseudo-embedding
    from a sha256 of the payload (a real one would run a vision/audio
    model over the decoded tensor)."""
    h = hashlib.sha256(content or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Binary column → fixed-dim feature vector, in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "digest": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(
                        lambda b: _feature_stub(_decode_stub(b or b""), dim)
                    ),
                }
            )

    from dbt_incremental_ci_spark.operators.scaling import ensure_min_parallelism

    return ensure_min_parallelism(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled
    "frame" (every_n_bytes chunk — a real decoder would seek keyframes).
    Demonstrates the 1→N mapInPandas fan-out shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_digest = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = content or b""
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    chunk = payload[off : off + every_n_bytes]
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_digest.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_digest": out_digest}
            )

    return df.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: STUBBED decode/encode (no PIL in container) —
    raises on use so callers can't silently get wrong pixels; metadata
    and plumbing paths are exercised by tests via extract_features."""
    raise NotImplementedError(
        "image decode/resize requires PIL/libvips (not in this container); "
        "plumbing-equivalent path is extract_features()"
    )
