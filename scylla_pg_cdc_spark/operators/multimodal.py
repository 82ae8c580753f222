"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs —
the 100 TB-scale pattern: media bytes never pass through Python row
objects; they move in Arrow record batches to vectorized Pandas UDFs
(``mapInPandas``) whose batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The container has no image/audio codecs, so the *decode* step is
stubbed (deterministic fake features, clearly marked) while everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shape —
is real and tested:

- ``media_schema()``      — the canonical asset schema
- ``synthesize_assets``   — deterministic fake corpus builder
- ``extract_features``    — mapInPandas: bytes -> fixed-dim feature
  vector (sha256-seeded fake; swap ``_decode_stub`` for a real codec)
- ``resize_images``       — mapInPandas: bytes -> bytes + new dims
- ``sample_frames``       — video -> exploded frame rows (one row per
  sampled frame, frame_idx + frame bytes)

Each transform is partition-parallel and schema-stable, so swapping in
a real decoder changes zero Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

FEATURE_DIM = 16


def media_schema() -> StructType:
    """Canonical multimodal asset schema: opaque bytes + typed
    metadata (mirrors the reference's BLOB/bytea columns,
    `docker/scylla/init.cql:111`, `docker/postgres/init.sql:35`)."""
    return StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), False),  # image|audio|video
            StructField("content", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("codec", StringType(), True),
        ]
    )


def synthesize_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake asset corpus (no codecs in this container):
    content bytes are sha256-derived from asset_id, so every run and
    every engine produces identical data."""
    rows = []
    for i in range(n):
        media_type = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                media_type,
                bytearray(content),
                64 + (i % 8) * 16 if media_type != "audio" else None,
                48 + (i % 8) * 16 if media_type != "audio" else None,
                1000 * (1 + i % 30) if media_type != "image" else None,
                {"image": "png", "audio": "pcm16", "video": "raw"}[media_type],
            )
        )
    return spark.createDataFrame(rows, media_schema())


def _decode_stub(content: bytes, media_type: str) -> list[float]:
    """STUB decoder: a real deployment replaces this with PIL/ffmpeg/
    torchaudio. Deterministic: features are normalized bytes of
    sha256(content), so the Spark-side contract is fully testable
    without codecs."""
    if content is None:
        raise NotImplementedError(
            "real media decode requires a codec library not present in "
            "this container; content must be non-null for the stub"
        )
    digest = hashlib.sha256(bytes(content) + media_type.encode()).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """bytes -> FEATURE_DIM feature vector via mapInPandas (Arrow
    batches; partition-parallel, no driver involvement)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": [
                        _decode_stub(c, m)
                        for c, m in zip(pdf["content"], pdf["media_type"])
                    ],
                }
            )

    return assets.mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to images, rewrites bytes +
    dimensions. Stub 'resize' truncates/pads bytes to w*h/64 so output
    size tracks the requested dims deterministically."""
    target_len_expr = max(1, width * height // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b: bytes) -> bytes:
                b = bytes(b)
                if len(b) >= target_len_expr:
                    return b[:target_len_expr]
                return b + b"\x00" * (target_len_expr - len(b))

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": pdf["content"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return assets.filter(F.col("media_type") == "image").mapInPandas(
        run, RESIZE_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(assets: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (explode inside the UDF — output cardinality > input is fine for
    mapInPandas). Stub 'frame' is a content slice keyed by index."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "frame_ms": [], "frame": []
            }
            for _, row in pdf.iterrows():
                n_frames = max(1, int(row["duration_ms"]) // every_ms)
                content = bytes(row["content"])
                for idx in range(n_frames):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(idx * every_ms)
                    start = (idx * 16) % max(1, len(content) - 16)
                    out["frame"].append(content[start : start + 16])
            yield pd.DataFrame(out)

    return assets.filter(F.col("media_type") == "video").mapInPandas(
        run, FRAMES_SCHEMA
    )
