"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (engine extension for 100 TB training-data pipelines).

Design: the Spark-side plumbing is real — schemas, Arrow-batched
``mapInPandas`` operators, partitioning — while the actual codec calls are
stubbed behind ``codec=`` (the image/audio libraries are not in this
container). ``codec="fake"`` is a deterministic stand-in so the plumbing
is testable end-to-end; ``codec="pil"``/``codec="ffmpeg"`` raise
NotImplementedError with a clear message until the libs exist.

At scale: binary payloads dominate partition size — ``maxPartitionBytes``
should govern the scan, decode is a narrow map (no shuffle), and feature
outputs are small, so the expensive stage is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id bigint, kind string, content binary, "
    "meta struct<format: string, width: int, height: int, duration_ms: int>"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: content is
    the utf-8 text bytes standing in for an encoded payload."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic 'decode': md5-seeded feature vector. Stands in for a
    real decode → embed step; same Arrow batch shape as the real thing."""
    h = hashlib.md5(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def _pil_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image decode via Pillow when present: grayscale, resize to
    dim×dim, column-mean → dim floats (same output shape as the fake
    codec, so downstream plumbing is codec-agnostic)."""
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    return (np.asarray(img, dtype="float32") / 255.0).mean(axis=0).tolist()


def decode_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """content binary → fixed-dim feature vector via Arrow-batched
    mapInPandas (batch in, batch out; per-task codec init).

    ``codec="pil"`` uses a real Pillow decode when the library is
    importable (optional-dependency pattern, same as CRAM→pysam in
    bam/cram.py); anything else real raises NotImplementedError."""
    if codec == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "codec='pil' requires Pillow, which is not installed in this "
                "environment; use codec='fake' for plumbing tests"
            ) from exc
        decode = _pil_features
    elif codec == "fake":
        decode = _fake_features
    else:
        raise NotImplementedError(
            f"codec={codec!r}: real decoders (ffmpeg/torchaudio) are not "
            "available in this environment; use codec='fake' for plumbing"
        )

    out_schema = "media_id bigint, kind string, features array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [decode(bytes(b)) for b in pdf["content"]],
                }
            )

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, codec: str = "fake") -> DataFrame:
    """video → sampled 'frames' (fixed-stride slices of the payload in the
    fake codec); one output row per frame, preserving partitioning."""
    if codec != "fake":
        raise NotImplementedError("real frame extraction requires ffmpeg; use codec='fake'")

    out_schema = "media_id bigint, frame_idx int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append((mid, i, b[off : off + every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.filter(F.col("kind") == "video").mapInPandas(gen, schema=out_schema)
