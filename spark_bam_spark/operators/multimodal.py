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


def _ppm_decode(payload: bytes):
    """Pure-numpy decoder for binary PPM (netpbm P6) — a REAL image
    format that needs no external library, so the real-decode path is
    executable even where Pillow/ffmpeg are absent.  Returns an
    (H, W, 3) uint8 array."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens ('#' comments run to end-of-line), then ONE whitespace byte,
    # then the raw RGB plane
    tokens, i = [], 2
    while len(tokens) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace separating header from raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"P6 maxval {maxval} unsupported (expected 255)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=i)
    return raster.reshape(height, width, 3)


def _ppm_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image decode without any external dependency: P6 PPM →
    luma grayscale → nearest-neighbor resample to dim×dim → column-mean
    (identical output shape to the fake and Pillow codecs, so downstream
    plumbing is codec-agnostic)."""
    import numpy as np

    rgb = _ppm_decode(payload).astype(np.float32)
    gray = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]) / 255.0
    h, w = gray.shape
    ys = (np.arange(dim) * h) // dim
    xs = (np.arange(dim) * w) // dim
    resized = gray[np.ix_(ys, xs)]
    return resized.mean(axis=0).astype("float32").tolist()


def encode_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic P6 PPM test image: per-channel gradient patterns
    seeded by ``seed`` (real encoded bytes — what a crawler would have
    stored in the binary column)."""
    import numpy as np

    y, x = np.mgrid[0:height, 0:width]
    r = (x * 7 + seed) % 256
    g = (y * 13 + 3 * seed) % 256
    b = (x + y + 5 * seed) % 256
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return b"P6\n# synthetic\n%d %d\n255\n" % (width, height) + rgb.tobytes()


def synth_ppm_media(spark: SparkSession, sf_dir: str, width: int = 32, height: int = 24) -> DataFrame:
    """Media table whose payloads are REAL encoded images (P6 PPM),
    generated deterministically per doc_id inside an Arrow-batched map —
    the distributed shape of an ingest that re-encodes crawler bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    out_schema = (
        "media_id bigint, kind string, content binary, "
        "meta struct<format: string, width: int, height: int, duration_ms: int>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "content": [
                        encode_ppm(width, height, int(d)) for d in pdf["doc_id"]
                    ],
                    "meta": [
                        {"format": "ppm", "width": width, "height": height, "duration_ms": 0}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return docs.mapInPandas(gen, schema=out_schema)


def encode_wav(n_samples: int, seed: int, sample_rate: int = 8000) -> bytes:
    """Deterministic PCM WAV test clip: int16 mono sine whose frequency
    and phase derive from ``seed`` (real RIFF/WAVE bytes)."""
    import struct

    import numpy as np

    t = np.arange(n_samples, dtype=np.float64)
    freq = 110.0 + (seed % 32) * 55.0
    wave = np.sin(2 * np.pi * freq * t / sample_rate + (seed % 7))
    pcm = (wave * 32000).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _wav_decode(payload: bytes):
    """Pure-numpy decoder for PCM WAV (RIFF little-endian, 16-bit mono):
    walks the chunk list to 'fmt ' and 'data' — no audio library.
    Returns (samples float32 in [-1, 1], sample_rate)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(f"only 16-bit mono PCM supported, got {fmt}")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    return samples, sample_rate


def _wav_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio decode without any external dependency: PCM WAV →
    per-window RMS energy over ``dim`` equal windows (the classic cheap
    audio fingerprint; same output shape as the image codecs)."""
    import numpy as np

    samples, _ = _wav_decode(payload)
    n = len(samples)
    edges = (np.arange(dim + 1) * n) // dim
    return [
        float(np.sqrt(np.mean(np.square(samples[edges[k] : edges[k + 1]]))))
        if edges[k + 1] > edges[k]
        else 0.0
        for k in range(dim)
    ]


def synth_wav_media(spark: SparkSession, sf_dir: str, n_samples: int = 2048) -> DataFrame:
    """Media table whose payloads are REAL encoded audio clips (PCM WAV),
    generated deterministically per doc_id inside an Arrow-batched map."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    out_schema = (
        "media_id bigint, kind string, content binary, "
        "meta struct<format: string, width: int, height: int, duration_ms: int>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "content": [encode_wav(n_samples, int(d)) for d in pdf["doc_id"]],
                    "meta": [
                        {
                            "format": "wav",
                            "width": 0,
                            "height": 0,
                            "duration_ms": n_samples * 1000 // 8000,
                        }
                        for _ in range(len(pdf))
                    ],
                }
            )

    return docs.mapInPandas(gen, schema=out_schema)


def decode_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """content binary → fixed-dim feature vector via Arrow-batched
    mapInPandas (batch in, batch out; per-task codec init).

    ``codec="ppm"`` is a REAL decode with no external dependency (pure
    numpy over netpbm P6); ``codec="pil"`` uses a real Pillow decode when
    the library is importable (optional-dependency pattern, same as
    CRAM→pysam in bam/cram.py); anything else real raises
    NotImplementedError."""
    if codec == "ppm":
        decode = _ppm_features
    elif codec == "wav":
        decode = _wav_features
    elif codec == "pil":
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


def encode_y4m(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic YUV4MPEG2 (Y4M) clip: uncompressed 4:4:4 planar
    frames whose luma is a per-frame-shifted gradient seeded by ``seed``
    (real video container bytes, parseable without ffmpeg)."""
    import numpy as np

    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (width, height)
    y, x = np.mgrid[0:height, 0:width]
    out = [header]
    for f in range(n_frames):
        luma = ((x * 3 + y * 5 + f * 17 + seed) % 256).astype(np.uint8)
        u = np.full((height, width), (64 + f + seed) % 256, np.uint8)
        v = np.full((height, width), (192 - f + seed) % 256, np.uint8)
        out.append(b"FRAME\n" + luma.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(out)


def _y4m_decode(payload: bytes):
    """Pure-numpy decoder for YUV4MPEG2 with C444 planar frames.  Returns
    (frames, width, height) where frames is a list of (Y, U, V) uint8
    arrays of shape (H, W)."""
    import numpy as np

    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    params = {p[:1]: p[1:] for p in header[1:] if p}
    width, height = int(params[b"W"]), int(params[b"H"])
    if params.get(b"C", b"444") != b"444":
        raise ValueError("only C444 supported")
    plane = width * height
    frames, i = [], nl + 1
    while i < len(payload):
        fnl = payload.index(b"\n", i)
        if payload[i:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad frame marker")
        base = fnl + 1
        yuv = np.frombuffer(payload, np.uint8, count=3 * plane, offset=base)
        frames.append(tuple(yuv[k * plane : (k + 1) * plane].reshape(height, width) for k in range(3)))
        i = base + 3 * plane
    return frames, width, height


def synth_y4m_media(
    spark: SparkSession, sf_dir: str, width: int = 16, height: int = 12, n_frames: int = 12
) -> DataFrame:
    """Media table whose payloads are REAL uncompressed video clips
    (YUV4MPEG2), generated deterministically per doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    out_schema = (
        "media_id bigint, kind string, content binary, "
        "meta struct<format: string, width: int, height: int, duration_ms: int>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "content": [
                        encode_y4m(width, height, n_frames, int(d)) for d in pdf["doc_id"]
                    ],
                    "meta": [
                        {
                            "format": "y4m",
                            "width": width,
                            "height": height,
                            "duration_ms": n_frames * 40,
                        }
                        for _ in range(len(pdf))
                    ],
                }
            )

    return docs.mapInPandas(gen, schema=out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, codec: str = "fake", every_n_frames: int = 4) -> DataFrame:
    """video → sampled frames, one output row per kept frame, preserving
    partitioning (a narrow map — the 100 TB shape for frame extraction).

    ``codec="y4m"`` is a REAL decode with no external dependency: parse
    the YUV4MPEG2 stream, keep every ``every_n_frames``-th frame, emit
    the raw Y plane plus its mean luma.  ``codec="fake"`` slices the
    payload at a fixed byte stride (plumbing tests); compressed
    containers (mp4/mkv) would delegate to ffmpeg and stay stubbed."""
    if codec == "y4m":
        out_schema = "media_id bigint, frame_idx int, frame binary, mean_luma double"

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    frames, _, _ = _y4m_decode(bytes(content))
                    for i in range(0, len(frames), every_n_frames):
                        luma = frames[i][0]
                        rows.append((mid, i, luma.tobytes(), float(luma.mean())))
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "frame", "mean_luma"]
                )

        return df.filter(F.col("kind") == "video").mapInPandas(gen, schema=out_schema)

    if codec != "fake":
        raise NotImplementedError(
            "compressed video (mp4/mkv) requires ffmpeg; use codec='y4m' for real "
            "uncompressed decode or codec='fake' for plumbing"
        )

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
