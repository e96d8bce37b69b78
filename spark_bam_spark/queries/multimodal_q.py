"""Multimodal-column queries (rows-only: binary payloads + fake codec are
not DuckDB-expressible; exact coverage in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register


@register("multimodal_decode_features", doc="binary media → feature vectors via Arrow-batched mapInPandas")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.synth_media(spark, sf_dir))
    return feats.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("avg_f0"),
    )


@register("multimodal_frame_sample", doc="video frame sampling: one row per fixed-stride frame")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators import multimodal as mm

    frames = mm.frame_sample(mm.synth_media(spark, sf_dir), every_n_bytes=128)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"), F.max("frame_idx").alias("max_idx"))


@register(
    "multimodal_ann_pipeline",
    doc="end-to-end: media binary → decoded features → cosine top-5 vs a query item",
)
def multimodal_ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data shape: decode binary payloads to vectors
    (Arrow-batched mapInPandas), then ANN against one query item —
    per-row zip_with/aggregate cosine, no explode, TakeOrderedAndProject.
    Deterministic because the fake codec is md5-seeded."""
    from spark_bam_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.synth_media(spark, sf_dir))
    q = feats.filter(F.col("media_id") == 0).select(F.col("features").alias("qv"))
    scored = (
        feats.filter(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "media_id",
            "kind",
            F.round(
                F.expr(
                    "aggregate(zip_with(features, qv, (x, y) -> cast(x as double) * cast(y as double)),"
                    " cast(0 as double), (a, v) -> a + v)"
                )
                / (
                    F.sqrt(F.expr("aggregate(transform(features, x -> cast(x as double) * x), cast(0 as double), (a, v) -> a + v)"))
                    * F.sqrt(F.expr("aggregate(transform(qv, y -> cast(y as double) * y), cast(0 as double), (a, v) -> a + v)"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), "media_id").limit(5)


@register(
    "multimodal_ppm_real_decode",
    doc="REAL image decode (pure-numpy netpbm P6) → features, no external lib",
)
def multimodal_ppm_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real-codec path, executable in any environment: payloads are
    genuine P6 PPM images (generated distributed, per media_id) and the
    decoder parses headers + raster with numpy alone — closing the gap
    where Pillow/ffmpeg delegation can never run in minimal containers.
    Per-image feature checksums make row content deterministic."""
    from spark_bam_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.synth_ppm_media(spark, sf_dir), codec="ppm")
    return feats.select(
        "media_id",
        F.round(F.expr("aggregate(features, cast(0 as double), (a, v) -> a + cast(v as double))"), 6).alias(
            "feature_sum"
        ),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


@register(
    "multimodal_wav_real_decode",
    doc="REAL audio decode (pure-numpy RIFF/PCM WAV) → RMS-window features",
)
def multimodal_wav_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio sibling of multimodal_ppm_real_decode: payloads are genuine
    PCM WAV clips and the decoder chunk-walks RIFF with numpy alone —
    per-window RMS energy features, no audio library required."""
    from spark_bam_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.synth_wav_media(spark, sf_dir), codec="wav")
    return feats.select(
        "media_id",
        F.round(
            F.expr("aggregate(features, cast(0 as double), (a, v) -> a + cast(v as double))"), 6
        ).alias("energy_sum"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("rms0"),
    )


@register(
    "multimodal_y4m_frame_sample",
    doc="REAL video frame sampling (pure-numpy YUV4MPEG2) → frame stats",
)
def multimodal_y4m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video sibling of the PPM/WAV real decodes: payloads are genuine
    uncompressed YUV4MPEG2 clips; the frame sampler parses the container
    with numpy alone, keeps every 4th frame, and reports per-clip frame
    counts and luma statistics."""
    from spark_bam_spark.operators import multimodal as mm

    frames = mm.frame_sample(mm.synth_y4m_media(spark, sf_dir), codec="y4m", every_n_frames=4)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames_kept"),
        F.max("frame_idx").alias("max_idx"),
        F.round(F.avg("mean_luma"), 6).alias("avg_luma"),
    )
