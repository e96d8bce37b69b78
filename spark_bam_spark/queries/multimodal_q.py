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
