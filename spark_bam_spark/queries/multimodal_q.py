"""Multimodal-column queries.

Oracle strategy (they were rows-only through r5):

- The fake-codec trio is fully DERIVABLE in SQL: the 'decode' is
  md5(payload) with the digest's 16 bytes cycled into the feature
  vector, and the payload is the document text's utf-8 bytes — so
  DuckDB recomputes features straight from ``documents.text``.
- The real-codec decodes (PPM/WAV/Y4M) depend only on doc_id; their
  expected outputs are committed parquet keyed by media_id at the
  superset sf0.1 id range, and the oracle JOINs them against the
  sf-dir's documents table.  Since r8 these sidecars are DERIVATION
  grade, not golden pins: tools/gen_media_truth.py recomputes every
  expected value from the synthesis formulas alone (no import of
  operators/multimodal.py, no container bytes), so the committed
  values independently validate the whole encode→decode round trip.
  Exact value-level coverage stays in tests/test_multimodal.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register

_FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "tests", "fixtures"
).replace(os.sep, "/")
_G_PPM_PQ = f"{_FIXTURES_DIR}/multimodal_golden_ppm.parquet"
_G_WAV_PQ = f"{_FIXTURES_DIR}/multimodal_golden_wav.parquet"
_G_Y4M_PQ = f"{_FIXTURES_DIR}/multimodal_golden_y4m.parquet"

# the fake codec's feature i = md5-digest byte (i mod 16) scaled to [0,1]
# and narrowed to float32 (the features column is array<float>)
_F0_SQL = "CAST(CAST(('0x' || substr(md5(text), 1, 2))::INT / 255.0 AS FLOAT) AS DOUBLE)"


def _golden_filter(spark: SparkSession, media: DataFrame, golden_pq: str) -> DataFrame:
    """Restrict synthesized media to the ids present in the committed
    golden parquet.  The goldens were dumped at the superset sf0.1 id
    range; the oracle JOINs the golden against the sf-dir's documents, so
    its result is the intersection — without this semi-join, any driver
    run at sf > 0.1 would emit Spark rows for doc_ids absent from the
    golden and false-red the hash compare.  The golden id list is tiny
    (thousands of bigints) and broadcast; the filter runs BEFORE decode
    so out-of-range payloads are never decoded."""
    ids = spark.read.parquet(golden_pq).select("media_id")
    return media.join(F.broadcast(ids), "media_id", "semi")
_KIND_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "multimodal_decode_features",
    doc="binary media → feature vectors via Arrow-batched mapInPandas",
    oracle=f"""
    SELECT {_KIND_SQL} AS kind,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST({_F0_SQL} AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_f0
    FROM documents GROUP BY 1
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.synth_media(spark, sf_dir))
    # DECIMAL accumulation, not AVG(double): a double mean is an
    # order-dependent summation (Spark partial agg vs DuckDB single
    # pass), so a value near a 0.5e-6 rounding boundary could flip the
    # 6th decimal between engines.  Exact decimal sum / count is
    # order-independent; the single double division is deterministic.
    f0 = F.element_at("features", 1).cast("double").cast("decimal(28,12)")
    return feats.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.round(F.sum(f0).cast("double") / F.count("*"), 6).alias("avg_f0"),
    )


@register(
    "multimodal_frame_sample",
    doc="video frame sampling: one row per fixed-stride frame",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(ceil(octet_length(encode(text)) / 128.0) AS BIGINT) AS n_frames,
           CAST(ceil(octet_length(encode(text)) / 128.0) - 1 AS INT) AS max_idx
    FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators import multimodal as mm

    frames = mm.frame_sample(mm.synth_media(spark, sf_dir), every_n_bytes=128)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"), F.max("frame_idx").alias("max_idx"))


@register(
    "multimodal_ann_pipeline",
    doc="end-to-end: media binary → decoded features → cosine top-5 vs a query item",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, {_KIND_SQL} AS kind,
             list_transform(generate_series(1, 16),
               i -> CAST(CAST(('0x' || substr(md5(text), 2*i - 1, 2))::INT / 255.0 AS FLOAT) AS DOUBLE)) AS v
      FROM documents
    ),
    q AS (SELECT v AS qv FROM f WHERE doc_id = 0)
    SELECT doc_id AS media_id, kind,
           ROUND(list_aggregate(list_transform(generate_series(1, 16), i -> f.v[i] * q.qv[i]), 'sum')
                 / (sqrt(list_aggregate(list_transform(f.v, x -> x * x), 'sum'))
                    * sqrt(list_aggregate(list_transform(q.qv, y -> y * y), 'sum'))), 6) AS cosine
    FROM f, q WHERE doc_id != 0
    ORDER BY cosine DESC, media_id LIMIT 5
    """,
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
    oracle=f"""
    SELECT g.media_id, g.feature_sum, g.f0
    FROM read_parquet('{_G_PPM_PQ}') g JOIN documents d ON d.doc_id = g.media_id
    """,
    oracle_kind="derived",
)
def multimodal_ppm_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real-codec path, executable in any environment: payloads are
    genuine P6 PPM images (generated distributed, per media_id) and the
    decoder parses headers + raster with numpy alone — closing the gap
    where Pillow/ffmpeg delegation can never run in minimal containers.
    Per-image feature checksums make row content deterministic."""
    from spark_bam_spark.operators import multimodal as mm

    media = _golden_filter(spark, mm.synth_ppm_media(spark, sf_dir), _G_PPM_PQ)
    feats = mm.decode_features(media, codec="ppm")
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
    oracle=f"""
    SELECT g.media_id, g.energy_sum, g.rms0
    FROM read_parquet('{_G_WAV_PQ}') g JOIN documents d ON d.doc_id = g.media_id
    """,
    oracle_kind="derived",
)
def multimodal_wav_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio sibling of multimodal_ppm_real_decode: payloads are genuine
    PCM WAV clips and the decoder chunk-walks RIFF with numpy alone —
    per-window RMS energy features, no audio library required."""
    from spark_bam_spark.operators import multimodal as mm

    media = _golden_filter(spark, mm.synth_wav_media(spark, sf_dir), _G_WAV_PQ)
    feats = mm.decode_features(media, codec="wav")
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
    oracle=f"""
    SELECT g.media_id, g.n_frames_kept, g.max_idx, g.avg_luma
    FROM read_parquet('{_G_Y4M_PQ}') g JOIN documents d ON d.doc_id = g.media_id
    """,
    oracle_kind="derived",
)
def multimodal_y4m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video sibling of the PPM/WAV real decodes: payloads are genuine
    uncompressed YUV4MPEG2 clips; the frame sampler parses the container
    with numpy alone, keeps every 4th frame, and reports per-clip frame
    counts and luma statistics."""
    from spark_bam_spark.operators import multimodal as mm

    media = _golden_filter(spark, mm.synth_y4m_media(spark, sf_dir), _G_Y4M_PQ)
    frames = mm.frame_sample(media, codec="y4m", every_n_frames=4)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames_kept"),
        F.max("frame_idx").alias("max_idx"),
        F.round(F.avg("mean_luma"), 6).alias("avg_luma"),
    )
