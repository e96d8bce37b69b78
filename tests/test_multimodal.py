"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fake
codec, stubs for real codecs."""

from __future__ import annotations

import pytest

from spark_bam_spark.operators import multimodal as mm


def test_synth_media_schema(spark, sf_small):
    df = mm.synth_media(spark, sf_small)
    assert df.schema["content"].dataType.simpleString() == "binary"
    assert df.schema["meta"].dataType.simpleString().startswith("struct<format:string")
    assert df.count() > 0


def test_decode_features_deterministic(spark, sf_small):
    df = mm.synth_media(spark, sf_small)
    feats = mm.decode_features(df)
    rows = {r.media_id: r.features for r in feats.collect()}
    rows2 = {r.media_id: r.features for r in mm.decode_features(df).collect()}
    assert rows == rows2
    assert all(len(v) == mm.FEATURE_DIM for v in rows.values())
    assert feats.count() == df.count()


def test_frame_sample_shapes(spark, sf_small):
    df = mm.synth_media(spark, sf_small)
    frames = mm.frame_sample(df, every_n_bytes=128)
    n_videos = df.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == n_videos
    first = frames.filter("frame_idx = 0").count()
    assert first == n_videos


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_codecs_are_stubbed(spark, sf_small):
    df = mm.synth_media(spark, sf_small)
    if not _has_pil():
        with pytest.raises(NotImplementedError):
            mm.decode_features(df, codec="pil")
    with pytest.raises(NotImplementedError):
        mm.decode_features(df, codec="torchaudio")
    with pytest.raises(NotImplementedError):
        mm.frame_sample(df, codec="ffmpeg")


# 2x2 24-bit BMP, hand-assembled (no imaging lib needed to build the
# fixture): pixels (0,0)=black (0,1)=white (1,0)=red (1,1)=blue.
_TINY_BMP = bytes.fromhex(
    "424d4600000000000000360000002800000002000000020000000100180000000000"
    "10000000130b0000130b00000000000000000000"
    "ff00000000ff0000"  # bottom row: blue, red (BGR) + 2-byte pad
    "000000ffffff0000"  # top row: black, white + pad
)


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_pil_codec_decodes_real_bmp(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "kind": ["image"], "content": [_TINY_BMP]})
    )
    rows = mm.decode_features(df, codec="pil").collect()
    assert len(rows) == 1
    feats = rows[0]["features"]
    assert len(feats) == mm.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in feats)


def test_ann_pipeline_deterministic_topk(spark, sf_small):
    from spark_bam_spark.queries import load_all

    reg = load_all()
    a = [tuple(r) for r in reg["multimodal_ann_pipeline"].fn(spark, sf_small).collect()]
    b = [tuple(r) for r in reg["multimodal_ann_pipeline"].fn(spark, sf_small).collect()]
    assert a == b and len(a) == 5
    assert all(-1.0 <= r[2] <= 1.0 for r in a)
