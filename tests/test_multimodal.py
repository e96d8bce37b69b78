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


# -- real decode: pure-numpy PPM codec (no external library) -----------------


def test_ppm_decode_roundtrip_exact():
    import numpy as np

    from spark_bam_spark.operators.multimodal import _ppm_decode, encode_ppm

    payload = encode_ppm(8, 6, seed=42)
    rgb = _ppm_decode(payload)
    assert rgb.shape == (6, 8, 3)
    # pixel values reconstruct the generator formulas exactly
    y, x = np.mgrid[0:6, 0:8]
    assert (rgb[:, :, 0] == (x * 7 + 42) % 256).all()
    assert (rgb[:, :, 1] == (y * 13 + 126) % 256).all()
    assert (rgb[:, :, 2] == (x + y + 210) % 256).all()


def test_ppm_decode_handles_comments_and_rejects_bad_magic():
    import numpy as np
    import pytest as _pytest

    from spark_bam_spark.operators.multimodal import _ppm_decode

    raw = bytes(range(12))  # 2x2 RGB
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + raw
    assert (_ppm_decode(payload).ravel() == np.frombuffer(raw, np.uint8)).all()
    with _pytest.raises(ValueError):
        _ppm_decode(b"P5\n2 2\n255\n" + raw)


def test_real_ppm_decode_runs_distributed(spark, sf_small):
    from spark_bam_spark.operators.multimodal import (
        FEATURE_DIM,
        _ppm_features,
        decode_features,
        encode_ppm,
        synth_ppm_media,
    )

    media = synth_ppm_media(spark, sf_small)
    feats = decode_features(media, codec="ppm")
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) > 0
    for r in rows.values():
        assert len(r) == FEATURE_DIM
    # the distributed decode equals a local single-image reference decode
    for mid in sorted(rows)[:3]:
        want = _ppm_features(encode_ppm(32, 24, int(mid)))
        assert rows[mid] == want


def test_pil_agrees_with_numpy_ppm_codec_when_available(spark):
    # Pillow reads PPM too — where it exists, the two real codecs must
    # agree on the same payload (grayscale rounding aside)
    pytest.importorskip("PIL")
    import numpy as np

    from spark_bam_spark.operators.multimodal import _pil_features, _ppm_features, encode_ppm

    payload = encode_ppm(32, 24, seed=7)
    a = np.array(_ppm_features(payload))
    b = np.array(_pil_features(payload))
    assert np.abs(a - b).max() < 0.02  # PIL L-mode rounds luma to uint8


# -- real decode: pure-numpy WAV codec (no external library) -----------------


def test_wav_decode_roundtrip_exact():
    import numpy as np

    from spark_bam_spark.operators.multimodal import _wav_decode, encode_wav

    payload = encode_wav(256, seed=5)
    samples, sr = _wav_decode(payload)
    assert sr == 8000 and len(samples) == 256
    t = np.arange(256, dtype=np.float64)
    freq = 110.0 + (5 % 32) * 55.0
    want = (np.sin(2 * np.pi * freq * t / 8000 + 5) * 32000).astype("<i2")
    assert (samples == want.astype(np.float32) / 32768.0).all()


def test_wav_decode_skips_extra_chunks_and_rejects_nonpcm():
    import struct

    import pytest as _pytest

    from spark_bam_spark.operators.multimodal import _wav_decode, encode_wav

    base = encode_wav(16, seed=1)
    # splice a LIST chunk between fmt and data — decoders must chunk-walk
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    samples, _ = _wav_decode(spliced)
    assert len(samples) == 16
    with _pytest.raises(ValueError):
        _wav_decode(b"RIFF\x00\x00\x00\x00AVI " + base[12:])


def test_real_wav_decode_runs_distributed(spark, sf_small):
    from spark_bam_spark.operators.multimodal import (
        FEATURE_DIM,
        _wav_features,
        decode_features,
        encode_wav,
        synth_wav_media,
    )

    feats = decode_features(synth_wav_media(spark, sf_small), codec="wav")
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) > 0
    for r in rows.values():
        assert len(r) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r)  # RMS of [-1,1] samples
    for mid in sorted(rows)[:3]:
        want = _wav_features(encode_wav(2048, int(mid)))
        assert [round(v, 6) for v in rows[mid]] == [round(v, 6) for v in want]


# -- real decode: pure-numpy Y4M video codec (no external library) -----------


def test_y4m_decode_roundtrip_exact():
    import numpy as np

    from spark_bam_spark.operators.multimodal import _y4m_decode, encode_y4m

    payload = encode_y4m(8, 6, n_frames=3, seed=9)
    frames, w, h = _y4m_decode(payload)
    assert (w, h, len(frames)) == (8, 6, 3)
    y, x = np.mgrid[0:6, 0:8]
    for f in range(3):
        assert (frames[f][0] == ((x * 3 + y * 5 + f * 17 + 9) % 256)).all()
        assert (frames[f][1] == (64 + f + 9) % 256).all()
        assert (frames[f][2] == (192 - f + 9) % 256).all()


def test_y4m_decode_rejects_bad_magic_and_subsampling():
    import pytest as _pytest

    from spark_bam_spark.operators.multimodal import _y4m_decode, encode_y4m

    with _pytest.raises(ValueError):
        _y4m_decode(b"AVI1 W8 H6\n")
    bad = encode_y4m(4, 4, 1, 0).replace(b"C444", b"C420")
    with _pytest.raises(ValueError):
        _y4m_decode(bad)


def test_real_y4m_frame_sample_runs_distributed(spark, sf_small):
    import numpy as np

    from spark_bam_spark.operators.multimodal import (
        _y4m_decode,
        encode_y4m,
        frame_sample,
        synth_y4m_media,
    )

    media = synth_y4m_media(spark, sf_small)
    frames = frame_sample(media, codec="y4m", every_n_frames=4)
    rows = frames.collect()
    assert len(rows) > 0
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    sample = sorted(by_media)[:2]
    for mid in sample:
        got = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == [0, 4, 8]  # every 4th of 12
        ref_frames, w, h = _y4m_decode(encode_y4m(16, 12, 12, int(mid)))
        for r in got:
            ref_y = ref_frames[r["frame_idx"]][0]
            assert bytes(r["frame"]) == ref_y.tobytes()
            assert abs(r["mean_luma"] - float(ref_y.mean())) < 1e-9
    # frame payloads are raw Y planes of the declared geometry
    assert all(len(bytes(r["frame"])) == 16 * 12 for r in rows)


# -- property-based codec invariants (hypothesis) ----------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 10_000))
def test_ppm_roundtrip_property(w, h, seed):
    from spark_bam_spark.operators.multimodal import _ppm_decode, _ppm_features, encode_ppm

    payload = encode_ppm(w, h, seed)
    rgb = _ppm_decode(payload)
    assert rgb.shape == (h, w, 3)
    feats = _ppm_features(payload)
    assert len(feats) == 16 and all(0.0 <= v <= 1.0 for v in feats)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 4096), seed=st.integers(0, 10_000))
def test_wav_roundtrip_property(n, seed):
    from spark_bam_spark.operators.multimodal import _wav_decode, _wav_features, encode_wav

    payload = encode_wav(n, seed)
    samples, sr = _wav_decode(payload)
    assert sr == 8000 and len(samples) == n
    assert all(-1.0 <= s <= 1.0 for s in samples[:64])
    feats = _wav_features(payload)
    assert len(feats) == 16 and all(0.0 <= v <= 1.0 for v in feats)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    nf=st.integers(1, 8),
    seed=st.integers(0, 10_000),
)
def test_y4m_roundtrip_property(w, h, nf, seed):
    from spark_bam_spark.operators.multimodal import _y4m_decode, encode_y4m

    payload = encode_y4m(w, h, nf, seed)
    frames, rw, rh = _y4m_decode(payload)
    assert (rw, rh, len(frames)) == (w, h, nf)
    for y, u, v in frames:
        assert y.shape == (h, w) and u.shape == (h, w) and v.shape == (h, w)
