"""Differential gate for the multimodal expected-value sidecars: the
INDEPENDENT derivation (tools/gen_media_truth.py — synthesis formulas
only, no import of operators/multimodal.py, no container bytes) must keep
matching both the committed parquets the driver's oracle SQL reads AND
the engine's own encode→decode path.  With the driver hashing engine
output against the committed bytes, engine ≡ independent derivation ≡
committed bytes stays a closed triangle (the gen_checker_truth.py
pattern applied to media — this is what retired the last three
golden-grade oracles in r8).

The always-on test decodes a small id set through the real engine
codecs; the full 5000-id committed-file sweep is seconds of pure
numpy/pyarrow and runs unconditionally.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SAMPLE_IDS = [0, 1, 2, 7, 31, 32, 100, 4999]


def test_independent_derivation_matches_engine_codecs():
    """Engine encode→decode→feature per id ≡ formula-side derivation.
    Exercises header parsing, raster offsets, RIFF chunk walking and
    Y4M plane geometry against values that never saw the codec."""
    import numpy as np

    import gen_media_truth as gmt
    from spark_bam_spark.operators.multimodal import (
        _ppm_features,
        _wav_features,
        _y4m_decode,
        encode_ppm,
        encode_wav,
        encode_y4m,
    )

    for mid in SAMPLE_IDS:
        eng_ppm = np.asarray(_ppm_features(encode_ppm(32, 24, mid)), dtype=np.float32)
        assert np.array_equal(eng_ppm, gmt.ppm_features(mid)), f"ppm features diverged at {mid}"

        eng_wav = np.asarray(_wav_features(encode_wav(2048, mid)), dtype=np.float32)
        assert np.array_equal(eng_wav, gmt.wav_features(mid)), f"wav features diverged at {mid}"

        frames, _, _ = _y4m_decode(encode_y4m(16, 12, 12, mid))
        kept = list(range(0, len(frames), 4))
        acc = 0.0
        for i in kept:
            acc += float(frames[i][0].mean())
        eng_y4m = (len(kept), max(kept), gmt._round6(acc / len(kept)))
        assert eng_y4m == gmt.y4m_frame_stats(mid), f"y4m stats diverged at {mid}"


def test_committed_sidecars_match_independent_derivation():
    import gen_media_truth as gmt

    # --check mode re-derives all 5000 ids for the three parquets
    # (ppm feature_sum/f0, wav energy_sum/rms0, y4m frame stats) and
    # fails on any field difference
    assert gmt.main([]) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
