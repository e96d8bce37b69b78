"""Differential gate: the INDEPENDENT checker derivation
(tools/gen_checker_truth.py — fresh implementation, generator geometry,
stdlib gzip) must keep matching the committed goldens that the driver's
oracle SQL reads for bam_check_three_way / bam_full_check /
bam_full_check_cdf.  The engine side of the same contract is the
driver's hash check (engine sweep vs these parquets), so engine ≡
independent-implementation ≡ committed bytes stays a closed triangle.

The full-fixture sweep is pure Python (~1.5 min), so it is env-gated
like the other sweeps; the always-on test covers a small fixture whose
sweep takes seconds and still exercises every code path (truth hits,
eager/upstream disagreements, multi-flag positions, window edges).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

_SWEEP = os.environ.get("SPARK_GRAFT_CHECKER_TRUTH_SWEEP") == "1"


def _engine_sweep(n: int, block_payload: int, seed: int):
    """The production path (numpy prescreen + checker.py confirm over
    the same 4-block windows), driven directly — no Spark session."""
    import tempfile
    from collections import Counter

    from spark_bam_spark.bam.header import parse_header
    from spark_bam_spark.bam.vectorcheck import full_flags, sweep_calls
    from spark_bam_spark.bam.writer import make_fixture

    import gen_checker_truth as gct

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "qa.bam")
        res = make_fixture(path, n=n, block_payload=block_payload, seed=seed)
        with open(path, "rb") as f:
            info = parse_header(f).info()
        import gzip

        raw = open(path, "rb").read()
    payloads = [
        gzip.decompress(raw[b.start : b.start + b.compressed_size]) for b in res.blocks
    ]
    truth = {(p.block_pos, p.offset) for p in res.record_positions}
    three_way: Counter = Counter()
    flags_hist: Counter = Counter()
    group_flags: dict[int, Counter] = {}
    close_set: set[tuple] = set()
    fp_set: set[tuple] = set()
    for i, b in enumerate(res.blocks):
        window = b"".join(payloads[i : i + gct.LOOKAHEAD_BLOCKS])
        count = b.uncompressed_size
        eager, upstream = sweep_calls(window, count, info)
        flags = full_flags(window, count, info)
        for o in range(count):
            t = (b.start, o) in truth
            three_way[(bool(eager[o]), bool(upstream[o]), t)] += 1
            fl = [k for k in gct.FLAG_NAMES if flags[k][o]]
            if fl:
                flags_hist[len(fl)] += 1
                group_flags.setdefault(len(fl), Counter()).update(fl)
                if len(fl) <= 2:
                    close_set.add((b.start, o, len(fl)))
            if upstream[o] and not t:
                fp_set.add((b.start, o))
    return three_way, flags_hist, group_flags, close_set, fp_set


@pytest.mark.parametrize(
    ("n", "bp", "seed"),
    [(300, 2048, 7)] + ([(2500, 4096, 42)] if _SWEEP else []),
)
def test_independent_derivation_matches_engine_sweep(n, bp, seed):
    import gen_checker_truth as gct

    ind = gct.derive(n=n, block_payload=bp, seed=seed)
    eng = _engine_sweep(n=n, block_payload=bp, seed=seed)
    assert ind["three_way"] == eng[0], "three-way confusion diverged"
    assert ind["flags_hist"] == eng[1], "flags histogram diverged"
    assert ind["group_flags"] == eng[2], "per-group flag counts diverged"
    # close-call / FP position sets vs the vectorized engine sweep
    assert {(r[0], r[1], r[2]) for r in ind["close_rows"]} == eng[3], "close-call set diverged"
    assert {(r[0], r[1]) for r in ind["fp_rows"]} == eng[4], "upstream-FP set diverged"
    # non-vacuity: the fixture must exercise disagreements and real flags
    assert ind["fp_rows"], "no upstream FPs swept"
    assert len(ind["flags_hist"]) >= 3, "flags histogram degenerate"
    assert ind["close_rows"], "no close calls swept"


@pytest.mark.skipif(not _SWEEP, reason="full-fixture sweep env-gated (SPARK_GRAFT_CHECKER_TRUTH_SWEEP=1)")
def test_committed_goldens_match_independent_derivation():
    import gen_checker_truth as gct

    assert gct.main() == 0  # --check mode compares all five parquets
    # (three_way, full_check, cdf, close_calls, fp_metadata)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
