"""Checker truth-table tests — the reference's core QA idea: at every
uncompressed position of a fixture, the eager checker's verdict must
equal ground-truth membership in the .records sidecar
(eager/CheckerTest.scala:14-32; docs/command-line.md:320-336)."""

from __future__ import annotations

import pytest

from spark_bam_spark.bam import bgzf
from spark_bam_spark.bam.checker import (
    FLAG_NAMES,
    check_record_start,
    find_record_start,
    full_check,
    record_flags,
)
from spark_bam_spark.bam.header import parse_header
from spark_bam_spark.bam.records import decode_record
from spark_bam_spark.bam.writer import make_fixture


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bam") / "small.bam")
    res = make_fixture(path, n=300, block_payload=2048)
    with open(path, "rb") as f:
        hdr = parse_header(f)
    with open(path, "rb") as f:
        flat = b"".join(data for _, data in bgzf.block_stream(f))
    # ground-truth flat offsets of record starts
    ustarts = []
    block_u = {}
    u = 0
    for b in res.blocks:
        block_u[b.start] = u
        u += b.uncompressed_size
    for p in res.record_positions:
        ustarts.append(block_u[p.block_pos] + p.offset)
    return res, hdr, flat, ustarts


def test_all_true_starts_pass(fx):
    res, hdr, flat, ustarts = fx
    info = hdr.info()
    for u in ustarts:
        assert check_record_start(flat, u, info), f"true start rejected at {u}"


def test_positions_full_truth_table(fx):
    """Every uncompressed position in the first 20k bytes: verdict must
    equal ground truth (zero FPs, zero FNs — docs/benchmarks.md:30)."""
    res, hdr, flat, ustarts = fx
    info = hdr.info()
    truth = set(ustarts)
    first_rec = min(ustarts)
    fps, fns = [], []
    for u in range(first_rec, min(first_rec + 20000, len(flat))):
        call = check_record_start(flat, u, info)
        if call and u not in truth:
            fps.append(u)
        if not call and u in truth:
            fns.append(u)
    assert fns == [], f"false negatives: {fns[:5]}"
    assert fps == [], f"false positives: {fps[:5]}"


def test_find_record_start_from_each_block(fx):
    res, hdr, flat, ustarts = fx
    info = hdr.info()
    block_u = 0
    sorted_starts = sorted(ustarts)
    import bisect

    for b in res.blocks[1:6]:
        block_u += 0  # recompute below
    u = 0
    for b in res.blocks:
        found = find_record_start(flat, u, info)
        i = bisect.bisect_left(sorted_starts, u)
        expected = sorted_starts[i] if i < len(sorted_starts) else None
        assert found == expected, f"block@{b.start}: {found} != {expected}"
        u += b.uncompressed_size


def test_full_checker_flags_on_corruption(fx):
    res, hdr, flat, ustarts = fx
    info = hdr.info()
    u = ustarts[0]
    rec, consumed = decode_record(flat, u)
    # corrupt ref_idx to a huge value
    bad = bytearray(flat)
    bad[u + 4 : u + 8] = (10**6).to_bytes(4, "little", signed=True)
    flags = record_flags(bytes(bad), u, info)
    assert flags["too_large_read_idx"]
    assert set(flags) == set(FLAG_NAMES)
    got, reads_before = full_check(bytes(bad), u, info)
    assert reads_before == 0 and got["too_large_read_idx"]


def test_full_check_success_is_none(fx):
    res, hdr, flat, ustarts = fx
    info = hdr.info()
    got, reads_before = full_check(flat, ustarts[0], info)
    assert got is None and reads_before == 10


def _fake_record(
    *,
    ref_idx=0,
    pos=5000,
    l_name=3,
    name=b"ab\x00",
    mapq=30,
    n_cigar=1,
    flag=0x1,
    l_seq=4,
    mate_ref=0,
    mate_pos=5200,
    tlen=300,
    cigar_ops=None,
    seq_qual=None,
) -> bytes:
    """Hand-assembled presumptive record for adversarial positions."""
    import struct

    cigar = b"".join(struct.pack("<I", v) for v in (cigar_ops or [(l_seq << 4) | 0]))
    body = (
        struct.pack("<iiBBHHHiiii", ref_idx, pos, l_name, mapq, 0, n_cigar, flag, l_seq, mate_ref, mate_pos, tlen)
        + name
        + cigar
        + (seq_qual if seq_qual is not None else b"\x11" * ((l_seq + 1) // 2) + b"\x1e" * l_seq)
    )
    return struct.pack("<i", len(body)) + body


class TestUpstreamFalsePositiveClasses:
    """Each documented check the upstream lacks (docs/motivation.md:36-52)
    produces a position the upstream checker accepts and the eager checker
    rejects — the reference's reason to exist, reproduced synthetically.
    The fake record's implied end lands at the buffer end, so successor
    checks truncate (the upstream MAX_BYTES_READ behavior)."""

    def _check(self, buf, hdr):
        from spark_bam_spark.bam.checker import check_record_start, check_record_start_upstream

        return check_record_start(buf, 0, hdr), check_record_start_upstream(buf, 0, hdr)

    def test_locus_too_large(self, fx):
        _, hdr, _, _ = fx
        buf = _fake_record(pos=hdr.lengths[0] + 10_000)
        eager, upstream = self._check(buf, hdr.info())
        assert (eager, upstream) == (False, True)

    def test_invalid_read_name_chars(self, fx):
        _, hdr, _, _ = fx
        buf = _fake_record(name=b"a b\x00", l_name=4)
        eager, upstream = self._check(buf, hdr.info())
        assert (eager, upstream) == (False, True)

    def test_empty_read_name(self, fx):
        _, hdr, _, _ = fx
        buf = _fake_record(name=b"\x00", l_name=1)
        eager, upstream = self._check(buf, hdr.info())
        assert (eager, upstream) == (False, True)

    def test_mapped_with_empty_cigar_and_seq(self, fx):
        _, hdr, _, _ = fx
        buf = _fake_record(n_cigar=0, l_seq=0, cigar_ops=[], seq_qual=b"")
        eager, upstream = self._check(buf, hdr.info())
        assert (eager, upstream) == (False, True)

    def test_valid_record_accepted_by_both(self, fx):
        _, hdr, _, _ = fx
        buf = _fake_record()
        eager, upstream = self._check(buf, hdr.info())
        assert (eager, upstream) == (True, True)
