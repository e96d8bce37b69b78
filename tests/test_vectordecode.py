"""Vectorized decoder parity: decode_batch must agree with the scalar
records.decode_record on every field of every record — the invariant
that lets the DataSource hot path use numpy/Arrow batch decode while the
writer/tests keep the simple scalar codec."""

from __future__ import annotations

import numpy as np
import pytest

from spark_bam_spark.bam import bgzf
from spark_bam_spark.bam.datasource import _ARROW_SCHEMA, READS_FIELDS
from spark_bam_spark.bam.header import parse_header
from spark_bam_spark.bam.records import BamRecord, decode_record, encode_record
from spark_bam_spark.bam.vectordecode import decode_batch, ranges_concat
from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES, make_fixture, write_bam

ALL_COLS = [n for n, _ in READS_FIELDS]


def _flat_and_starts(path, res):
    with open(path, "rb") as f:
        flat = b"".join(data for _, data in bgzf.block_stream(f))
    block_u = {}
    u = 0
    for b in res.blocks:
        block_u[b.start] = u
        u += b.uncompressed_size
    starts = np.array(
        [block_u[p.block_pos] + p.offset for p in res.record_positions], dtype=np.int64
    )
    bp = np.array([p.block_pos for p in res.record_positions], dtype=np.int64)
    bo = np.array([p.offset for p in res.record_positions], dtype=np.int32)
    return flat, starts, bp, bo


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vd") / "v.bam")
    res = make_fixture(path, n=300, block_payload=2048)
    with open(path, "rb") as f:
        hdr = parse_header(f)
    return path, res, hdr


def test_every_field_matches_scalar_decoder(fx):
    path, res, hdr = fx
    flat, starts, bp, bo = _flat_and_starts(path, res)
    rb = decode_batch(flat, starts, bp, bo, hdr.names, ALL_COLS, _ARROW_SCHEMA)
    assert rb.num_rows == len(starts)
    cols = {c: rb.column(i).to_pylist() for i, c in enumerate(ALL_COLS)}
    for i, s in enumerate(starts):
        rec, _ = decode_record(flat, int(s))
        exp_qual = bytes((q + 33) & 0xFF for q in rec.qual).decode("latin1")
        exp_rname = hdr.names[rec.ref_idx] if 0 <= rec.ref_idx < len(hdr.names) else None
        assert cols["qname"][i] == rec.qname
        assert cols["flag"][i] == rec.flag
        assert cols["ref_idx"][i] == rec.ref_idx
        assert cols["rname"][i] == exp_rname
        assert cols["pos"][i] == rec.pos
        assert cols["end_pos"][i] == rec.end_pos
        assert cols["mapq"][i] == rec.mapq
        assert cols["cigar"][i] == rec.cigar_str
        assert cols["n_cigar_ops"][i] == rec.n_cigar_ops
        assert cols["mate_ref_idx"][i] == rec.mate_ref_idx
        assert cols["mate_pos"][i] == rec.mate_pos
        assert cols["tlen"][i] == rec.tlen
        assert cols["seq"][i] == rec.seq
        assert cols["seq_len"][i] == rec.seq_len
        assert cols["qual"][i] == exp_qual
        assert dict(cols["tags"][i]) == rec.tags
        assert cols["block_pos"][i] == res.record_positions[i].block_pos
        assert cols["offset"][i] == res.record_positions[i].offset


def test_typed_tags_skip_and_stop(tmp_path):
    """Fixed-size typed tags, H hex strings and B arrays are skipped
    structurally (r11: the §4.2.2 CG work upgraded every scanner from
    stop-at-B to skip-B), Z tags surface wherever they sit, and the scan
    stops at an unknown type — matching the scalar decoder."""
    rec = BamRecord(
        qname="t1", flag=0x1, ref_idx=0, pos=100, mapq=30, cigar=[(0, 4)],
        mate_ref_idx=0, mate_pos=150, tlen=50, seq="ACGT", qual=bytes([30] * 4),
        tags={"RG": "rg0"},
    )
    raw = bytearray(encode_record(rec))
    import struct

    extra = (
        b"NMC\x05"                      # C (uint8) — skipped
        + b"ASs" + struct.pack("<h", -7)  # s (int16) — skipped
        + b"XZZ" + b"a:b:c\x00"           # Z with colons — surfaced
        + b"BAB" + b"c\x02\x00\x00\x00\x01\x02"  # B array — skipped
        + b"YZZ" + b"reachable\x00"       # Z after B — surfaced now
        + b"QQ?" + b"x"                   # unknown type '?' — scan stops
        + b"ZZZ" + b"never\x00"           # after unknown: unreachable
    )
    raw += extra
    struct.pack_into("<i", raw, 0, len(raw) - 4)
    rec2, _ = decode_record(bytes(raw), 0)
    buf = bytes(raw)
    rb = decode_batch(
        buf,
        np.array([0], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([0], dtype=np.int32),
        CONTIG_NAMES,
        ALL_COLS,
        _ARROW_SCHEMA,
    )
    got = dict(rb.column(ALL_COLS.index("tags"))[0].as_py())
    assert got == rec2.tags
    assert got == {"RG": "rg0", "XZ": "a:b:c", "YZ": "reachable"}


def test_empty_and_unplaced_records(tmp_path):
    recs = [
        BamRecord(qname="u1", flag=0x4, ref_idx=-1, pos=-1, mapq=0, cigar=[],
                  mate_ref_idx=-1, mate_pos=-1, tlen=0, seq="", qual=b"", tags={}),
        BamRecord(qname="m1", flag=0x1, ref_idx=1, pos=500, mapq=60, cigar=[(4, 2), (0, 3)],
                  mate_ref_idx=0, mate_pos=700, tlen=-20, seq="ACGTN", qual=bytes([0, 93, 40, 2, 11])),
    ]
    path = str(tmp_path / "two.bam")
    res = write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, recs, block_payload=64)
    with open(path, "rb") as f:
        hdr = parse_header(f)
    flat, starts, bp, bo = _flat_and_starts(path, res)
    rb = decode_batch(flat, starts, bp, bo, hdr.names, ALL_COLS, _ARROW_SCHEMA)
    rows = rb.to_pylist()
    assert rows[0]["rname"] is None and rows[0]["seq"] == "" and rows[0]["cigar"] == "*"
    assert rows[0]["end_pos"] == -1
    assert rows[1]["cigar"] == "2S3M" and rows[1]["end_pos"] == 503
    assert rows[1]["seq"] == "ACGTN" and len(rows[1]["qual"]) == 5


def test_ranges_concat_zero_lengths():
    idx = ranges_concat(np.array([5, 100, 7]), np.array([2, 0, 3]))
    assert idx.tolist() == [5, 6, 7, 8, 9]
    assert ranges_concat(np.array([], dtype=np.int64), np.array([], dtype=np.int64)).size == 0
    assert ranges_concat(np.array([3]), np.array([0])).size == 0


def test_column_subset_only_touches_requested(fx):
    path, res, hdr = fx
    flat, starts, bp, bo = _flat_and_starts(path, res)
    import pyarrow as pa

    sub = ["ref_idx", "pos", "flag"]
    schema = pa.schema([_ARROW_SCHEMA.field(c) for c in sub])
    rb = decode_batch(flat, starts, bp, bo, hdr.names, sub, schema)
    assert rb.schema.names == sub
    assert rb.num_rows == len(starts)
