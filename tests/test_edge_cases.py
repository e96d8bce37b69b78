"""Edge cases the format layer must survive: empty files, all-unplaced
reads, single-record files, oversized split sizes, records far larger
than one BGZF block (the reference's 'future-proofing' concern —
docs/motivation.md notes upstream rejects reads spanning blocks; this
engine must not), and sub-record block slicing."""

import pytest
from pyspark.sql import functions as F

from spark_bam_spark.bam.datasource import register
from spark_bam_spark.bam.records import BamRecord
from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES, synth_records, write_bam


@pytest.fixture(scope="module")
def spark_bam(spark):
    register(spark)
    return spark


def _rec(i, seq):
    return BamRecord(
        qname=f"edge{i:04d}",
        flag=0x1,
        ref_idx=0,
        pos=1000 * (i + 1),
        mapq=30,
        cigar=[(0, len(seq))],
        mate_ref_idx=0,
        mate_pos=1000 * (i + 1) + 150,
        tlen=300,
        seq=seq,
        qual=bytes([30] * len(seq)),
        tags={"RG": "rg0"},
    )


def test_empty_bam_scans_to_zero_rows(spark_bam, tmp_path):
    path = str(tmp_path / "empty.bam")
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, [])
    df = spark_bam.read.format("bam").load(path)
    assert df.count() == 0


def test_single_record(spark_bam, tmp_path):
    path = str(tmp_path / "one.bam")
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, [_rec(0, "ACGT" * 10)])
    rows = spark_bam.read.format("bam").load(path).collect()
    assert len(rows) == 1 and rows[0]["qname"] == "edge0000"


def test_split_size_larger_than_file(spark_bam, tmp_path):
    path = str(tmp_path / "big_split.bam")
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, synth_records(50, seed=3))
    df = spark_bam.read.format("bam").option("split_size", 1 << 30).load(path)
    assert df.count() == 50


def test_all_unplaced_reads(spark_bam, tmp_path):
    path = str(tmp_path / "unplaced.bam")
    recs = [
        BamRecord(
            qname=f"u{i}", flag=0x5, ref_idx=-1, pos=-1, mapq=0, cigar=[],
            mate_ref_idx=-1, mate_pos=-1, tlen=0, seq="ACGT", qual=b"\x1e" * 4,
        )
        for i in range(20)
    ]
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, recs)
    df = spark_bam.read.format("bam").load(path)
    assert df.count() == 20
    assert df.filter(F.col("rname").isNull()).count() == 20


def test_long_reads_spanning_many_blocks(spark_bam, tmp_path):
    """A 200 kbp read is >3 BGZF blocks long. The reference documents
    that upstream rejects these; our reader's lazily-extended window
    must decode them for ANY split size."""
    path = str(tmp_path / "long.bam")
    long_seq = ("ACGT" * 50_000)  # 200k bases
    recs = [_rec(i, long_seq if i % 3 == 0 else "ACGT" * 30) for i in range(12)]
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, recs, block_payload=0xFF00)
    for split in (16384, 65536, 1 << 20):
        df = spark_bam.read.format("bam").option("split_size", split).load(path)
        got = {r["qname"]: r["seq_len"] for r in df.select("qname", "seq_len").collect()}
        assert len(got) == 12, f"split={split}"
        assert all(got[f"edge{i:04d}"] == (200_000 if i % 3 == 0 else 120) for i in range(12))


def test_tiny_blocks_sub_record_slicing(spark_bam, tmp_path):
    """block_payload smaller than one record: every record spans several
    blocks; boundary search + ownership rule must still be exact."""
    path = str(tmp_path / "tiny_blocks.bam")
    recs = synth_records(80, seed=9)
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, recs, block_payload=96)
    for split in (512, 4096):
        df = spark_bam.read.format("bam").option("split_size", split).load(path)
        assert df.count() == 80, f"split={split}"
        names = sorted(r["qname"] for r in df.select("qname").collect())
        assert names == sorted(r.qname for r in recs)


def test_corrupt_block_crc_fails_loudly_both_readers(spark_bam, tmp_path):
    """A block whose payload inflates cleanly but fails the footer CRC32
    (bit rot) must fail the scan loudly in BOTH readers — never decode
    silently.  The stored CRC of a mid-file block is flipped, so ISIZE
    and the deflate stream stay valid and only the CRC check can
    object."""
    from spark_bam_spark.bam import bgzf, jvmreader
    from spark_bam_spark.bam.reader import read_bam

    path = str(tmp_path / "rot.bam")
    write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, synth_records(300, seed=5),
              block_payload=4096)
    with open(path, "rb") as f:
        data = bytearray(f.read())
    # find the third block's footer and flip its stored CRC
    off = 0
    for _ in range(3):
        bsize = bgzf.parse_block_header(data[off : off + bgzf.BGZF_HEADER_LEN])
        off += bsize
    data[off - 8] ^= 0xFF  # third block's CRC byte
    bad = str(tmp_path / "rot_flipped.bam")
    with open(bad, "wb") as f:
        f.write(bytes(data))
    readers = ["py"] + (["jvm"] if jvmreader.javac_path() else [])
    for reader in readers:
        with pytest.raises(Exception, match="CRC32"):
            read_bam(spark_bam, bad, split_size=1 << 30, reader=reader).count()


def test_corrupt_crc_permissive_salvage_parity(spark_bam, tmp_path):
    """Permissive mode over a CRC-only corruption (stored CRC flipped:
    the payload still inflates, ISIZE matches, only the new r11 check
    objects): both readers salvage the SAME record set — the records
    before the corrupt block — instead of crashing."""
    from spark_bam_spark.bam import bgzf, jvmreader

    path = str(tmp_path / "rot.bam")
    res = write_bam(path, CONTIG_NAMES, CONTIG_LENGTHS, synth_records(1200, seed=11),
                    block_payload=2048)
    blocks = sorted(b.start for b in res.blocks)
    victim = blocks[len(blocks) // 2]
    with open(path, "r+b") as f:
        f.seek(victim)
        head = f.read(bgzf.BGZF_HEADER_LEN)
        bsize = bgzf.parse_block_header(head)
        f.seek(victim + bsize - 8)
        crc_byte = f.read(1)
        f.seek(victim + bsize - 8)
        f.write(bytes([crc_byte[0] ^ 0xFF]))

    def rows(df):
        return sorted(map(tuple, df.select("qname", "flag", "pos").collect()))

    py = spark_bam.read.format("bam").option("split_size", 4096).option(
        "mode", "permissive").load(path)
    got_py = rows(py)
    assert 0 < len(got_py) < 1200
    if jvmreader.javac_path():
        jv = jvmreader.read_bam_jvm(spark_bam, path, split_size=4096, mode="permissive")
        assert rows(jv) == got_py
