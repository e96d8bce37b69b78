"""SAM text source (S2): declarative parse parity with the BAM scan.

The same synthetic records are written as .bam (binary, block-unaligned)
and .sam (text); loading both must yield identical rows on every shared
column — the engine's analogue of the reference's LoadSAMTest
(load/src/test/.../LoadSAMTest.scala)."""

import os

import pytest
from pyspark.sql import functions as F

from spark_bam_spark.bam.sam import load_reads, load_sam, write_sam
from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES, synth_records, write_bam

N = 400


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("sam")
    bam = str(d / "t.bam")
    sam = str(d / "t.sam")
    recs = synth_records(N, seed=7)
    write_bam(bam, CONTIG_NAMES, CONTIG_LENGTHS, recs, block_payload=2048)
    write_sam(sam, CONTIG_NAMES, CONTIG_LENGTHS, recs)
    return bam, sam, recs


COMMON = [
    "qname", "flag", "ref_idx", "rname", "pos", "end_pos", "mapq",
    "cigar", "n_cigar_ops", "mate_ref_idx", "mate_pos", "tlen",
    "seq", "seq_len", "qual", "tags",
]


def _rows(df):
    out = []
    for r in df.select(*COMMON).orderBy("qname").collect():
        d = r.asDict()
        d["tags"] = tuple(sorted((d["tags"] or {}).items()))
        out.append(tuple(d[c] for c in COMMON))
    return out


def test_sam_equals_bam(spark, paths):
    bam, sam, recs = paths
    bam_df = load_reads(spark, bam, split_size=8192)
    sam_df = load_sam(spark, sam)
    assert sam_df.count() == N
    assert _rows(sam_df) == _rows(bam_df)


def test_end_pos_matches_model(spark, paths):
    _, sam, recs = paths
    got = {
        r["qname"]: r["end_pos"]
        for r in load_sam(spark, sam).select("qname", "end_pos").collect()
    }
    for rec in recs:
        assert got[rec.qname] == rec.end_pos, rec.qname


def test_parse_is_udf_free(spark, paths):
    _, sam, _ = paths
    plan = load_sam(spark, sam)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_load_reads_dispatch_rejects_unknown(spark):
    with pytest.raises(NotImplementedError):
        load_reads(spark, "/tmp/nope.cram")
    with pytest.raises(ValueError):
        load_reads(spark, "/tmp/nope.vcf")
