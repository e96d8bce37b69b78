"""The r10 Structured Streaming BAM source (bamjvm.BamMicroBatchStream):
micro-batches ingest the .bam files that appeared since the last batch,
planned through the same splitter/pushdown/reader as the batch scan,
with offsets checkpointed as the seen-file set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_bam_spark.bam import jvmreader
from spark_bam_spark.bam.writer import make_fixture

_HAS_JDK = jvmreader.javac_path() is not None

needs_jdk = pytest.mark.skipif(not _HAS_JDK, reason="no JDK compiler on this machine")


def _drain(spark, land: str, ckpt: str, out: str, **opts) -> None:
    q = (
        jvmreader.read_bam_stream(spark, land, **opts)
        .select("qname", "flag", "rname", "pos")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@needs_jdk
def test_stream_drains_existing_files_then_only_new_ones(spark, tmp_path):
    """First availableNow drain ingests every file already present;
    a second drain with the SAME checkpoint ingests ONLY the file that
    landed in between (the seen-file offset contract)."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    make_fixture(os.path.join(land, "a.bam"), n=500, block_payload=4096, seed=1)
    make_fixture(os.path.join(land, "b.bam"), n=300, block_payload=4096, seed=2)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _drain(spark, land, ckpt, out, split_size=16384)
    assert spark.read.parquet(out).count() == 800
    make_fixture(os.path.join(land, "c.bam"), n=200, block_payload=4096, seed=3)
    _drain(spark, land, ckpt, out, split_size=16384)
    assert spark.read.parquet(out).count() == 1000  # +200, not +1000


@needs_jdk
def test_stream_rows_match_batch_scan(spark, tmp_path):
    """A drained stream is row-identical to a batch read of the same
    directory (same planner, same decoder)."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    make_fixture(os.path.join(land, "a.bam"), n=400, block_payload=2048, seed=7)
    make_fixture(os.path.join(land, "b.bam"), n=250, block_payload=4096, seed=8)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _drain(spark, land, ckpt, out, split_size=8192)
    got = sorted(
        map(tuple, spark.read.parquet(out).select("qname", "flag", "rname", "pos").collect())
    )
    from spark_bam_spark.bam.reader import read_bam

    want = sorted(
        map(tuple, read_bam(spark, land).select("qname", "flag", "rname", "pos").collect())
    )
    assert got == want


@needs_jdk
def test_stream_ingest_query_matches_truth(spark):
    from spark_bam_spark.queries import load_all

    rows = load_all()["bam_stream_ingest"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_reads"] for r in rows) == 5000  # 2 copies x 2500


@needs_jdk
def test_stream_ignores_inprogress_and_sidecar_files(spark, tmp_path):
    """Only *.bam files are ingested: writer temp files and sidecars in
    the landing dir are invisible to the stream."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    make_fixture(os.path.join(land, "a.bam"), n=100, block_payload=4096, seed=4)
    # decoys: an in-progress writer temp and the generated sidecars
    with open(os.path.join(land, ".part-00001-7.bam.inprogress"), "wb") as f:
        f.write(b"torn")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _drain(spark, land, ckpt, out)
    assert spark.read.parquet(out).count() == 100
