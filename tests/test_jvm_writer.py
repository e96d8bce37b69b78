"""The r10 JVM DSv2 BAM writer (bamjvm/BamWriteSupport.java) and the
write-path dispatch (``bam/reader.py::write_bam_df``,
``SPARK_GRAFT_BAM_WRITER=py|jvm``).

The two writers are differential twins: for the same options they must
emit byte-identical part-BAMs (same header bytes, same record encoding,
same exact block_payload slicing, deflate level 6 — java.util.zip and
zlib share the deflate implementation).  The JVM sink additionally
streams with O(block) memory and renames into place at commit
(task-retry safe), neither of which changes bytes.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from spark_bam_spark.bam import bgzf, jvmreader
from spark_bam_spark.bam.reader import read_bam, write_bam_df, writer_choice
from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES

_HAS_JDK = jvmreader.javac_path() is not None
_CONTIGS = ",".join(f"{n}:{ln}" for n, ln in zip(CONTIG_NAMES, CONTIG_LENGTHS))

needs_jdk = pytest.mark.skipif(not _HAS_JDK, reason="no JDK compiler on this machine")


@pytest.fixture(scope="module")
def fixture_path() -> str:
    from spark_bam_spark.queries.bam_qa import _fixture_path

    return _fixture_path()


def _uncompressed(path: str) -> bytes:
    out = bytearray()
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        bsize = bgzf.parse_block_header(data[off : off + bgzf.BGZF_HEADER_LEN])
        if bsize is None:
            break
        out += bgzf.decompress_block(data, off, bsize)
        off += bsize
    return bytes(out)


# --------------------------------------------------------------- dispatch


def test_writer_choice_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BAM_WRITER", "py")
    assert writer_choice() == "py"
    monkeypatch.setenv("SPARK_GRAFT_BAM_WRITER", "jvm")
    assert writer_choice() == "jvm"
    monkeypatch.delenv("SPARK_GRAFT_BAM_WRITER")
    assert writer_choice() == ("jvm" if _HAS_JDK else "py")


def test_write_bam_df_rejects_bad_writer(spark, tmp_path):
    df = spark.range(1).select(F.lit("q").alias("qname"))
    with pytest.raises(ValueError, match="writer must be"):
        write_bam_df(df, str(tmp_path / "x"), writer="scala")


def test_env_py_forces_python_writer(spark, fixture_path, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BAM_WRITER", "py")
    src = read_bam(spark, fixture_path).limit(50)
    impl = write_bam_df(src, str(tmp_path / "out"), contigs=_CONTIGS)
    assert impl == "py"
    assert read_bam(spark, str(tmp_path / "out")).count() == 50


# -------------------------------------------------------------- roundtrip


@needs_jdk
def test_jvm_writer_roundtrip_both_readers(spark, fixture_path, tmp_path):
    src = read_bam(spark, fixture_path, split_size=65536)
    out = str(tmp_path / "rw")
    impl = write_bam_df(
        src.repartition(4), out, contigs=_CONTIGS, block_payload=4096, writer="jvm"
    )
    assert impl == "jvm"
    fields = ["flag", "rname", "pos", "mapq", "cigar", "tlen", "seq", "qual", "tags"]
    a = src.select("qname", *fields)
    for reader in ("jvm", "py"):
        back = read_bam(spark, out, split_size=16384, reader=reader)
        b = back.select("qname", *fields)
        joined = a.alias("a").join(b.alias("b"), "qname", "full_outer")
        mismatch = ~(F.col("a.flag").isNotNull() & F.col("b.flag").isNotNull())
        for f in fields[:-1]:
            mismatch = mismatch | ~F.col(f"a.{f}").eqNullSafe(F.col(f"b.{f}"))
        mismatch = mismatch | ~F.map_entries("a.tags").eqNullSafe(F.map_entries("b.tags"))
        assert joined.filter(mismatch).count() == 0, f"reader={reader}"


@needs_jdk
def test_jvm_and_python_writers_emit_identical_bytes(spark, fixture_path, tmp_path):
    """Differential contract: one partition, same options → the part-BAMs
    are byte-identical (compressed AND uncompressed)."""
    src = read_bam(spark, fixture_path).repartition(1).sortWithinPartitions("qname")
    dirs = {}
    for w in ("jvm", "py"):
        dirs[w] = str(tmp_path / w)
        write_bam_df(src, dirs[w], contigs=_CONTIGS, block_payload=4096, writer=w)
    jparts = sorted(glob.glob(dirs["jvm"] + "/part-*.bam"))
    pparts = sorted(glob.glob(dirs["py"] + "/part-*.bam"))
    assert len(jparts) == len(pparts) == 1
    with open(jparts[0], "rb") as f:
        jraw = f.read()
    with open(pparts[0], "rb") as f:
        praw = f.read()
    assert _uncompressed(jparts[0]) == _uncompressed(pparts[0])
    assert jraw == praw


@needs_jdk
def test_deflate_level_parity_and_size(spark, fixture_path, tmp_path):
    """deflate_level is a throughput/size knob honored identically by both
    writers (same zlib): byte-identical output at level 1 too, and level 1
    output is measurably larger than level 6."""
    src = read_bam(spark, fixture_path).repartition(1).sortWithinPartitions("qname")
    raws = {}
    for w in ("jvm", "py"):
        out = str(tmp_path / f"l1_{w}")
        write_bam_df(src, out, contigs=_CONTIGS, block_payload=4096,
                     deflate_level=1, writer=w)
        (part,) = glob.glob(out + "/part-*.bam")
        with open(part, "rb") as f:
            raws[w] = f.read()
    assert raws["jvm"] == raws["py"]
    out6 = str(tmp_path / "l6")
    write_bam_df(src, out6, contigs=_CONTIGS, block_payload=4096, writer="jvm")
    (part6,) = glob.glob(out6 + "/part-*.bam")
    assert len(raws["jvm"]) > os.path.getsize(part6)
    assert read_bam(spark, str(tmp_path / "l1_jvm")).count() == src.count()


@needs_jdk
def test_jvm_writer_no_inprogress_leftovers(spark, fixture_path, tmp_path):
    out = str(tmp_path / "clean")
    write_bam_df(read_bam(spark, fixture_path).limit(10), out, contigs=_CONTIGS, writer="jvm")
    assert not glob.glob(out + "/*.inprogress") and not glob.glob(out + "/.*inprogress*")


@needs_jdk
def test_jvm_writer_block_payload_framing(spark, fixture_path, tmp_path):
    """Every BGZF block except the last carries exactly block_payload
    uncompressed bytes (the exact-slicing contract shared with the
    Python writer)."""
    from spark_bam_spark.bam.reader import read_blocks

    out = str(tmp_path / "framed")
    write_bam_df(
        read_bam(spark, fixture_path).repartition(1),
        out,
        contigs=_CONTIGS,
        block_payload=8192,
        writer="jvm",
    )
    part = sorted(glob.glob(out + "/part-*.bam"))[0]
    rows = read_blocks(spark, part).orderBy("start").collect()
    sizes = [r["uncompressed_size"] for r in rows]
    assert all(s == 8192 for s in sizes[:-1])
    assert 0 < sizes[-1] <= 8192
    # EOF marker present
    with open(part, "rb") as f:
        f.seek(-28, os.SEEK_END)
        assert f.read(28) == bgzf.EOF_BLOCK


# ------------------------------------------------- subsets, defaults, nulls


@needs_jdk
def test_jvm_writer_subset_schema_defaults(spark, tmp_path):
    """Any-subset column contract: missing columns take spec defaults,
    rname resolves to ref_idx through the contigs option."""
    rows = [
        Row(qname="r0", rname="1", pos=100, seq="ACGT"),
        Row(qname="r1", rname="3", pos=200, seq="GG"),
        Row(qname="r2", rname="nope", pos=300, seq="T"),
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "subset")
    write_bam_df(df.coalesce(1), out, contigs=_CONTIGS, writer="jvm")
    back = {r["qname"]: r for r in read_bam(spark, out).collect()}
    assert len(back) == 3
    assert back["r0"]["ref_idx"] == 0 and back["r0"]["rname"] == "1"
    assert back["r1"]["ref_idx"] == 2 and back["r1"]["rname"] == "3"
    assert back["r2"]["ref_idx"] == -1  # unknown contig name
    r0 = back["r0"]
    assert r0["flag"] == 0 and r0["mapq"] == 0 and r0["cigar"] == "*"
    assert r0["mate_ref_idx"] == -1 and r0["tlen"] == 0
    assert r0["seq"] == "ACGT" and dict(r0["tags"]) == {}


@needs_jdk
def test_jvm_writer_null_values_take_defaults(spark, tmp_path):
    """NULL cell values coalesce to the same defaults as missing columns
    (the Python writer's val() contract)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("qname", StringType()),
            StructField("flag", IntegerType()),
            StructField("rname", StringType()),
            StructField("pos", LongType()),
            StructField("seq", StringType()),
            StructField("qual", StringType()),
            StructField("tags", MapType(StringType(), StringType())),
        ]
    )
    df = spark.createDataFrame(
        [("rn", None, "2", None, None, None, None)], schema=schema
    )
    out = str(tmp_path / "nulls")
    write_bam_df(df, out, contigs=_CONTIGS, writer="jvm")
    r = read_bam(spark, out).first()
    assert r["qname"] == "rn" and r["flag"] == 0
    assert r["pos"] == -1  # NULL pos → unplaced
    assert r["seq"] == "" and dict(r["tags"]) == {}


@needs_jdk
def test_jvm_writer_empty_partitions_write_valid_headers(spark, tmp_path):
    """Empty partitions still emit a header-only part-BAM (parity with the
    Python writer) that both readers accept as 0 rows."""
    df = (
        spark.createDataFrame([Row(qname="solo", rname="1", pos=5, seq="A")])
        .repartition(3)
    )
    out = str(tmp_path / "sparse")
    write_bam_df(df, out, contigs=_CONTIGS, writer="jvm")
    assert len(glob.glob(out + "/part-*.bam")) == 3
    for reader in ("jvm", "py"):
        assert read_bam(spark, out, reader=reader).count() == 1


@needs_jdk
def test_jvm_writer_int_typed_numeric_columns(spark, tmp_path):
    """pos/mate_pos as int (not the read schema's bigint) still encode."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("qname", StringType()),
            StructField("rname", StringType()),
            StructField("pos", IntegerType()),
            StructField("mate_pos", IntegerType()),
            StructField("seq", StringType()),
        ]
    )
    df = spark.createDataFrame([("i0", "2", 77, 99, "CCC")], schema=schema)
    out = str(tmp_path / "ints")
    write_bam_df(df, out, contigs=_CONTIGS, writer="jvm")
    r = read_bam(spark, out).first()
    assert r["pos"] == 77 and r["mate_pos"] == 99 and r["rname"] == "2"


@needs_jdk
def test_jvm_writer_rejects_bad_cigar(spark, tmp_path):
    df = spark.createDataFrame([Row(qname="x", rname="1", pos=1, cigar="4Q", seq="AC")])
    with pytest.raises(Exception, match="invalid cigar"):
        write_bam_df(df, str(tmp_path / "bad"), contigs=_CONTIGS, writer="jvm")


@needs_jdk
def test_jvm_writer_rejects_bad_block_payload(spark, tmp_path):
    df = spark.createDataFrame([Row(qname="x", rname="1", pos=1, seq="AC")])
    with pytest.raises(Exception, match="block_payload"):
        write_bam_df(
            df, str(tmp_path / "bp"), contigs=_CONTIGS, block_payload=1 << 20, writer="jvm"
        )


@needs_jdk
def test_jvm_writer_failed_write_leaves_no_inprogress(spark, tmp_path):
    """A task that fails mid-write must abort its temp file: the output
    dir may keep parts committed by OTHER tasks (append semantics), but
    never a .inprogress file (the rename-on-commit contract)."""
    out = str(tmp_path / "aborted")
    bad = spark.createDataFrame(
        [Row(qname="ok", rname="1", pos=1, cigar="2M", seq="AC"),
         Row(qname="boom", rname="1", pos=2, cigar="9Q", seq="GG")]  # invalid cigar op
    ).coalesce(1)
    with pytest.raises(Exception):
        write_bam_df(bad, out, contigs=_CONTIGS, writer="jvm")
    leftovers = [f for f in glob.glob(out + "/*") + glob.glob(out + "/.*")
                 if "inprogress" in f]
    assert leftovers == []


# --------------------------------------------------------------------- bai


@needs_jdk
def test_jvm_writer_bai_byte_identical_to_generator(spark, fixture_path, tmp_path):
    """Differential oracle for the write-side BAI emitter: a one-partition
    rewrite in file order with the generator's block_payload reproduces
    the generator's .bam byte-for-byte, so the emitted .bai must equal
    the generator's build_bai sidecar byte-for-byte too (same virtual
    offsets, same bins, same chunk merging, same linear index)."""
    src = read_bam(spark, fixture_path, split_size=1 << 30)  # one split: file order
    out = str(tmp_path / "rw")
    write_bam_df(src.coalesce(1), out, contigs=_CONTIGS, block_payload=4096, bai=True)
    part = sorted(glob.glob(out + "/part-*.bam"))[0]
    with open(fixture_path, "rb") as f:
        gen_bam = f.read()
    with open(part, "rb") as f:
        assert f.read() == gen_bam
    with open(fixture_path + ".bai", "rb") as f:
        gen_bai = f.read()
    with open(part + ".bai", "rb") as f:
        assert f.read() == gen_bai


@needs_jdk
def test_bai_pushdown_on_rewritten_output(spark, fixture_path, tmp_path):
    """bai=True makes interval queries over the rewritten directory
    index-pruned with no separate indexing pass: same rows as the
    unindexed filter, strictly fewer input splits.  Partitions must be
    coordinate-sorted (the spec's contract for BAI)."""
    src = read_bam(spark, fixture_path, split_size=65536)
    out = str(tmp_path / "rw")
    write_bam_df(
        src.repartition(4).sortWithinPartitions("ref_idx", "pos"),
        out, contigs=_CONTIGS, block_payload=4096, bai=True,
    )
    assert len(glob.glob(out + "/part-*.bam.bai")) == 4
    interval = (F.col("rname") == "1") & (F.col("pos") >= 13000) & (F.col("pos") < 200_000)
    full = read_bam(spark, out, split_size=8192)
    pruned = full.filter(interval).select("qname", "pos")
    expected = sorted(
        r["qname"] for r in src.filter(interval).select("qname").collect()
    )
    got = sorted(r["qname"] for r in pruned.collect())
    assert got == expected and len(got) > 0
    assert pruned.rdd.getNumPartitions() < full.select("pos").rdd.getNumPartitions()


@needs_jdk
def test_bai_rejects_unsorted_partitions(spark, tmp_path):
    """An unsorted partition with bai=True must fail loudly (the BAI
    linear-index floor is only sound for coordinate-sorted data — the
    same contract samtools index enforces), never emit a silently
    mispruning index."""
    rows = [Row(qname="a", rname="1", pos=500_000, cigar="2M", seq="AC"),
            Row(qname="b", rname="1", pos=100, cigar="2M", seq="GG")]
    df = spark.createDataFrame(rows).coalesce(1)
    with pytest.raises(Exception, match="coordinate-sorted"):
        write_bam_df(df, str(tmp_path / "u"), contigs=_CONTIGS, bai=True)


@needs_jdk
def test_bai_metadata_pseudobin_idxstats(spark, fixture_path, tmp_path):
    """The writers emit samtools' metadata pseudo-bin (37450) and the
    trailing no-coordinate count, so idxstats comes from the index alone:
    summed across a 4-part sorted rewrite it must equal a real scan's
    per-ref counts."""
    from spark_bam_spark.bam.bai import idxstats_from_bai, parse_bai

    src = read_bam(spark, fixture_path, split_size=65536)
    out = str(tmp_path / "rw")
    sort_key = F.when(F.col("ref_idx") < 0, F.lit(1 << 40)).otherwise(
        F.col("ref_idx").cast("long") * (1 << 32) + F.col("pos")
    )
    write_bam_df(
        src.withColumn("_k", sort_key).repartitionByRange(4, "_k")
        .sortWithinPartitions("_k").drop("_k"),
        out, contigs=_CONTIGS, block_payload=4096, bai=True,
    )
    mapped = {}
    no_coor = 0
    for p in sorted(glob.glob(out + "/part-*.bam.bai")):
        per_ref, nc = idxstats_from_bai(parse_bai(p))
        no_coor += nc
        for ref, m, u in per_ref:
            mapped[ref] = mapped.get(ref, 0) + m
            assert u == 0  # fixture has no placed-but-unmapped reads
    want = {
        r["ref_idx"]: r["n"]
        for r in src.filter(F.col("ref_idx") >= 0).groupBy("ref_idx").agg(
            F.count("*").alias("n")).collect()
    }
    assert mapped == want
    assert no_coor == src.filter(F.col("ref_idx") < 0).count()


def test_parse_bai_without_stats_is_backward_compatible(tmp_path):
    """A pre-r10 .bai (no pseudo-bin, no trailing count) still parses:
    stats None per ref, n_no_coor 0, chunk queries unaffected."""
    from spark_bam_spark.bam.bai import BaiIndex, parse_bai, write_bai
    from spark_bam_spark.bam.bgzf import Pos

    idx = BaiIndex(
        bins=[{100: []}, {}],
        linear=[[Pos(0, 0).to_voffset()], []],
    )
    p = str(tmp_path / "old.bai")
    write_bai(p, idx)
    with open(p, "rb") as f:
        data = f.read()
    with open(p, "wb") as f:  # strip the trailing n_no_coor → pre-r10 layout
        f.write(data[:-8])
    back = parse_bai(p)
    assert back.stats == [None, None] and back.n_no_coor == 0


def test_py_writer_bai_byte_identical_to_generator(spark, fixture_path, tmp_path):
    """r11: BAI emission ported to the Python Data Source writer — the
    dual-implementation symmetry the rest of the format layer has.  Same
    differential oracle as the JVM test: a one-partition file-order
    rewrite with the generator's block_payload reproduces the
    generator's .bam byte-for-byte, so the emitted .bai must equal the
    generator's build_bai sidecar byte-for-byte too."""
    src = read_bam(spark, fixture_path, split_size=1 << 30, reader="py")
    out = str(tmp_path / "rw")
    impl = write_bam_df(
        src.coalesce(1), out, contigs=_CONTIGS, block_payload=4096, bai=True, writer="py"
    )
    assert impl == "py"
    part = sorted(glob.glob(out + "/part-*.bam"))[0]
    with open(fixture_path, "rb") as f:
        gen_bam = f.read()
    with open(part, "rb") as f:
        assert f.read() == gen_bam
    with open(fixture_path + ".bai", "rb") as f:
        gen_bai = f.read()
    with open(part + ".bai", "rb") as f:
        assert f.read() == gen_bai


def test_py_writer_bai_rejects_unsorted_partitions(spark, tmp_path):
    """Same contract as the JVM sink: unsorted partitions with bai=True
    fail loudly (never a silently mispruning index), and the failed
    task leaves no .inprogress or part files behind."""
    rows = [Row(qname="a", rname="1", pos=500_000, cigar="2M", seq="AC"),
            Row(qname="b", rname="1", pos=100, cigar="2M", seq="GG")]
    df = spark.createDataFrame(rows).coalesce(1)
    out = str(tmp_path / "u")
    with pytest.raises(Exception, match="coordinate-sorted"):
        write_bam_df(df, out, contigs=_CONTIGS, bai=True, writer="py")
    assert glob.glob(out + "/part-*") == []
    assert [f for f in glob.glob(out + "/.*") if "inprogress" in f] == []


@pytest.mark.parametrize("writer", ["jvm", "py"])
def test_append_mode_never_clobbers_earlier_parts(spark, fixture_path, tmp_path, writer):
    """ADVICE r10: part names carry a per-job unique token, so
    df.write.mode('append') into a directory that already holds output
    adds parts instead of silently replacing same-numbered ones."""
    if writer == "jvm" and not _HAS_JDK:
        pytest.skip("no JDK")
    out = str(tmp_path / "ap")
    first = read_bam(spark, fixture_path).limit(100).coalesce(1)
    write_bam_df(first, out, contigs=_CONTIGS, writer=writer)
    second = read_bam(spark, fixture_path).limit(40).coalesce(1)
    write_bam_df(second, out, contigs=_CONTIGS, writer=writer)
    assert len(glob.glob(out + "/part-*.bam")) == 2
    assert read_bam(spark, out).count() == 140


@pytest.mark.parametrize("writer", ["jvm", "py"])
def test_overwrite_mode_replaces_directory(spark, fixture_path, tmp_path, writer):
    """mode='overwrite' replaces the target directory in BOTH writers
    (SupportsTruncate on the JVM sink, driver-side rmtree in the Python
    Data Source) — a stale part file from a wider earlier write must not
    survive."""
    if writer == "jvm" and not _HAS_JDK:
        pytest.skip("no JDK")
    out = str(tmp_path / "ow")
    first = read_bam(spark, fixture_path).limit(100).repartition(4)
    write_bam_df(first, out, contigs=_CONTIGS, writer=writer)
    assert len(glob.glob(out + "/part-*.bam")) == 4
    second = read_bam(spark, fixture_path).limit(30).coalesce(1)
    write_bam_df(second, out, contigs=_CONTIGS, mode="overwrite", writer=writer)
    assert len(glob.glob(out + "/part-*.bam")) == 1
    assert read_bam(spark, out).count() == 30


@pytest.mark.parametrize("writer", ["py", pytest.param("jvm", marks=pytest.mark.skipif(not _HAS_JDK, reason="no JDK"))])
def test_out_of_int32_numeric_fails_loudly(spark, tmp_path, writer):
    """ADVICE r10: long-typed numerics that exceed the spec's int32
    fields must throw in BOTH writers (the JVM sink used to truncate
    silently via (int) casts while the Python writer's struct.pack
    raised — the differential twins must fail identically)."""
    rows = [Row(qname="x", rname="1", pos=2**31, cigar="2M", seq="AC")]
    df = spark.createDataFrame(rows).coalesce(1)
    with pytest.raises(Exception, match="int32|2147483647"):
        write_bam_df(df, str(tmp_path / "ov"), contigs=_CONTIGS, writer=writer)


def test_write_bam_df_rejects_bad_mode(spark, tmp_path):
    df = spark.createDataFrame([Row(qname="x", rname="1", pos=1, seq="AC")])
    with pytest.raises(ValueError, match="mode must be"):
        write_bam_df(df, str(tmp_path / "m"), contigs=_CONTIGS, mode="ignore")


# ------------------------------------------- gated differential fuzz

_FUZZ = os.environ.get("SPARK_GRAFT_JVM_FUZZ") == "1"


@needs_jdk
@pytest.mark.skipif(not _FUZZ, reason="set SPARK_GRAFT_JVM_FUZZ=1 to run")
def test_fuzz_writer_byte_parity(spark, tmp_path_factory):
    """Hypothesis sweep over the record space (count, block geometry,
    RNG seed): for the same single-partition input and options the JVM
    and Python writers must emit BYTE-IDENTICAL part-BAMs — the
    generalization of test_jvm_and_python_writers_emit_identical_bytes'
    one fixed corner.  Env-gated: each example builds a DataFrame and
    runs two write jobs."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from pyspark.sql import Row as R
    from spark_bam_spark.bam.records import CIGAR_OPS
    from spark_bam_spark.bam.writer import synth_records

    base = tmp_path_factory.mktemp("writer_fuzz")
    counter = {"i": 0}

    def to_row(r):
        return R(
            qname=r.qname, flag=r.flag, ref_idx=r.ref_idx, pos=r.pos,
            mapq=r.mapq,
            cigar="".join(f"{ln}{CIGAR_OPS[op]}" for op, ln in r.cigar) or "*",
            mate_ref_idx=r.mate_ref_idx, mate_pos=r.mate_pos, tlen=r.tlen,
            seq=r.seq, qual="".join(chr(min(q + 33, 255)) for q in r.qual),
            tags=dict(r.tags),
        )

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(0, 400),
        block_payload=st.sampled_from([512, 937, 4096, 17001, 65280]),
        long_cigar=st.booleans(),
    )
    def check(seed, n, block_payload, long_cigar):
        counter["i"] += 1
        src = synth_records(n, seed=seed)
        if long_cigar:
            # §4.2.2 corner: one >uint16-op record exercises the
            # placeholder + CG:B,I emission in both writers
            from spark_bam_spark.bam.records import BamRecord

            n_ops = 65_536 + seed % 64
            ops = [(0, 1) if i % 2 == 0 else (1, 1) for i in range(n_ops)]
            lseq = n_ops
            src.insert(len(src) // 2, BamRecord(
                qname=f"long{seed}", flag=0, ref_idx=0, pos=777, mapq=1,
                cigar=ops, mate_ref_idx=-1, mate_pos=-1, tlen=0,
                seq=("ACGT" * (lseq // 4 + 1))[:lseq],
                qual=bytes([30]) * lseq, tags={"RG": "rgf"},
            ))
        recs = [to_row(r) for r in src]
        if recs:
            df = spark.createDataFrame(recs).coalesce(1)
        else:
            from pyspark.sql.types import (
                IntegerType, LongType, MapType, StringType, StructField, StructType,
            )

            df = spark.createDataFrame([], schema=StructType([
                StructField("qname", StringType()), StructField("flag", IntegerType()),
                StructField("ref_idx", IntegerType()), StructField("pos", LongType()),
                StructField("mapq", IntegerType()), StructField("cigar", StringType()),
                StructField("mate_ref_idx", IntegerType()),
                StructField("mate_pos", LongType()), StructField("tlen", IntegerType()),
                StructField("seq", StringType()), StructField("qual", StringType()),
                StructField("tags", MapType(StringType(), StringType())),
            ])).coalesce(1)
        outs = {}
        for w in ("jvm", "py"):
            out = str(base / f"e{counter['i']}_{w}")
            write_bam_df(df, out, contigs=_CONTIGS, block_payload=block_payload, writer=w)
            (part,) = sorted(glob.glob(out + "/part-*.bam"))
            with open(part, "rb") as f:
                outs[w] = f.read()
        assert outs["jvm"] == outs["py"]

    check()


# ----------------------------------------------------------------- queries


@needs_jdk
def test_bam_sort_rewrite_query(spark):
    """The distributed-sort query: de-sorted input → range partition →
    in-partition sort → indexed write → re-derived verdict row."""
    from spark_bam_spark.queries import load_all

    row = load_all()["bam_sort_rewrite"].fn(spark, "/root/testdata/sf0.001").first()
    assert row["n_records"] == 2500
    assert row["globally_sorted"] and row["roundtrip_match"]


@needs_jdk
def test_rewrite_roundtrip_queries_all_match(spark):
    from spark_bam_spark.queries import REGISTRY

    for name in (
        "bam_rewrite_roundtrip",
        "bam_rewrite_roundtrip_jvm",
        "bam_rewrite_roundtrip_py",
    ):
        row = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").first()
        assert row["n_mismatch"] == 0 and row["all_match"], name
