"""Scalar-function unit tests (SURVEY §2.8)."""

from pyspark.sql import functions as F

from spark_bam_spark import functions as bf


def test_pos_pack_unpack_roundtrip(spark):
    df = spark.range(1000).select(
        (F.col("id") * 131071).alias("bp"), (F.col("id") % 65536).cast("int").alias("off")
    )
    out = df.select(
        "bp", "off", bf.pos_pack("bp", "off").alias("v")
    ).select(
        "bp", "off",
        bf.pos_unpack_block("v").alias("b2"),
        bf.pos_unpack_offset("v").alias("o2"),
    )
    bad = out.filter((F.col("b2") != F.col("bp")) | (F.col("o2") != F.col("off"))).count()
    assert bad == 0


def test_pos_distance_ratio(spark):
    row = (
        spark.range(1)
        .select(bf.pos_distance(F.lit(100), F.lit(10), F.lit(200), F.lit(30)))
        .collect()[0][0]
    )
    assert row == 100 * 3.0 + 20


def test_format_bytes(spark):
    vals = [(512, "512B"), (1536, "1.5K"), (583 * 1024, "583.0K"), (5 << 20, "5.0M"), (3 << 30, "3.0G")]
    df = spark.createDataFrame([(v,) for v, _ in vals], "n long").select(bf.format_bytes("n"))
    assert [r[0] for r in df.collect()] == [s for _, s in vals]


def test_read_name_and_cigar_checks(spark):
    df = spark.createDataFrame(
        [("read001", 0x28), ("bad name", 0x29), ("ok!?", 0x2F)], "name string, op int"
    ).select(bf.is_valid_read_name("name").alias("n"), bf.is_valid_cigar_op_int("op").alias("c"))
    rows = df.collect()
    assert [r["n"] for r in rows] == [True, False, True]
    # nibbles: 0x8 valid, 0x9 invalid, 0xF invalid
    assert [r["c"] for r in rows] == [True, False, False]


def test_parse_interval_open_end(spark):
    df = spark.createDataFrame([("1:13000-14000",), ("X:500",)], "s string").select(
        bf.parse_interval("s").alias("p")
    )
    rows = [r["p"] for r in df.collect()]
    assert rows[0]["contig"] == "1" and rows[0]["start"] == 13000 and rows[0]["end"] == 14000
    assert rows[1]["contig"] == "X" and rows[1]["start"] == 500 and rows[1]["end"] is None
