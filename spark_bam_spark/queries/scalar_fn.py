"""Scalar-function queries (SURVEY §2.8): virtual-position codec and
interval parsing exercised over the events table with full SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark import functions as bf
from spark_bam_spark.queries import register
from spark_bam_spark.tables import table


@register(
    "pos_codec_roundtrip",
    tags=("scalar", "pos"),
    oracle="""
    WITH p AS (
      SELECT event_id,
             event_id * 7 AS block_pos,
             event_id % 65536 AS off
      FROM events WHERE event_id < 1000
    )
    SELECT event_id,
           (block_pos << 16) | off AS vpos,
           ((block_pos << 16) | off) >> 16 AS block_pos_back,
           CAST(((block_pos << 16) | off) & 65535 AS INTEGER) AS offset_back,
           (((block_pos << 16) | off) >> 16 = block_pos
            AND ((block_pos << 16) | off) & 65535 = off) AS ok
    FROM p
    """,
)
def pos_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTSJDK 48/16-bit virtual-offset pack/unpack as bitwise expressions
    (Pos.scala:24,32-36) — pure codegen'd arithmetic, zero shuffle."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    p = e.select(
        "event_id",
        (F.col("event_id") * 7).alias("block_pos"),
        (F.col("event_id") % 65536).alias("off"),
    )
    vpos = bf.pos_pack("block_pos", "off")
    out = p.select("event_id", vpos, "block_pos", "off")
    return out.select(
        "event_id",
        "vpos",
        bf.pos_unpack_block("vpos").alias("block_pos_back"),
        bf.pos_unpack_offset("vpos").alias("offset_back"),
        (
            (bf.pos_unpack_block("vpos") == F.col("block_pos"))
            & (bf.pos_unpack_offset("vpos") == F.col("off"))
        ).alias("ok"),
    )


@register(
    "interval_parse",
    tags=("scalar", "intervals"),
    oracle="""
    WITH raw AS (
      SELECT DISTINCT n_nationkey,
             CAST(n_nationkey AS VARCHAR) || ':' || CAST(n_nationkey * 1000 AS VARCHAR)
               || '-' || CAST(n_nationkey * 2000 AS VARCHAR) AS ivl
      FROM nation
    )
    SELECT ivl,
           string_split(ivl, ':')[1] AS contig,
           CAST(string_split(string_split(ivl, ':')[2], '-')[1] AS BIGINT) AS start,
           CAST(string_split(string_split(ivl, ':')[2], '-')[2] AS BIGINT) AS "end"
    FROM raw
    """,
)
def interval_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-string parse '1:13000-14000' (Intervals.scala:53-55) via
    regexp extraction into a typed struct."""
    n = table(spark, sf_dir, "nation")
    raw = n.select(
        F.concat_ws(
            "",
            F.col("n_nationkey").cast("string"),
            F.lit(":"),
            (F.col("n_nationkey") * 1000).cast("string"),
            F.lit("-"),
            (F.col("n_nationkey") * 2000).cast("string"),
        ).alias("ivl")
    ).distinct()
    parsed = raw.select("ivl", bf.parse_interval("ivl").alias("p"))
    return parsed.select("ivl", "p.contig", "p.start", "p.end")
