"""Scalar-function queries (SURVEY §2.8): virtual-position codec and
interval parsing exercised over the events table with full SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark import functions as bf
from spark_bam_spark.queries import register
from spark_bam_spark.queries.bam_qa import _TRUTH_PQ
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


@register(
    "date_monthly_orders",
    tags=("scalar", "date"),
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
)
def date_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions (engine-native, absent in reference — §2.8 note):
    month truncation + per-month aggregates."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("month")
    )


@register(
    "json_extract_events",
    tags=("scalar", "json"),
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY k_mod
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events props column (engine-native —
    §2.8 note): get_json_object stays JVM-side; at scale prefer a typed
    from_json with an explicit schema so the parse happens once."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"),
            "value",
        )
        .groupBy("k_mod")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("k_mod")
    )


@register(
    "array_map_functions",
    tags=("scalar", "array"),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens,
           list_sort(list_distinct(string_split(lower(substr(text, 1, 40)), ' ')))[1] AS first_token
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (engine-native — §2.8 note):
    split/distinct/sort on token arrays, all codegen'd JVM expressions."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    toks_l = F.split(F.lower("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks_l)).cast("long").alias("n_distinct_tokens"),
        F.sort_array(F.array_distinct(F.split(F.lower(F.substring("text", 1, 40)), " ")))
        .getItem(0)
        .alias("first_token"),
    ).orderBy("doc_id")


@register(
    "scalar_fn_suite",
    tags=("scalar", "bam"),
    oracle=f"""
    SELECT CAST(sum(block_pos * 3.0 + "offset") AS DOUBLE) AS sum_approx_distance,
           CAST(sum(CASE WHEN regexp_matches(qname, '^[!-?A-~]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_names,
           CAST(sum(CASE WHEN (pos & 15) <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_ops,
           printf('%.1f', CAST(max(block_pos) AS DOUBLE) / 1024) || 'K' AS fmt_max_bp,
           printf('%.1f', CAST(count(*) AS DOUBLE) / 1024) || 'K' AS fmt_n
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def scalar_fn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining §2.8 scalars under driver-hash evidence (previously
    scan-internal/pytest-only): pos_distance (Pos.scala:17-22, ratio 3.0
    from file start so every term is an exact integer in DOUBLE — the
    sum is order-independent), is_valid_read_name (Checker.scala:11-16
    alphabet over every fixture qname), is_valid_cigar_op_int
    (eager/Checker.scala:104 nibble rule, driven with the pos column so
    the -1 no-coor rows exercise the invalid branch), and format_bytes
    (CheckerApp.scala:157-159) on two aggregate values chosen away from
    decimal-rounding half-cases (the oracle re-renders them with
    printf).  The printf re-rendering additionally assumes both values
    stay in format_bytes' K branch below 1024000 (format_number would
    insert a thousands comma above that, and flip to the M branch at
    1<<20, neither of which printf mirrors) — true of the frozen fixture
    (353.6K, 2.4K) and re-checked by the hash every round."""
    from spark_bam_spark.queries.bam_qa import _reads

    reads = _reads(spark, columns="qname,block_pos,offset,pos")
    agg = reads.agg(
        F.sum(
            bf.pos_distance(F.lit(0), F.lit(0), F.col("block_pos"), F.col("offset"))
        ).alias("sum_approx_distance"),
        F.sum(bf.is_valid_read_name("qname").cast("long")).alias("n_valid_names"),
        F.sum(bf.is_valid_cigar_op_int("pos").cast("long")).alias("n_valid_ops"),
        F.max("block_pos").alias("max_bp"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "sum_approx_distance",
        "n_valid_names",
        "n_valid_ops",
        bf.format_bytes(F.col("max_bp")).alias("fmt_max_bp"),
        bf.format_bytes(F.col("n")).alias("fmt_n"),
    )
