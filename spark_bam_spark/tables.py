"""Loaders for the synthetic corpus (see TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # TIMESTAMP(NANOS) columns surface as bigint under
    # spark.sql.legacy.parquet.nanosAsLong — convert to microsecond
    # timestamps (truncation matches DuckDB's ns→µs fetch behavior).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a scan that collapsed to fewer partitions than cores.

    The local fixtures are single-row-group parquet files, so Spark plans
    ONE input split and every narrow compute-heavy stage (explode, hash,
    per-row array math) runs serially. On a 1000-executor cluster the same
    scan has thousands of splits and this returns the input unchanged —
    the check is on planned partitions, not data size. Use before
    compute-dominated narrow stages only; for pure aggregations map-side
    partial aggregation beats shuffling full rows.

    The threshold is deliberately GENEROUS (planned < 4x cores =>
    repartition): planned-split count overstates real parallelism for
    few-row-group files, because a parquet byte-range split only owns the
    row groups whose midpoint lands in it.  The r14 100x campaign hit
    exactly this: a ~107 MB single-file scan planned 13 splits but held 2
    row groups, so 24 of 26 union tasks were EMPTY and the whole n*K
    semdedup assignment ran in 2 straggler tasks (loadavg ~1 for ~20 min;
    the old `planned * 2 <= cores` check judged 26 planned "wide enough").
    The insurance cost when the input was already balanced is one narrow
    shuffle of the rows — noise next to any stage this wrapper belongs in
    front of; on a real cluster planned splits >> 4x cores and the input
    passes through unchanged.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < 4 * target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the oracle's DuckDB views)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
