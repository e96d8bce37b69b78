"""Bucketed tables: co-located joins and aggregations without a shuffle.

The 100 TB pattern: pay one shuffle at WRITE time (bucketBy on the join
key), then every subsequent equi-join or aggregation on that key reads
both sides already co-partitioned — the exchange disappears from the
plan. This is the Spark-native generalization of the reference's
"distributed sorted structure + co-partitioned zip" (SURVEY J1/O5,
check/.../indexed/BlocksAndIndexedRecords.scala:30-56): instead of
hand-repartitioning RDDs to matching bounds, the table layout carries
the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planned without an
    Exchange on either side (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
