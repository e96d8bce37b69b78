"""Bucketed co-located joins: one shuffle at write time, none at read."""

import pytest
from pyspark.sql import functions as F

from spark_bam_spark.operators.bucketing import bucketed_join, plan_has_exchange, write_bucketed
from spark_bam_spark.tables import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    write_bucketed(
        table(spark, sf_small, "orders"), "orders_b", ["o_orderkey"], 8, ["o_orderkey"]
    )
    write_bucketed(
        table(spark, sf_small, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_plans_no_exchange(spark, sf_small, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "lineitem_b", "orders_b", on=["o_orderkey"])
        assert not plan_has_exchange(j.select("o_orderkey", "o_totalprice", "l_extendedprice"))
        # same join on the raw parquet DOES shuffle both sides
        li = table(spark, sf_small, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        o = table(spark, sf_small, "orders")
        assert plan_has_exchange(li.join(o, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_small, bucketed):
    j = bucketed_join(spark, "lineitem_b", "orders_b", on=["o_orderkey"])
    got = j.groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("q")
    ).collect()[0]
    li = table(spark, sf_small, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = table(spark, sf_small, "orders")
    want = li.join(o, "o_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("q")
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_by_type")
    table(spark, sf_small, "events").write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    want = table(spark, sf_small, "events").filter(F.col("event_type") == "click").count()
    assert df.count() == want
