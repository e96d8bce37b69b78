"""Runtime scale features the engine's designs lean on, pinned at the
plan level: AQE skew-join splitting (the no-manual-salting path for
skewed keys) and runtime Bloom-filter pruning (the pre-shuffle row
filter dedup_incremental's docstring promises).  Thresholds are lowered
so local-mode data triggers the behavior the same way multi-GB
partitions would on a cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def restore_confs(spark):
    keys = (
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    yield spark
    for k, v in saved.items():
        try:
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        except Exception:
            pass


def test_aqe_splits_skewed_join_partitions(restore_confs):
    spark = restore_confs
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

    # one pathological key carrying ~99% of the rows
    left = spark.range(60_000).select(
        F.when(F.col("id") % 100 == 0, F.col("id")).otherwise(F.lit(7)).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v"),
    )
    right = spark.range(5_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
    )
    joined = left.join(right, "k")
    assert len(joined.collect()) > 0  # AQE finalizes skew handling on execution
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isSkew=true" in plan or "skew=" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_prunes_probe_side(restore_confs):
    spark = restore_confs
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # shuffle join

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # big probe side and a small, selectively-filtered build side —
        # the shape where the bloom filter prunes probe rows pre-shuffle
        spark.range(100_000).select(
            F.col("id").alias("k"), F.concat(F.lit("x"), F.col("id")).alias("pad")
        ).write.parquet(f"{d}/big")
        spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") % 997).alias("sel")
        ).write.parquet(f"{d}/dim")
        big = spark.read.parquet(f"{d}/big")
        dim = spark.read.parquet(f"{d}/dim").filter(F.col("sel") == 0)
        joined = big.join(dim, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "might_contain" in plan.lower(), plan[:2000]
