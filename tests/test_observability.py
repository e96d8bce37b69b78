"""Pipeline observability via df.observe(): metrics collected DURING a
single action, not by re-running aggregate queries — at 100 TB the stage
counts a pipeline reports (rows kept, tokens written, nulls seen) must
ride along the one production pass, because a second scan to count is
petabytes re-read.  These tests pin that the engine's pipelines can be
instrumented this way and that observed metrics equal the ground truth."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from spark_bam_spark.tables import table


def test_observe_collects_metrics_in_one_pass(spark, sf_small, tmp_path):
    d = table(spark, sf_small, "documents")
    obs_in = Observation("ingest")
    obs_out = Observation("kept")
    pipeline = (
        d.observe(obs_in, F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .filter(F.size(F.split("text", " ")).between(20, 1000))
        .observe(obs_out, F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
    )
    # ONE action drives the pipeline and fills both observation points
    pipeline.write.mode("overwrite").parquet(f"{tmp_path}/kept")

    truth_in = d.count()
    truth_out = d.filter(F.size(F.split("text", " ")).between(20, 1000)).count()
    assert obs_in.get["n"] == truth_in
    assert obs_out.get["n"] == truth_out
    assert 0 < obs_out.get["n"] < obs_in.get["n"]
    assert obs_out.get["chars"] < obs_in.get["chars"]


def test_observe_rides_registry_query(spark, sf_small):
    # instrument a registry pipeline without changing its result
    from spark_bam_spark.queries import load_all

    fn = load_all()["dedup_exact"].fn
    df = fn(spark, sf_small)
    obs = Observation("dedup_groups")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_groups"), F.sum("group_size").alias("n_members"))
    rows = observed.collect()
    assert obs.get["n_groups"] == len(rows)
    assert obs.get["n_members"] == sum(r["group_size"] for r in rows)
