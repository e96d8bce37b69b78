"""Plan-quality + property tests for the training-pipeline operators in
queries/mlprep.py (their value correctness is covered by the parametrized
oracle gate in test_queries_vs_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_bam_spark.queries import load_all
from spark_bam_spark.queries.mlprep import PACK_BUDGET, SRP_PLANES

REGISTRY = load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "dedup_srp_lsh",
        "kmeans_lloyd",
        "embedding_norm_stats",
        "sample_stratified",
        "text_repetition",
        "decontaminate_overlap",
        "vocab_coverage",
        "pack_training_sequences",
        "ivf_kmeans_probe",
        "quantize_int8_topk",
        "lsh_quality_eval",
        "dataset_mix_weights",
    ],
)
def test_no_python_eval_in_mlprep(spark, sf_small, name):
    plan = plan_of(REGISTRY[name].fn(spark, sf_small))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assignment_never_shuffles_vectors(spark, sf_small):
    """The in-row argmin rewrite: no SortMergeJoin/Exchange keyed on
    vec_id anywhere — only tiny cluster-keyed aggregations shuffle."""
    plan = plan_of(REGISTRY["kmeans_lloyd"].fn(spark, sf_small))
    assert "hashpartitioning(vec_id" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_small):
    plan = plan_of(REGISTRY["decontaminate_overlap"].fn(spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_quantize_topk_is_take_ordered(spark, sf_small):
    plan = plan_of(REGISTRY["quantize_int8_topk"].fn(spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_sample_stratified_predicate_is_row_local(spark, sf_small):
    """No shuffle at all: the plan is scan → filter → project."""
    plan = plan_of(REGISTRY["sample_stratified"].fn(spark, sf_small))
    assert "Exchange" not in plan


def test_quantized_vectors_bounded_int8(spark, sf_small):
    """Every quantized component must lie in [-127, 127]."""
    from spark_bam_spark.queries.mlprep import _QVEC
    from spark_bam_spark.tables import table

    emb = table(spark, sf_small, "embeddings")
    bad = (
        emb.select(F.expr(_QVEC).alias("qv"))
        .select(F.expr("array_max(transform(qv, x -> abs(x)))").alias("m"))
        .filter(F.col("m") > 127)
        .count()
    )
    assert bad == 0


def test_pack_bins_respect_budget_start(spark, sf_small):
    """A bin's token total can overflow only by its final document (greedy
    concat-then-chunk), and per (source, bin) doc counts are positive."""
    rows = REGISTRY["pack_training_sequences"].fn(spark, sf_small).collect()
    assert rows and all(r["n_docs"] >= 1 for r in rows)
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for src, bins in per_source.items():
        bins.sort(key=lambda r: r["bin"])
        # bins are dense from 0 when every doc fits the budget ordering
        assert bins[0]["bin"] == 0, src
        total = sum(r["n_tokens"] for r in bins)
        # last bin starts below total: bin index bounded by total/budget
        assert bins[-1]["bin"] <= total // PACK_BUDGET, src


def test_srp_bucket_range(spark, sf_small):
    """SRP buckets are SRP_PLANES-bit ints on both pair endpoints."""
    rows = REGISTRY["dedup_srp_lsh"].fn(spark, sf_small).limit(200).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < (1 << SRP_PLANES)
        assert r["vec_a"] < r["vec_b"]


def test_lsh_eval_metrics_consistent(spark, sf_small):
    r = REGISTRY["lsh_quality_eval"].fn(spark, sf_small).collect()[0]
    assert 0 <= r["n_planted_found"] <= r["n_planted"]
    assert 0 <= r["n_verified"] <= r["n_candidates"]
    assert abs(r["recall"] - r["n_planted_found"] / r["n_planted"]) < 1e-12
    assert abs(r["precision"] - r["n_verified"] / r["n_candidates"]) < 1e-12
    # exact duplicates of planted docs exist in the corpus → LSH must
    # find a decent share of the planted near-dups
    assert r["recall"] > 0.5


def test_mix_weights_sum_to_one(spark, sf_small):
    rows = REGISTRY["dataset_mix_weights"].fn(spark, sf_small).collect()
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
