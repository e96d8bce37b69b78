"""Rows-only smoke for the BAM queries registered without oracles (the
driver runs the same weaker check)."""

from __future__ import annotations

import pytest

from spark_bam_spark.queries import load_all

REGISTRY = load_all()
BAM_QUERIES = sorted(n for n, s in REGISTRY.items() if n.startswith(("bam_", "sam_")))


@pytest.mark.parametrize("name", BAM_QUERIES)
def test_bam_query_runs(spark, sf_small, name):
    df = REGISTRY[name].fn(spark, sf_small)
    assert df.count() > 0
