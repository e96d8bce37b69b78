"""Every registered query with an oracle must hash-match DuckDB (the same
gate the driver runs at sf0.01; we run sf0.001 for speed and sf0.01 for a
smoke subset)."""

from __future__ import annotations

import pytest

from spark_bam_spark.queries import load_all
from tests.oracle import compare

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle_sf0001(spark, sf_small, name):
    compare(spark, name, REGISTRY[name], sf_small)


@pytest.mark.parametrize("name", sorted(n for n, s in REGISTRY.items() if s.headline and s.oracle))
def test_headline_matches_oracle_sf001(spark, sf_medium, name):
    compare(spark, name, REGISTRY[name], sf_medium)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
