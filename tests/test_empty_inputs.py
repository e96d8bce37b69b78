"""Empty-input robustness: every registry query must plan and execute
against EMPTY tables (same schemas, zero rows) without crashing — the
degenerate case every 100 TB pipeline hits (empty partitions, a filter
that matches nothing, a fresh day with no data).  Results may be empty
or carry zero counts; what's forbidden is an exception.

Env-gated (SPARK_GRAFT_EMPTY_SWEEP=1) like the oracle sweeps: the full
registry spin-up is minutes, not CI-seconds."""

from __future__ import annotations

import os

import pytest

from spark_bam_spark.queries import load_all

REGISTRY = load_all()
_SWEEP = os.environ.get("SPARK_GRAFT_EMPTY_SWEEP") == "1"

# BAM/SAM/multimodal queries read committed binary fixtures, not the sf
# tables — an empty *table* dir is not their degenerate case (an empty BAM
# is covered by the format-layer tests).
_TABLE_QUERIES = sorted(
    n for n in REGISTRY if not n.startswith(("bam_", "sam_", "multimodal_", "compare_"))
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_small, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    from spark_bam_spark.tables import TABLE_NAMES, table

    for name in TABLE_NAMES:
        df = table(spark, sf_small, name)
        df.limit(0).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    return str(out)


@pytest.mark.skipif(not _SWEEP, reason="set SPARK_GRAFT_EMPTY_SWEEP=1 to run")
@pytest.mark.parametrize("name", _TABLE_QUERIES)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = REGISTRY[name].fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)  # empty or zero-count rows — just no crash
