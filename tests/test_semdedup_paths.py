"""The two SemDeDup paths must make identical prune decisions.

`semdedup_prune` (DECIMAL zip_with scoring, bit-exact oracle twin) and
`semdedup_prune_fast` (numpy matmul per cluster) share the blocking
phase by construction (`_semdedup_assign`); this pins that the scoring
paths agree on the full decision list — same pruned vectors, same kept
partners, same clusters — so the 13x-faster production path can be
benched/deployed without a semantics caveat.
"""

from __future__ import annotations

import pytest

from spark_bam_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fast_and_decimal_paths_agree(spark, sf):
    slow = {
        (r["cluster"], r["vec_pruned"], r["kept_vec"])
        for r in REGISTRY["semdedup_prune"].fn(spark, sf).collect()
    }
    fast = {
        (r["cluster"], r["vec_pruned"], r["kept_vec"])
        for r in REGISTRY["semdedup_prune_fast"].fn(spark, sf).collect()
    }
    assert slow, "empty decision list would make the test vacuous"
    assert fast == slow


def test_fast_path_finds_exactly_the_planted_dups(spark):
    rows = REGISTRY["semdedup_prune_fast"].fn(spark, "/root/testdata/sf0.01").collect()
    # every planted copy (vec_id + 100000 of each vec_id % 11 == 0) must be
    # pruned against its source, and nothing else reaches the 0.99 bar
    for r in rows:
        assert r["vec_pruned"] == r["kept_vec"] + 100000
        assert r["kept_vec"] % 11 == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
