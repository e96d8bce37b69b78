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


def test_ivf_path_matches_its_oracle(spark, sf_medium):
    """The two-level blocking (registered in r7 as ``semdedup_prune_ivf``):
    Spark result must hash-match SEMDEDUP_IVF_ORACLE_SQL — same bar the
    driver applies."""
    from spark_bam_spark.queries import mlprep
    from tests.oracle import _keyed_rows, duck_con

    df = mlprep.semdedup_prune_ivf(spark, sf_medium)
    scols, srows = list(df.columns), [tuple(r) for r in df.collect()]
    con = duck_con(sf_medium)
    res = con.sql(mlprep.SEMDEDUP_IVF_ORACLE_SQL)
    dcols, drows = list(res.columns), res.fetchall()
    con.close()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _keyed_rows(scols, srows) == _keyed_rows(dcols, drows)


def test_ivf_path_planted_recall(spark, sf_medium):
    """Nested blocking may legitimately split rare boundary pairs at large
    n (one of 63,455 at the 30x probe); at the driver's scales the
    decision list is identical to the flat path."""
    from spark_bam_spark.queries import mlprep

    ivf = {
        (r["vec_pruned"], r["kept_vec"])
        for r in mlprep.semdedup_prune_ivf(spark, sf_medium).collect()
    }
    flat = {
        (r["vec_pruned"], r["kept_vec"])
        for r in REGISTRY["semdedup_prune_fast"].fn(spark, sf_medium).collect()
    }
    assert flat and ivf == flat


def test_ivf_ckpt_modes_agree(spark, sf_medium, monkeypatch):
    """Every lineage-truncation mode of the coarse assignment (r8 A/B:
    off/pairs/mem/memw — memw is the shipped default) must produce the
    identical decision list; the checkpoint is a physical-plan choice,
    never a semantic one."""
    from spark_bam_spark.queries import mlprep

    results = {}
    for mode in ("off", "memw"):
        monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_IVF_CKPT", mode)
        results[mode] = sorted(
            map(tuple, mlprep.semdedup_prune_ivf(spark, sf_medium).collect())
        )
    assert results["off"], "empty decision list would make the test vacuous"
    assert results["memw"] == results["off"]


def test_fast_path_finds_exactly_the_planted_dups(spark):
    from spark_bam_spark.queries.mlprep import SEM_PLANT_OFFSET

    rows = REGISTRY["semdedup_prune_fast"].fn(spark, "/root/testdata/sf0.01").collect()
    # every planted copy (vec_id + SEM_PLANT_OFFSET of each vec_id % 11 == 0)
    # must be pruned against its source, and nothing else reaches the 0.99 bar
    for r in rows:
        assert r["vec_pruned"] == r["kept_vec"] + SEM_PLANT_OFFSET
        assert r["kept_vec"] % 11 == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
