"""Oracle output TYPES must be driver-hashable.

The driver's value hash is type-sensitive: DuckDB promotes SUM() over
integer columns to HUGEINT (int128), which hashes differently from
Spark's BIGINT even when every value is equal — exactly the r2 failures
(`boilerplate_segments`, `pagerank_bipartite`).  Guard the whole registry:
DESCRIBE every oracle and reject HUGEINT/UHUGEINT columns (the oracle SQL
must CAST(... AS BIGINT) explicitly).
"""

from __future__ import annotations

import pytest

from spark_bam_spark.queries import load_all
from tests.oracle import duck_con

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    from tests.conftest import SF_SMALL

    c = duck_con(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_has_no_hugeint_columns(con, name):
    desc = con.execute(f"DESCRIBE {REGISTRY[name].oracle}").fetchall()
    huge = [(col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()]
    assert not huge, (
        f"{name}: oracle yields int128 columns {huge}; wrap in CAST(... AS BIGINT) "
        "or the driver's type-sensitive hash will mismatch Spark's BIGINT"
    )
