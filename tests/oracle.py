"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet dir; compares row count, column-name set, and the full
(order-insensitive) value multiset with EXACT equality — same bar as the
driver's value hash.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from spark_bam_spark.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _keyed_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark, name: str, spec, sf_dir: str) -> None:
    df = spec.fn(spark, sf_dir)
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]

    con = duck_con(sf_dir)
    res = con.sql(spec.oracle)
    d_cols = list(res.columns)
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {sorted(s_cols)} != {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    sk = _keyed_rows(s_cols, s_rows)
    dk = _keyed_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
