"""Simulate the external driver's correctness gate locally.

Loads ``__spark_entry__.py`` by file path from a foreign cwd (exactly as
the driver does), takes the FIRST N entries of ``queries()`` (the
driver's verification window), runs each against its ``oracle_sql()``
twin on DuckDB over the same parquet dir, and compares row count, column
names, and the order-insensitive value multiset. Queries without oracle
SQL get the driver's weaker rows-only check.

Usage:
    python tools/run_window_sim.py [--sf-dir /root/testdata/sf0.01]
                                   [--window 50] [--names a,b,c]

Exit status is non-zero if any window entry fails, so the script can
gate a round-end commit.
"""

from __future__ import annotations

import argparse
import datetime
import importlib.util
import math
import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _keyed(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(_norm(r[i]) for i in order) for r in rows], key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--names", default=None, help="comma list overriding the window")
    args = ap.parse_args()

    # foreign-cwd load, like the driver
    os.chdir("/tmp")
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb

    from spark_bam_spark.session import get_spark
    from spark_bam_spark.tables import TABLE_NAMES

    spark = get_spark("window-sim")
    qs, osql = mod.queries(), mod.oracle_sql()
    names = args.names.split(",") if args.names else list(qs)[: args.window]
    if not args.names:
        # rows-only queries fall out of the driver's window forever once they
        # record a passing row, so a later regression (crash / empty result)
        # would go unseen by the driver — always re-check them locally
        names += [n for n in qs if n not in osql and n not in names]
        # likewise always include the code-changed greens pinned for
        # re-verification, even if the window ordering would already put
        # them up front (belt and braces: the sim must never report green
        # while a force-recheck name goes unexecuted)
        from spark_bam_spark.queries import _FORCE_RECHECK

        names += [n for n in _FORCE_RECHECK if n in qs and n not in names]

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    ok = bad = rows_only = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            cols = list(df.columns)
            srows = [tuple(r) for r in df.collect()]
            if name not in osql:
                # rows-only: "ran" is not "verified" — demand >0 rows so an
                # empty/garbage result can't print PASS vacuously
                status, detail = len(srows) > 0, f"rows-only ({len(srows)} rows)"
            else:
                res = con.sql(osql[name])
                dcols, drows = list(res.columns), res.fetchall()
                status = (
                    sorted(cols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and _keyed(cols, srows) == _keyed(dcols, drows)
                )
                detail = f"hash ({len(srows)} rows)"
        except Exception as e:  # noqa: BLE001 — report and continue, like the driver
            status, detail = False, f"ERROR {e!r}"[:200]
        if status:
            ok += 1
            if name not in osql:
                rows_only += 1
        else:
            bad += 1
        print(("PASS" if status else "FAIL"), name, detail, flush=True)
    print(
        f"window green: {ok}/{len(names)}, bad: {bad}"
        f" (hash-verified: {ok - rows_only}, rows-only: {rows_only})"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
