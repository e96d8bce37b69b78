"""Quantify the Python DataSource ceiling (r6 verdict order #6).

The BAM scan path runs in Python workers (the Python Data Source API has
no JVM fast path), so its throughput ceiling is numpy decode rate x
cores, minus Arrow-boundary and task overheads.  This probe measures
reads/s and reads/s/core on the 1M-record fixture (and a 20M synthetic
with --big) across the two knobs a deployment can actually turn:

- ``batch_records`` (reader option): records per emitted Arrow batch.
  NOTE: spark.sql.execution.arrow.maxRecordsPerBatch does NOT apply —
  the Data Source yields its own RecordBatches, so the sweep drives the
  reader option instead.
- ``split_size``: compressed bytes per planned partition (fan-out).

plus a worker-count ramp (--ramp: subprocesses at local[4/8/16/32])
that separates fixed startup overhead from per-core scaling.

Output: one JSON line per cell; findings land in VERIFICATION_r*.md.

Usage:
    python tools/run_ds_ceiling.py [--big] [--ramp] [--repeat 3]
    python tools/run_ds_ceiling.py --one          # single default cell
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_1M = "/tmp/spark_bam_spark_fixture/scan1m.bam"
FIXTURE_20M = "/tmp/spark_bam_spark_fixture/scan20m.bam"
N_1M = 1_000_000
N_20M = 20_000_000


def ensure_fixtures(big: bool) -> None:
    from spark_bam_spark.bam.writer import make_fixture
    from spark_bam_spark.queries.bam_qa import _BIG_FIXTURE, _tile_bam

    if not os.path.exists(_BIG_FIXTURE):
        os.makedirs(os.path.dirname(_BIG_FIXTURE), exist_ok=True)
        make_fixture(_BIG_FIXTURE, n=50000, block_payload=0xFF00)
    if not os.path.exists(FIXTURE_1M):
        _tile_bam(_BIG_FIXTURE, FIXTURE_1M, tiles=20)
    if big and not os.path.exists(FIXTURE_20M):
        _tile_bam(_BIG_FIXTURE, FIXTURE_20M, tiles=400)


def time_scan(spark, path: str, n_reads: int, split_size: int, batch_records: int, repeat: int) -> dict:
    from pyspark.sql import functions as F

    from spark_bam_spark.bam.datasource import register as reg

    reg(spark)
    best = float("inf")
    for _ in range(repeat + 1):  # first run warms caches; min absorbs it
        t0 = time.perf_counter()
        got = (
            spark.read.format("bam")
            .option("split_size", split_size)
            .option("batch_records", batch_records)
            .load(path)
            .agg(
                F.count("*").alias("n"),
                F.sum("seq_len").alias("b"),
                F.sum(F.length("qual")).alias("q"),
            )
            .collect()[0]
        )
        assert got["n"] == n_reads, (got["n"], n_reads)
        best = min(best, time.perf_counter() - t0)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nparts = (os.path.getsize(path) + split_size - 1) // split_size
    return {
        "fixture": os.path.basename(path),
        "cpus": cpus,
        "split_mb": split_size >> 20,
        "n_partitions": int(nparts),
        "batch_records": batch_records,
        "wall_s": round(best, 3),
        "reads_per_s": int(n_reads / best),
        "reads_per_s_core": int(n_reads / best / cpus),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="also probe the 20M fixture")
    ap.add_argument("--ramp", action="store_true", help="worker-count ramp via subprocesses")
    ap.add_argument("--one", action="store_true", help="single default cell (ramp worker)")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    ensure_fixtures(args.big)
    from spark_bam_spark.session import get_spark

    spark = get_spark("ds-ceiling")

    if args.one:
        print(json.dumps(time_scan(spark, FIXTURE_1M, N_1M, 1 << 22, 16384, args.repeat)), flush=True)
        spark.stop()
        return 0

    targets = [(FIXTURE_1M, N_1M)] + ([(FIXTURE_20M, N_20M)] if args.big else [])
    for path, n in targets:
        for batch in (4096, 16384, 65536):
            row = time_scan(spark, path, n, 1 << 22, batch, args.repeat)
            print(json.dumps(row), flush=True)
        for split in (1 << 20, 1 << 22, 1 << 24):
            row = time_scan(spark, path, n, split, 16384, args.repeat)
            print(json.dumps(row), flush=True)
    spark.stop()

    if args.ramp:
        for cpus in (4, 8, 16, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", f"--repeat={args.repeat}"],
                env=env,
                check=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
