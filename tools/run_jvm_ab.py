"""A/B the JVM DataSourceV2 BAM reader against the Python Data Source.

The Python source's end-to-end ceiling is ~100k reads/s/core (r7
measurement, tools/run_ds_ceiling.py): numpy decode rate minus the
Arrow worker-boundary cost — the one structural perf-weak item left
open by the r7 verdict.  The JVM twin (bam/jvmsrc/bamjvm/) removes the
boundary entirely; this tool measures both readers on the same fixtures
with the same aggregates.

Discipline (r8 §4a): one fresh process per (reader, width, fixture)
cell — shared-session cells drift; only per-process numbers are
decision-grade.  Run on an idle box.

Usage:
    python tools/run_jvm_ab.py [--big] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_1M = "/tmp/spark_bam_spark_fixture/scan1m.bam"
FIXTURE_20M = "/tmp/spark_bam_spark_fixture/scan20m.bam"

_CELL = r"""
import json, sys, time
repo, reader, width, path, n_reads, repeat = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]), int(sys.argv[6])
)
sys.path.insert(0, repo)
from spark_bam_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("jvm-ab-cell")
spark.sparkContext.setLogLevel("ERROR")

if reader == "py":
    from spark_bam_spark.bam.datasource import register as reg
    reg(spark)
    df = spark.read.format("bam").load(path)
else:
    from spark_bam_spark.bam.jvmreader import read_bam_jvm
    df = read_bam_jvm(spark, path)

if width == "narrow":
    df = df.select("pos")
    agg = [F.count("*").alias("n"), F.sum("pos").alias("p")]
else:
    agg = [
        F.count("*").alias("n"),
        F.sum("seq_len").alias("bases"),
        F.sum(F.length("qual")).alias("quals"),
        F.count_distinct("rname").alias("contigs"),
    ]

row = df.agg(*agg).collect()[0]  # warm: plan + JIT/imports
assert row["n"] == n_reads, (row["n"], n_reads)
times = []
for _ in range(repeat):
    t0 = time.time()
    df.agg(*agg).collect()
    times.append(time.time() - t0)
print("CELL " + json.dumps({
    "reader": reader, "width": width, "n_reads": n_reads,
    "min_s": round(min(times), 3), "times": [round(t, 3) for t in times],
    "reads_per_s": round(n_reads / min(times)),
}))
spark.stop()
"""


def ensure_fixtures(big: bool) -> None:
    from spark_bam_spark.queries.bam_qa import _BIG_FIXTURE, _tile_bam
    from spark_bam_spark.bam.writer import make_fixture

    if not os.path.exists(_BIG_FIXTURE):
        os.makedirs(os.path.dirname(_BIG_FIXTURE), exist_ok=True)
        make_fixture(_BIG_FIXTURE, n=50000, block_payload=0xFF00)
    if not os.path.exists(FIXTURE_1M):
        _tile_bam(_BIG_FIXTURE, FIXTURE_1M, tiles=20)
    if big and not os.path.exists(FIXTURE_20M):
        _tile_bam(_BIG_FIXTURE, FIXTURE_20M, tiles=400)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="include the 20M-record fixture")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    ensure_fixtures(args.big)

    fixtures = [(FIXTURE_1M, 1_000_000)]
    if args.big:
        fixtures.append((FIXTURE_20M, 20_000_000))
    results = []
    for path, n in fixtures:
        for width in ("narrow", "full"):
            for reader in ("py", "jvm"):
                proc = subprocess.run(
                    [sys.executable, "-c", _CELL, REPO, reader, width, path,
                     str(n), str(args.repeat)],
                    capture_output=True, text=True,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("CELL ")), None
                )
                if line is None:
                    print(f"cell FAILED reader={reader} width={width} n={n}", file=sys.stderr)
                    print(proc.stderr[-2000:], file=sys.stderr)
                    return 1
                cell = json.loads(line[5:])
                results.append(cell)
                print(json.dumps(cell))
    # speedup summary per (fixture, width)
    for n in {r["n_reads"] for r in results}:
        for width in ("narrow", "full"):
            pair = {r["reader"]: r for r in results if r["n_reads"] == n and r["width"] == width}
            if len(pair) == 2:
                print(json.dumps({
                    "n_reads": n, "width": width,
                    "jvm_speedup": round(pair["py"]["min_s"] / pair["jvm"]["min_s"], 2),
                }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
