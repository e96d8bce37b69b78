"""Re-derive the adaptive split-size default for the JVM BAM reader.

The adaptive policy (explicit option absent) was tuned in r7 on the
PYTHON source's ~100k reads/s/core ceiling: ``total / (4 tasks x cores)``
clamped to [4 MiB, 64 MiB].  The JVM DSv2 reader decodes ~3x faster per
core, which moves the fixed-overhead/parallelism trade — r8 verdict
order #4 asks for the default to be re-measured through the JVM path
rather than inherited.

Discipline (VERIFICATION_r8 §4a): one fresh process per (split_size,
width) cell; only per-process minima are decision-grade.  Run on an
idle box.

Usage:
    python tools/run_jvm_split_sweep.py [--big] [--repeat 3]
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
repo, split_size, width, path, n_reads, repeat = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]), int(sys.argv[6])
)
sys.path.insert(0, repo)
from spark_bam_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("jvm-split-cell")
spark.sparkContext.setLogLevel("ERROR")
from spark_bam_spark.bam.jvmreader import read_bam_jvm
kw = {} if split_size == "adaptive" else {"split_size": int(split_size)}
df = read_bam_jvm(spark, path, **kw)
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
row = df.agg(*agg).collect()[0]  # warm: plan + JIT
assert row["n"] == n_reads, (row["n"], n_reads)
times = []
for _ in range(repeat):
    t0 = time.time()
    df.agg(*agg).collect()
    times.append(time.time() - t0)
print("CELL " + json.dumps({
    "split_size": split_size, "width": width, "n_reads": n_reads,
    "tasks": df.rdd.getNumPartitions(),
    "min_s": round(min(times), 3), "times": [round(t, 3) for t in times],
    "reads_per_s": round(n_reads / min(times)),
}))
spark.stop()
"""

SIZES = ["1048576", "4194304", "8388608", "16777216", "33554432", "67108864",
         "134217728", "adaptive"]


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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="sweep the 20M-record fixture")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    ensure_fixtures(args.big)
    path, n = (FIXTURE_20M, 20_000_000) if args.big else (FIXTURE_1M, 1_000_000)
    print(json.dumps({"fixture": path, "bytes": os.path.getsize(path)}))
    for width in ("narrow", "full"):
        for size in SIZES:
            proc = subprocess.run(
                [sys.executable, "-c", _CELL, REPO, size, width, path,
                 str(n), str(args.repeat)],
                capture_output=True, text=True,
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("CELL ")), None
            )
            if line is None:
                print(f"cell FAILED split={size} width={width}", file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                return 1
            print(line[5:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
