"""A/B the JVM DSv2 BAM writer against the Python Data Source writer.

Both writers stream into a fixed block_payload-byte staging buffer
(since r11 the Python side does too, via StreamingBamEncoder); the
remaining gap is the per-row Python boundary (``row.asDict()`` + pure-
Python record encode) vs the JVM sink encoding in the executor JVM.
This measures the end-to-end write wall time (input pre-cached, so the
scan cost is excluded from the timed region) with one fresh process per
writer cell — the same decision-grade discipline as tools/run_jvm_ab.py.

Usage:
    python tools/run_jvm_write_ab.py [--n 1000000] [--repeat 3]
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

_CELL = r"""
import json, shutil, sys, tempfile, time
repo, writer, path, n_reads, repeat = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
)
sys.path.insert(0, repo)
from spark_bam_spark.session import get_spark
spark = get_spark("jvm-write-ab-cell")
spark.sparkContext.setLogLevel("ERROR")

from spark_bam_spark.bam.reader import read_bam, write_bam_df
from spark_bam_spark.bam.writer import CONTIG_NAMES, CONTIG_LENGTHS

contigs = ",".join(f"{n}:{l}" for n, l in zip(CONTIG_NAMES, CONTIG_LENGTHS))
df = read_bam(spark, path).repartition(32).persist()
assert df.count() == n_reads

times = []
for _ in range(repeat + 1):  # first rep is the warmup (plan + JIT/imports)
    out = tempfile.mkdtemp(prefix="write_ab_")
    t0 = time.time()
    write_bam_df(df, out, contigs=contigs, writer=writer)
    times.append(time.time() - t0)
    shutil.rmtree(out, ignore_errors=True)
times = times[1:]
print("CELL " + json.dumps({
    "writer": writer, "n_reads": n_reads,
    "min_s": round(min(times), 3), "times": [round(t, 3) for t in times],
    "records_per_s": round(n_reads / min(times)),
}))
spark.stop()
"""


def ensure_fixture() -> None:
    from spark_bam_spark.bam.writer import make_fixture
    from spark_bam_spark.queries.bam_qa import _BIG_FIXTURE, _tile_bam

    if not os.path.exists(_BIG_FIXTURE):
        os.makedirs(os.path.dirname(_BIG_FIXTURE), exist_ok=True)
        make_fixture(_BIG_FIXTURE, n=50000, block_payload=0xFF00)
    if not os.path.exists(FIXTURE_1M):
        _tile_bam(_BIG_FIXTURE, FIXTURE_1M, tiles=20)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    ensure_fixture()

    results = []
    for writer in ("py", "jvm"):
        proc = subprocess.run(
            [sys.executable, "-c", _CELL, REPO, writer, FIXTURE_1M,
             str(args.n), str(args.repeat)],
            capture_output=True, text=True,
        )
        line = next((l for l in proc.stdout.splitlines() if l.startswith("CELL ")), None)
        if line is None:
            print(f"cell FAILED writer={writer}", file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        cell = json.loads(line[5:])
        results.append(cell)
        print(json.dumps(cell))
    pair = {r["writer"]: r for r in results}
    print(json.dumps({
        "n_reads": args.n,
        "jvm_write_speedup": round(pair["py"]["min_s"] / pair["jvm"]["min_s"], 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
