"""Per-repetition bench trace: for each named query run N timed reps
(same methodology as bench.py) and print, per rep, wall seconds plus the
JVM GC-time delta and job-count delta during the rep — to attribute the
min-vs-median spread seen on this box (slow reps = GC pauses? extra
jobs? Python-worker respawn?).

Usage: python tools/r17_rep_trace.py [--repeat 7] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_bam_spark.queries import load_all
from spark_bam_spark.session import get_spark


def _gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def _job_count(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=7)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    names = args.names or sorted(n for n, s in registry.items() if s.headline or s.headline2)

    spark = get_spark("r17-rep-trace")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != args.sf_dir:
        for _ in range(2):
            for n in names:
                try:
                    registry[n].fn(spark, warm).collect()
                except Exception:
                    pass

    heap = spark._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    for n in names:
        spec = registry[n]
        spark.sparkContext.setJobDescription(f"trace:{n}")
        rows = []
        for r in range(args.repeat):
            gc0, t0 = _gc_ms(spark), time.perf_counter()
            spec.fn(spark, args.sf_dir).collect()
            wall = time.perf_counter() - t0
            gcd = _gc_ms(spark) - gc0
            used = heap.getHeapMemoryUsage().getUsed() / (1 << 30)
            rows.append((wall, gcd, used))
        print(f"== {n}")
        for r, (wall, gcd, used) in enumerate(rows):
            print(f"  rep{r}: wall={wall:7.3f}s  gc_delta={gcd:7.0f}ms  heap_used={used:5.2f}g")
    spark.stop()


if __name__ == "__main__":
    main()
