"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE
JSON line with total + per-query seconds."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_bam_spark.queries import load_all
from spark_bam_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.headline}

    spark = get_spark("spark_bam_spark-bench")
    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # warm whole-stage codegen per query at the smallest SF so the timed
    # runs measure data-proportional work, not first-run JIT compilation.
    # Two passes: the Python-datasource scans also need their executor-side
    # worker pool (fork + numpy/pyarrow import x cores) fully spun up, which
    # one pass doesn't finish — measured ramp 12.9s/4.8s/2.4s/2.2s for the
    # 1M-record scan.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for _ in range(2):
            for spec in headline.values():
                try:
                    spec.fn(spark, warm_dir).collect()
                except Exception:
                    pass

    # min-of-N (default 2): steadier numbers at modest wall-clock cost;
    # override with SPARK_GRAFT_BENCH_REPEAT
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
    timings: dict[str, float] = {}
    for name, spec in headline.items():
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
