"""Generic one-arm bench runner for interleaved worktree A/Bs: runs the
query names given on argv bench-faithfully (sf0.001 two-pass warmup,
min-of-5 build+collect at $SPARK_GRAFT_SF_DIR) in THIS checkout (the
repo the script file lives in) and prints one JSON line of per-query
min/med seconds."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_bam_spark.queries import load_all  # noqa: E402
from spark_bam_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "5"))
    reg = load_all()
    spark = get_spark("r18-quick-bench")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        for q in names:
            reg[q].fn(spark, "/root/testdata/sf0.001").collect()
    out = {
        "tree": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "load1": round(os.getloadavg()[0], 2),
    }
    for q in names:
        samples = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            reg[q].fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        out[q] = round(min(samples), 4)
        out[q + "_med"] = round(statistics.median(samples), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
