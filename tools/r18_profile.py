"""Round-17 optimization profiler: per-query timing breakdown + plan dump.

For each benched query (or names given on argv): time DataFrame
CONSTRUCTION separately from execution (construction includes driver-side
work like fan_out's footer reads / .rdd conversions — all inside the
bench's timed region), run min-of-N collects, and write
plans/r18/<name>_<tag>.txt with explain('formatted').

Usage: python tools/r18_profile.py [--tag before] [--repeat 3] [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_bam_spark.queries import load_all
from spark_bam_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    if args.names:
        names = args.names
    else:
        names = sorted(n for n, s in registry.items() if s.headline or s.headline2)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("r18-profile")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    # warm codegen/workers at sf0.001 like bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != args.sf_dir:
        for _ in range(2):
            for n in names:
                try:
                    registry[n].fn(spark, warm).collect()
                except Exception:
                    pass

    print(f"{'query':34s} {'build_s':>8s} {'first_s':>8s} {'min_s':>8s} {'med_s':>8s}")
    for n in names:
        spec = registry[n]
        spark.sparkContext.setJobDescription(f"r18:{n}")
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf_dir)
        build = time.perf_counter() - t0
        if not args.no_plans:
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{n}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        t0 = time.perf_counter()
        df.collect()
        first = time.perf_counter() - t0
        samples = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        print(
            f"{n:34s} {build:8.3f} {first:8.3f} {min(samples):8.3f} "
            f"{statistics.median(samples):8.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
