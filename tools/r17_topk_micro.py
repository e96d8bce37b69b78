"""Round-17 micro A/B: topk_revenue_orders' partial aggregate runs on the
single-split serial scan stage (150k groups from 600k rows — combine
ratio only ~4:1), so most of the query is one task building a 150k-key
DECIMAL sum map.  Candidate shapes:

  current : scan -> partial agg (serial) -> Exchange(150k rows) -> final
  keyed   : scan -> repartition(N, l_orderkey) (serial map write of 600k
            narrow rows) -> partial+final agg (parallel, exchange reused)
  fanout  : scan -> round-robin repartition -> partial agg (parallel) ->
            Exchange -> final (TWO exchanges; the pricing_summary A/B
            shape that lost there)

All three compute the identical exact DECIMAL sums.  Interleaved
min-of-N with the noop sink... except TakeOrdered collects 10 rows; we
run the full query with .collect() exactly like the bench.

Usage: python tools/r17_topk_micro.py [--sf-dir DIR] [--iters 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.session import get_spark
from spark_bam_spark.tables import table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()

    spark = get_spark("r17-topk-micro")
    target = spark.sparkContext.defaultParallelism

    def base():
        li = table(spark, args.sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        return li

    rev = (F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    ))

    def agg(df):
        return (
            df.groupBy("l_orderkey")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
        )

    shapes = {
        "current": lambda: agg(base()),
        "keyed": lambda: agg(base().repartition(target, "l_orderkey")),
        "fanout": lambda: agg(base().repartition(target)),
    }

    # identity check
    ref = [tuple(r) for r in shapes["current"]().collect()]
    for name, build in shapes.items():
        got = [tuple(r) for r in build().collect()]
        print(f"identity {name}: match={got == ref}")
        assert got == ref, name

    for _ in range(2):
        for build in shapes.values():
            build().collect()

    times = {k: [] for k in shapes}
    for i in range(args.iters):
        for name, build in shapes.items():
            spark.sparkContext.setJobDescription(f"topk-micro:{name}:{i}")
            t0 = time.perf_counter()
            build().collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name:8s} min={min(ts):.3f} all={[round(x, 3) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
