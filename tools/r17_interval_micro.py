"""Round-17 micro A/B: interval_overlap_join's BNLJ probe (31 interval
comparisons per event) + partial agg run on the serial single-split
events scan.  Does a round-robin fan_out of the 100k-row scan before the
broadcast join pay for itself?  (The downstream agg has ~62 groups —
high combine — so the pricing_summary lesson says the exchange may
lose; measure.)

Usage: python tools/r17_interval_micro.py [--sf-dir DIR] [--iters 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.session import get_spark
from spark_bam_spark.tables import fan_out, table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()

    spark = get_spark("r17-interval-micro")

    def dsum(c):
        return F.sum(F.col(c).cast("decimal(18,4)")).cast("double")

    def build(spread: bool):
        ev = table(spark, args.sf_dir, "events").select("ts", "event_type", "value")
        if spread:
            ev = fan_out(ev)
        days = spark.sql(
            "SELECT explode(sequence(timestamp'2024-01-01', timestamp'2024-01-31',"
            " interval 1 day)) AS day_start"
        )
        joined = ev.join(
            F.broadcast(days),
            (ev.ts >= days.day_start) & (ev.ts < days.day_start + F.expr("interval 1 day")),
        )
        return joined.groupBy(
            F.col("day_start").cast("date").alias("day"), "event_type"
        ).agg(F.count("*").alias("n"), dsum("value").alias("total_value"))

    ref = sorted(map(tuple, build(False).collect()))
    got = sorted(map(tuple, build(True).collect()))
    print(f"identity: match={got == ref}")
    assert got == ref

    for _ in range(2):
        build(False).collect()
        build(True).collect()

    t = {False: [], True: []}
    for i in range(args.iters):
        for spread in (False, True):
            spark.sparkContext.setJobDescription(f"interval-micro:{spread}:{i}")
            t0 = time.perf_counter()
            build(spread).collect()
            t[spread].append(time.perf_counter() - t0)
    print(f"current : min={min(t[False]):.3f} all={[round(x,3) for x in t[False]]}")
    print(f"fan_out : min={min(t[True]):.3f} all={[round(x,3) for x in t[True]]}")
    spark.stop()


if __name__ == "__main__":
    main()
