"""Round-17 micro-profiler: where does semdedup_prune_fast's per-invocation
wall time go?  Splits DataFrame CONSTRUCTION (pure Python + py4j), driver
ANALYSIS/OPTIMIZATION/PLANNING (forced via queryExecution phases), and
EXECUTION (collect), per stage of the pipeline.

Usage: python tools/r17_semdedup_micro.py [--sf-dir DIR] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.queries import load_all
from spark_bam_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    reg = load_all()
    spark = get_spark("r17-semdedup-micro")
    spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").count()
    # warm codegen/workers like bench.py
    for _ in range(2):
        reg["semdedup_prune_fast"].fn(spark, "/root/testdata/sf0.001").collect()
        reg["semdedup_prune_ivf"].fn(spark, "/root/testdata/sf0.001").collect()

    import spark_bam_spark.queries.mlprep as M

    def phases(df, label):
        qe = df._jdf.queryExecution()
        t0 = time.perf_counter()
        qe.analyzed()
        t1 = time.perf_counter()
        qe.optimizedPlan()
        t2 = time.perf_counter()
        qe.executedPlan()
        t3 = time.perf_counter()
        print(f"    {label:28s} analyze={t1-t0:6.3f} optimize={t2-t1:6.3f} plan={t3-t2:6.3f}")

    for it in range(args.iters):
        print(f"-- iter {it} : semdedup_prune_fast decomposition --")
        t0 = time.perf_counter()
        corpus, kk = M._semdedup_corpus(spark, args.sf_dir)
        t1 = time.perf_counter()
        c0 = (
            corpus.crossJoin(F.broadcast(kk))
            .filter(F.col("vec_id") < F.col("k"))
            .select(F.col("vec_id").alias("cluster"), F.col("v").alias("c"))
        )
        a1 = M._assign(corpus, c0)
        t2 = time.perf_counter()
        sums = [
            F.sum(F.expr(f"cast(v[{i}] as {M._DEC})")).alias(f"s{i}") for i in range(M.EMB_DIM)
        ]
        cent1 = (
            a1.groupBy("cluster")
            .agg(F.count("*").alias("n"), *sums)
            .select(
                "cluster",
                F.array(
                    *[(F.col(f"s{i}").cast("double") / F.col("n")) for i in range(M.EMB_DIM)]
                ).alias("c"),
            )
        )
        a2 = M._assign(corpus, cent1)
        t3 = time.perf_counter()
        scored = M._score_clusters_numpy(a2)
        t4 = time.perf_counter()
        # r17 A/B: the new single-parsed-expression centroid update
        t4b = time.perf_counter()
        a2_new = M._assign(corpus, M._centroid_update(a1, "cluster"))
        t4c = time.perf_counter()
        print(
            f"  construct: corpus={t1-t0:6.3f} assign1={t2-t1:6.3f} "
            f"cent+assign2(OLD shape)={t3-t2:6.3f} scorewrap={t4-t3:6.3f} "
            f"cent+assign2(NEW helper)={t4c-t4b:6.3f}"
        )
        phases(a1, "a1 (first assign)")
        phases(a2, "a2 (full assign chain)")
        phases(scored, "scored (full query)")
        t5 = time.perf_counter()
        scored.collect()
        t6 = time.perf_counter()
        print(f"  execute(collect after planning) = {t6-t5:6.3f}")
        # whole-query fresh timing for reference
        t7 = time.perf_counter()
        reg["semdedup_prune_fast"].fn(spark, args.sf_dir).collect()
        t8 = time.perf_counter()
        print(f"  fresh fn().collect()            = {t8-t7:6.3f}")

    print("-- semdedup_prune_ivf fresh timings --")
    for it in range(args.iters):
        t0 = time.perf_counter()
        df = reg["semdedup_prune_ivf"].fn(spark, args.sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        print(f"  iter {it}: build={t1-t0:6.3f} exec={t2-t1:6.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
