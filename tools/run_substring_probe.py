"""Fixed-density decomposition probe for dedup_substring_spans (VERDICT
r11 #2 / r12 #1): the query's 10x wall ratio (3.11 in the r11 scale
table, the heaviest and only unexplained row) needs attribution —
output/work growth vs plan growth, same method as
run_minhash_density_probe.py.

gen_scale.py holds duplicate DENSITY constant by construction (each
tile re-tokenizes with a tile-private vocabulary, so duplicated spans
replicate per tile and never cross tiles).  The probe decomposes wall
clock into the query's work drivers —

  - n_docs, n_tokens                  (input volume: expect ~10x)
  - n_grams                           (exploded 8-gram stream: ~10x)
  - n_dup_gram_keys, n_dup_gram_rows  (window-survivor workload: ~10x)
  - max_gram_count                    (largest gram-window partition —
                                       skew guard: expect ~constant)
  - n_spans                           (output volume: ~10x)

and additionally brackets the two shuffle stages:

  - wall_gram_stage: explode -> count(*) over partitionBy(gram) ->
    filter c>=2 (the single gram-stream shuffle)
  - wall_total: the full registered query (adds the per-doc islands
    window, span agg, and the join back for span_hash)

If wall ratio <= work ratios the query is work-bound (the plan scales;
the 3.11 is parallel-efficiency catching up to the data, not a shuffle
pathology).  Wall ratio meaningfully above the work ratios flags a plan
problem.  Findings feed VERIFICATION_r13.md.

Usage:
    python tools/gen_scale.py --tiles 10      # once, if /tmp copy absent
    python tools/run_substring_probe.py [--small /root/testdata/sf0.1]
                                        [--big /tmp/spark_bam_spark_scale/sf1]
                                        [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/spark_bam_spark_scale/sf1")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_bam_spark.queries import load_all
    from spark_bam_spark.session import get_spark
    from spark_bam_spark.tables import fan_out, table

    registry = load_all()
    fn = registry["dedup_substring_spans"].fn
    spark = get_spark("substring-spans-probe")

    def gram_stream(sf_dir: str):
        # fan_out matches the query's own explode parallelization — without
        # it the bracket under-parallelizes the explode and measures the
        # scan partitioning, not the stage
        toks = (
            fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
            .select("doc_id", F.split("text", " ").alias("w"))
        )
        return toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "if(size(w) < 8, array(),"
                    " transform(sequence(1, size(w) - 7),"
                    " i -> struct(i AS i, array_join(slice(w, i, 8), ' ') AS gram)))"
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.i").alias("i"), F.col("p.gram").alias("gram"))

    def measure(sf_dir: str) -> dict:
        wall_total = float("inf")
        n_spans = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            n_spans = fn(spark, sf_dir).count()
            wall_total = min(wall_total, time.perf_counter() - t0)
        # stage bracket: the gram-stream shuffle alone (window count +
        # survivor filter), same expression tree as the query's dup stage
        wall_gram = float("inf")
        n_dup_rows = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            n_dup_rows = (
                gram_stream(sf_dir)
                .withColumn("c", F.count("*").over(W.partitionBy("gram")))
                .filter(F.col("c") >= 2)
                .count()
            )
            wall_gram = min(wall_gram, time.perf_counter() - t0)
        docs = table(spark, sf_dir, "documents")
        vol = docs.select(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        ).collect()[0]
        gstats = (
            gram_stream(sf_dir)
            .groupBy("gram")
            .agg(F.count("*").alias("c"))
            .agg(
                F.count("*").alias("n_gram_keys"),
                F.sum("c").alias("n_grams"),
                F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("n_dup_gram_keys"),
                F.max("c").alias("max_gram_count"),
            )
            .collect()[0]
        )
        return {
            "dir": sf_dir,
            "wall_total_s": round(wall_total, 3),
            "wall_gram_stage_s": round(wall_gram, 3),
            "n_docs": vol["n_docs"],
            "n_tokens": int(vol["n_tokens"]),
            "n_grams": int(gstats["n_grams"]),
            "n_gram_keys": int(gstats["n_gram_keys"]),
            "n_dup_gram_keys": int(gstats["n_dup_gram_keys"]),
            "n_dup_gram_rows": n_dup_rows,
            "max_gram_count": int(gstats["max_gram_count"]),
            "n_spans": n_spans,
        }

    small = measure(args.small)
    big = measure(args.big)
    print(json.dumps(small), flush=True)
    print(json.dumps(big), flush=True)

    def ratio(k: str) -> float | None:
        return round(big[k] / small[k], 2) if small.get(k) else None

    work_ratios = [
        ratio("n_tokens") or 0,
        ratio("n_grams") or 0,
        ratio("n_dup_gram_rows") or 0,
        ratio("n_spans") or 0,
    ]
    summary = {
        "summary": True,
        "wall_total_ratio": ratio("wall_total_s"),
        "wall_gram_stage_ratio": ratio("wall_gram_stage_s"),
        "tokens_ratio": ratio("n_tokens"),
        "grams_ratio": ratio("n_grams"),
        "dup_gram_rows_ratio": ratio("n_dup_gram_rows"),
        "spans_ratio": ratio("n_spans"),
        "max_gram_count_ratio": ratio("max_gram_count"),
        "verdict": (
            "work-bound (wall grows no faster than the gram/span work)"
            if (ratio("wall_total_s") or 0) <= max(work_ratios)
            else "plan-bound: wall outgrows the work drivers — investigate"
        ),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
