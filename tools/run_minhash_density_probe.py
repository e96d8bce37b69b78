"""Fixed-density decomposition probe for dedup_minhash_lsh (VERDICT r10
next-round #5): the query's 10x wall ratio (2.89 in the r10 table, the
heaviest row) needs attribution — output/work growth vs plan growth.

gen_scale.py already holds duplicate DENSITY constant by construction
(each tile's text is re-tokenized with a tile-private vocabulary, so
near-dup structure replicates per tile and never crosses tiles).  What
this probe adds is the decomposition: alongside wall clock it measures
the work drivers —

  - n_docs, n_shingles            (input volume: expect ~10x)
  - n_buckets_gt1, sum_bucket_pairs (candidate workload: expect ~10x)
  - n_out_pairs                   (output volume: expect ~10x)

If wall ratio <= work ratios the query is work-bound (the plan scales;
the 2.89 is parallel-efficiency catching up to the data, not a shuffle
pathology).  Wall ratio meaningfully above the work ratios would flag a
plan problem.  Findings feed VERIFICATION_r11.md.

Usage:
    python tools/gen_scale.py --tiles 10      # once, if /tmp copy absent
    python tools/run_minhash_density_probe.py [--small /root/testdata/sf0.1]
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

    from pyspark.sql import functions as F

    from spark_bam_spark.queries import load_all
    from spark_bam_spark.queries.dedup import LSH_DF_CAP, N_BANDS, _band_hash_col, _shingles
    from spark_bam_spark.session import get_spark
    from spark_bam_spark.tables import table

    registry = load_all()
    fn = registry["dedup_minhash_lsh"].fn
    spark = get_spark("minhash-density-probe")

    def measure(sf_dir: str) -> dict:
        best = float("inf")
        n_out = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            n_out = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        docs = table(spark, sf_dir, "documents")
        sh = _shingles(docs, distinct=False)
        hashed = sh.select(
            "doc_id", *[_band_hash_col(b).alias(f"h{b}") for b in range(N_BANDS)]
        )
        hubs = (
            hashed.groupBy("h0")
            .agg(F.count_distinct("doc_id").alias("df"))
            .filter(F.col("df") > LSH_DF_CAP)
            .select("h0")
        )
        sigs = hashed.join(F.broadcast(hubs), "h0", "left_anti").groupBy("doc_id").agg(
            *[F.min(F.col(f"h{b}")).alias(f"sig_{b}") for b in range(N_BANDS)]
        )
        stack_args = ", ".join(f"{b}, sig_{b}" for b in range(N_BANDS))
        mh = sigs.select(
            "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
        )
        bstats = (
            mh.groupBy("band", "sig")
            .agg(F.count("*").alias("k"))
            .filter(F.col("k") > 1)
            .agg(
                F.count("*").alias("n_buckets_gt1"),
                F.sum(F.expr("k * (k - 1) / 2")).cast("long").alias("sum_bucket_pairs"),
            )
            .collect()[0]
        )
        return {
            "dir": sf_dir,
            "wall_s": round(best, 3),
            "n_docs": docs.count(),
            "n_shingles": sh.count(),
            "n_buckets_gt1": bstats["n_buckets_gt1"],
            "sum_bucket_pairs": bstats["sum_bucket_pairs"],
            "n_out_pairs": n_out,
        }

    small = measure(args.small)
    big = measure(args.big)
    print(json.dumps(small), flush=True)
    print(json.dumps(big), flush=True)

    def ratio(k: str) -> float | None:
        return round(big[k] / small[k], 2) if small.get(k) else None

    summary = {
        "summary": True,
        "wall_ratio": ratio("wall_s"),
        "docs_ratio": ratio("n_docs"),
        "shingles_ratio": ratio("n_shingles"),
        "bucket_pairs_ratio": ratio("sum_bucket_pairs"),
        "out_pairs_ratio": ratio("n_out_pairs"),
        "verdict": (
            "work-bound (wall grows no faster than candidate/output work)"
            if ratio("wall_s") is not None
            and ratio("wall_s")
            <= max(ratio("sum_bucket_pairs") or 0, ratio("n_out_pairs") or 0)
            else "plan-bound: wall outgrows the work drivers — investigate"
        ),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
