"""Round-17 micro A/B: curation_pipeline_funnel's shared `grams.distinct()`
is redundant — the bench side re-distincts on s and the contamination
side ends in .distinct() on doc_id, so dropping the shared distinct
removes a full exchange of the corpus gram stream from the contamination
branch (the broadcast join needs no distribution) without changing the
contaminated-doc set.

Times the contamination branch (noop sink) with and without the shared
distinct, interleaved min-of-N; asserts the contaminated doc_id sets are
identical.

Usage: python tools/r17_funnel_distinct_micro.py [--sf-dir DIR] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.queries.curation import BENCH_DOC_MAX, DECON_N
from spark_bam_spark.session import get_spark
from spark_bam_spark.tables import fan_out, table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("r17-funnel-distinct-micro")

    def grams(distinct: bool):
        d = fan_out(table(spark, args.sf_dir, "documents").select("doc_id", "text", "n_chars"))
        corpus = d.unionAll(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "n_chars"
            )
        )
        g = corpus.select("doc_id", F.split("text", " ").alias("w")).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"if(size(w) < {DECON_N}, array(),"
                    f" transform(sequence(1, size(w) - {DECON_N - 1}),"
                    " i -> concat_ws(' ', slice(w, i, 5))))"
                )
            ).alias("s"),
        )
        return g.distinct() if distinct else g

    def contaminated(distinct: bool):
        g = grams(distinct)
        bench = g.filter(F.col("doc_id") < BENCH_DOC_MAX).select("s").distinct()
        return (
            g.filter(F.col("doc_id") >= BENCH_DOC_MAX)
            .join(F.broadcast(bench), "s")
            .select("doc_id")
            .distinct()
        )

    a = sorted(r[0] for r in contaminated(True).collect())
    b = sorted(r[0] for r in contaminated(False).collect())
    print(f"identity: contaminated sets equal = {a == b}  n = {len(a)}")
    assert a == b

    for _ in range(2):
        contaminated(True).write.format("noop").mode("overwrite").save()
        contaminated(False).write.format("noop").mode("overwrite").save()

    t = {True: [], False: []}
    for i in range(args.iters):
        for distinct in (True, False):
            spark.sparkContext.setJobDescription(f"funnel-distinct:{distinct}:{i}")
            t0 = time.perf_counter()
            contaminated(distinct).write.format("noop").mode("overwrite").save()
            t[distinct].append(time.perf_counter() - t0)
    print(f"shared distinct (current): min={min(t[True]):.3f} all={[round(x,3) for x in t[True]]}")
    print(f"no shared distinct       : min={min(t[False]):.3f} all={[round(x,3) for x in t[False]]}")
    spark.stop()


if __name__ == "__main__":
    main()
