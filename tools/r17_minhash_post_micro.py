"""Round-17 micro A/B: minhash_jaccard_estimate's posting-list build runs
`_shingles(distinct=True)` (a full distinct shuffle of the (doc, s)
stream) BEFORE `groupBy(s).agg(collect_set(doc_id))` — but collect_set
already deduplicates doc ids within each shingle's set, so the distinct
pass is a redundant second shuffle of the stream.

Times the posting-frame build (groupBy + collect + localCheckpoint-style
materialization via noop) with and without the distinct pass,
interleaved min-of-N, and asserts the posting frames are identical.

Usage: python tools/r17_minhash_post_micro.py [--sf-dir DIR] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.queries.dedup import _shingles
from spark_bam_spark.session import get_spark
from spark_bam_spark.tables import table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("r17-minhash-post-micro")

    def post(distinct: bool):
        sh = _shingles(table(spark, args.sf_dir, "documents"), distinct=distinct)
        return sh.groupBy("s").agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))

    a = sorted(map(tuple, post(True).collect()))
    b = sorted(map(tuple, post(False).collect()))
    print(f"identity: frames equal = {a == b}  rows = {len(a)}")
    assert a == b

    for _ in range(2):
        post(True).write.format("noop").mode("overwrite").save()
        post(False).write.format("noop").mode("overwrite").save()

    t = {True: [], False: []}
    for i in range(args.iters):
        for distinct in (True, False):
            spark.sparkContext.setJobDescription(f"minhash-post:{distinct}:{i}")
            t0 = time.perf_counter()
            post(distinct).write.format("noop").mode("overwrite").save()
            t[distinct].append(time.perf_counter() - t0)
    print(f"distinct=True  (current): min={min(t[True]):.3f} all={[round(x,3) for x in t[True]]}")
    print(f"distinct=False (direct) : min={min(t[False]):.3f} all={[round(x,3) for x in t[False]]}")
    spark.stop()


if __name__ == "__main__":
    main()
