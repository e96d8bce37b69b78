"""One A/B arm for the r18 fan_out work_factor probe (VERDICT r17 #1).

Runs the three documents-scan fan_out consumers the driver flagged /
implicated (dedup_minhash_lsh, dedup_substring_spans,
minhash_jaccard_estimate) in a FRESH process, bench-faithful (sf0.001
two-pass warmup, min-of-5 build+collect at sf0.1), and prints one JSON
line of per-query mins.  AB_WF > 0 monkeypatches the dedup-module
fan_out binding (which _shingles and dedup_substring_spans call) with
that work_factor, so variant B raises the rows-derived spread floor
without editing the tree.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

wf = float(os.environ.get("AB_WF", "0"))

from spark_bam_spark import tables  # noqa: E402
from spark_bam_spark.queries import dedup, load_all  # noqa: E402
from spark_bam_spark.session import get_spark  # noqa: E402

if wf:
    _orig = tables.fan_out

    def _patched(df, *keys, work_factor=1.0, **kw):
        return _orig(df, *keys, work_factor=max(work_factor, wf), **kw)

    dedup.fan_out = _patched

QUERIES = ["dedup_minhash_lsh", "dedup_substring_spans", "minhash_jaccard_estimate"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("r18-dedup-spread-ab")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm = "/root/testdata/sf0.001"
    for _ in range(2):
        for q in QUERIES:
            registry[q].fn(spark, warm).collect()
    out = {"wf": wf, "load1": os.getloadavg()[0]}
    for q in QUERIES:
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            registry[q].fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        out[q] = round(min(samples), 4)
        out[q + "_med"] = round(statistics.median(samples), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
