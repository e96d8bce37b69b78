"""Job-level decomposition of one query invocation (default
semdedup_prune_ivf) via the Spark UI REST API: per-job wall time, task
count, and the DRIVER GAP between consecutive jobs (construction /
analysis / broadcast-build time that no stage shows).  Guide §1/§7.1 —
find which of the ~8 sequential barriers actually cost."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_bam_spark.queries import load_all  # noqa: E402
from spark_bam_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "semdedup_prune_ivf"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark("r18-job-trace")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        reg[qname].fn(spark, "/root/testdata/sf0.001").collect()
    # one warm pass at the measured scale so JIT/AQE state matches the
    # bench's min-of-5 steady state
    reg[qname].fn(spark, sf_dir).collect()

    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
        seen = {j["jobId"] for j in json.load(r)}

    spark.sparkContext.setJobDescription(f"r18-trace:{qname}")
    t0 = time.perf_counter()
    reg[qname].fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)

    with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
        jobs = [j for j in json.load(r) if j["jobId"] not in seen]
    jobs.sort(key=lambda j: j["jobId"])
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        stage_names = {s["stageId"]: s["name"].split("\n")[0] for s in json.load(r)}

    def ms(s: str) -> float:
        from datetime import datetime

        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    print(f"query={qname} wall={wall:.3f}s n_jobs={len(jobs)}")
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    for j in jobs:
        sub, comp = ms(j["submissionTime"]), ms(j["completionTime"])
        gap = (sub - prev_end) if prev_end is not None else 0.0
        prev_end = comp
        total_job += comp - sub
        total_gap += max(gap, 0.0)
        names = " | ".join(
            stage_names.get(sid, "?") for sid in sorted(j["stageIds"])
        )
        print(
            f"  job {j['jobId']:>4} dur={comp - sub:6.3f}s gap_before={gap:6.3f}s "
            f"tasks={j['numTasks']:>4} stages={len(j['stageIds'])} [{names[:120]}]"
        )
    print(f"sum(job)={total_job:.3f}s sum(gap)={total_gap:.3f}s wall={wall:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
