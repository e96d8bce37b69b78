"""AQE plan/skew probe (r4 order #7): run the two headline tiers at a
scaled dir (default the gen_scale.py sf1 output) with AQE ON vs OFF,
time both, and record which executed plans AQE actually rewrites
(coalesced shuffle reads, broadcast-join conversions, skew-join splits).

Prints one JSON line per query:
  {"q": ..., "aqe_on_s": ..., "aqe_off_s": ..., "aqe_nodes": [...],
   "rewrote": bool}
and a trailing summary line.  Findings go into VERIFICATION_r6.md.

Usage:
    python tools/gen_scale.py --tiles 10       # once
    python tools/run_aqe_probe.py [--sf-dir /tmp/spark_bam_spark_scale/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# AQE-introduced physical nodes to look for in the final executed plan
_AQE_MARKERS = (
    "AQEShuffleRead",
    "coalesced",
    "skewed",
    "BroadcastQueryStage",
)


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_bam_spark_scale/sf1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from spark_bam_spark.queries import load_all
    from spark_bam_spark.session import get_spark

    registry = load_all()
    names = sorted(n for n, s in registry.items() if s.headline or s.headline2)

    spark = get_spark("aqe-probe")
    results = []
    for name in names:
        spec = registry[name]
        row = {"q": name}
        for aqe in (True, False):
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            best, plan = float("inf"), ""
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                df = spec.fn(spark, args.sf_dir)
                df.collect()
                best = min(best, time.perf_counter() - t0)
                plan = _final_plan(df)
            row["aqe_on_s" if aqe else "aqe_off_s"] = round(best, 3)
            if aqe:
                found = sorted(
                    {m for m in _AQE_MARKERS if re.search(m, plan, re.IGNORECASE)}
                )
                row["aqe_nodes"] = found
                row["rewrote"] = bool(found)
        print(json.dumps(row), flush=True)
        results.append(row)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    on = sum(r["aqe_on_s"] for r in results)
    off = sum(r["aqe_off_s"] for r in results)
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": args.sf_dir,
                "total_aqe_on_s": round(on, 2),
                "total_aqe_off_s": round(off, 2),
                "queries_rewritten": sum(1 for r in results if r["rewrote"]),
                "n_queries": len(results),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
