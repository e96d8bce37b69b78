"""A/B probe: does truncating lineage at the coarse (vec_id, g, rn)
assignment pay off in semdedup_prune_ivf?

The r7 plan audit found the coarse subtree (2 O(n·√K) DECIMAL distance
passes) re-evaluating ~4x in-plan (52 exchanges, 12 broadcast distance
passes).  The checkpoint payload is ~24 B/row — opposite economics from
the rejected LSH shingle checkpoint — but the rule is measure, don't
assume: this script times both settings at sf0.1 and the gen_scale.py
10x/30x dirs in one session and prints a JSON line per (dir, setting).

Usage:
    python tools/gen_scale.py --tiles 10   # once (and --tiles 3 out sf3
    python tools/run_ivf_ckpt_ab.py [--repeat 5] [--big-repeat 2]
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
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--big-repeat", type=int, default=2)
    ap.add_argument(
        "--dirs",
        default="/root/testdata/sf0.1,/tmp/spark_bam_spark_scale/sf1,/tmp/spark_bam_spark_scale/sf3",
    )
    ap.add_argument(
        "--modes",
        default="off,pairs,mem,memw",
        help="comma list; run one mode per process for session-drift-free cells",
    )
    args = ap.parse_args()

    from spark_bam_spark.queries import mlprep
    from spark_bam_spark.session import get_spark

    spark = get_spark("ivf-ckpt-ab")
    results = []
    for sf_dir in args.dirs.split(","):
        if not os.path.isdir(sf_dir):
            print(json.dumps({"dir": sf_dir, "skipped": "missing"}))
            continue
        reps = args.repeat if "sf0.1" in sf_dir else args.big_repeat
        for setting in args.modes.split(","):
            os.environ["SPARK_GRAFT_SEMDEDUP_IVF_CKPT"] = setting
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = mlprep.semdedup_prune_ivf(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            row = {
                "dir": sf_dir,
                "ckpt": setting,
                "best_s": round(min(samples), 2),
                "all_s": [round(s, 2) for s in samples],
                "rows": n,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    spark.stop()
    # summary: per dir, speedup of each checkpoint variant vs off
    by_dir: dict[str, dict[str, float]] = {}
    for r in results:
        by_dir.setdefault(r["dir"], {})[r["ckpt"]] = r["best_s"]
    for d, v in by_dir.items():
        if "off" in v:
            summ = {"dir": d}
            for m in ("pairs", "mem"):
                if m in v and v[m] > 0:
                    summ[f"speedup_{m}"] = round(v["off"] / v[m], 2)
            print(json.dumps(summ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
