"""Scale-ratio probe: time every headline-tier query at two dirs
(default sf0.1 and the gen_scale.py 10x sf1) in one session and report
wall-clock growth at 10x data.

A ratio near 1 means fixed overhead dominates at this scale; near 10 is
linear work; >10 flags superlinear growth that would bite at 100 TB.
Prints one JSON line per query and a summary; findings feed
VERIFICATION_r*.md.

Usage:
    python tools/gen_scale.py --tiles 10      # once
    python tools/run_scale_ratio.py [--small /root/testdata/sf0.1]
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

    from spark_bam_spark.queries import load_all
    from spark_bam_spark.session import get_spark

    registry = load_all()
    names = sorted(n for n, s in registry.items() if s.headline or s.headline2)
    # non-headline queries whose scale behavior the verification record
    # tracks: the r7 chunking contract (expected ~linear — the explode
    # factor is a constant), its r8 IVF retrieval composition, and the
    # two-level SemDeDup whose checkpoint decision rests on these ratios
    names += [
        n
        for n in (
            "doc_chunk_windows",
            "chunk_dedup_stats",
            "chunk_embed_ivf_topk",
            "semdedup_prune_ivf",
            "decontamination_ngram_overlap",
        )
        if n in registry and n not in names
    ]
    spark = get_spark("scale-ratio")

    def best_of(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name in names:
        # interleave warm-up via the first timed run; min-of-N absorbs it
        small = best_of(name, args.small)
        big = best_of(name, args.big)
        ratio = round(big / small, 2) if small > 0 else None
        row = {
            "q": name,
            "small_s": round(small, 3),
            "big_s": round(big, 3),
            "ratio_at_10x": ratio,
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    flagged = [r["q"] for r in rows if r["ratio_at_10x"] and r["ratio_at_10x"] > 10]
    print(
        json.dumps(
            {
                "summary": True,
                "small": args.small,
                "big": args.big,
                "superlinear": flagged,
                "median_ratio": sorted(r["ratio_at_10x"] for r in rows)[len(rows) // 2],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
