"""Round-17 micro A/B: curation_pipeline_funnel's gram subtree computes
`slice(split(text,' '), i, 5)` INSIDE the transform lambda — one split of
the full text per gram position (O(words^2) character work per doc),
where _shingles/decontamination bind `w = split(text,' ')` once per row.

Times the gram explode+distinct pass standalone (noop sink), inline-split
vs bound-w, interleaved min-of-N, and asserts the two produce identical
(doc_id, s) sets.

Usage: python tools/r17_funnel_micro.py [--sf-dir DIR] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.queries.curation import DECON_N
from spark_bam_spark.session import get_spark
from spark_bam_spark.tables import fan_out, table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("r17-funnel-micro")

    def corpus():
        d = fan_out(table(spark, args.sf_dir, "documents").select("doc_id", "text", "n_chars"))
        return d.unionAll(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "n_chars"
            )
        )

    def grams_inline():
        return (
            corpus()
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"if(size(split(text, ' ')) < {DECON_N}, array(),"
                        f" transform(sequence(1, size(split(text, ' ')) - {DECON_N - 1}),"
                        " i -> concat_ws(' ', slice(split(text, ' '), i, 5))))"
                    )
                ).alias("s"),
            )
            .distinct()
        )

    def grams_bound():
        return (
            corpus()
            .select("doc_id", F.split("text", " ").alias("w"))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"if(size(w) < {DECON_N}, array(),"
                        f" transform(sequence(1, size(w) - {DECON_N - 1}),"
                        " i -> concat_ws(' ', slice(w, i, 5))))"
                    )
                ).alias("s"),
            )
            .distinct()
        )

    # identity check
    a, b = grams_inline(), grams_bound()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"identity: symmetric diff rows = {diff}")
    assert diff == 0, "bound-w grams differ from inline grams"

    # warm
    for _ in range(2):
        grams_inline().write.format("noop").mode("overwrite").save()
        grams_bound().write.format("noop").mode("overwrite").save()

    t_in, t_bd = [], []
    for i in range(args.iters):
        for label, build, acc in (("inline", grams_inline, t_in), ("bound", grams_bound, t_bd)):
            spark.sparkContext.setJobDescription(f"funnel-micro:{label}:{i}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    print(f"inline split: min={min(t_in):.3f} all={[round(x,3) for x in t_in]}")
    print(f"bound w    : min={min(t_bd):.3f} all={[round(x,3) for x in t_bd]}")
    spark.stop()


if __name__ == "__main__":
    main()
