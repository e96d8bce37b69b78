"""A/B curation_pipeline_funnel driver-construction rewrite: the current
Column-built stage flags / funnel aggregation vs a parsed variant (CASE
expression for `reached`, two array() aggregates + stack from elements).
Identical semantics — count(if(...)) == count(when(...)), sum/coalesce
unchanged; asserts result identity then interleaves timings.

Usage: python tools/r17_funnel_sexpr_micro.py [--repeat 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

from spark_bam_spark.queries import load_all
from spark_bam_spark.queries.curation import BENCH_DOC_MAX, DECON_N
from spark_bam_spark.tables import table, fan_out
from spark_bam_spark.session import get_spark


def build_new(spark, sf_dir):
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars"))
    corpus = d.unionAll(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "n_chars"
        )
    )
    grams = (
        corpus.select("doc_id", F.split("text", " ").alias("w"))
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
    )
    bench = grams.filter(F.col("doc_id") < BENCH_DOC_MAX).select("s").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") >= BENCH_DOC_MAX)
        .join(F.broadcast(bench), "s")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    # parsed stage flags: one selectExpr computing n_words/q/min_q_doc/samp
    flagged = (
        corpus.selectExpr(
            "doc_id",
            "size(split(text, ' ')) as n_words",
            "size(split(text, ' ')) between 20 and 1000"
            " and cast(n_chars - (size(split(text, ' ')) - 1) as double) / size(split(text, ' '))"
            " between 3 and 12 as q",
            "min(if(size(split(text, ' ')) between 20 and 1000"
            " and cast(n_chars - (size(split(text, ' ')) - 1) as double) / size(split(text, ' '))"
            " between 3 and 12, doc_id, null))"
            " over (partition by md5(text)) as min_q_doc",
            "ascii(substring(md5(cast(doc_id as string)), 1, 1)) % 2 = 0 as samp",
        )
        .join(contaminated, "doc_id", "left")
        .selectExpr(
            "n_words",
            "q",
            "doc_id = min_q_doc as is_survivor",
            f"coalesce(hit, false) or doc_id < {BENCH_DOC_MAX} as contam",
            "samp",
        )
    )
    counts = ", ".join(f"count(if(reached >= {s}, 1, null))" for s in range(1, 6))
    tokens = ", ".join(
        f"coalesce(sum(if(reached >= {s}, n_words, null)), 0)" for s in range(1, 6)
    )
    agg = flagged.selectExpr(
        "case when not q then 1 when not is_survivor then 2 when contam then 3"
        " when not samp then 4 else 5 end as reached",
        "n_words",
    ).agg(F.expr(f"array({counts})").alias("ds"), F.expr(f"array({tokens})").alias("ts"))
    labels = {1: "ingest", 2: "quality", 3: "dedup", 4: "decontaminate", 5: "sample"}
    stack_args = ", ".join(
        f"{s}, '{labels[s]}', ds[{s - 1}], ts[{s - 1}]" for s in range(1, 6)
    )
    return agg.selectExpr(
        f"stack(5, {stack_args}) AS (stage, label, n_docs, n_tokens)"
    ).selectExpr(
        "stage", "label", "cast(n_docs as bigint) as n_docs",
        "cast(n_tokens as bigint) as n_tokens",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=7)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir

    registry = load_all()
    cur_fn = registry["curation_pipeline_funnel"].fn
    spark = get_spark("r17-funnel-sexpr")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        cur_fn(spark, "/root/testdata/sf0.001").collect()
        build_new(spark, "/root/testdata/sf0.001").collect()

    for d in ("/root/testdata/sf0.01", sf_dir):
        a = sorted(map(tuple, cur_fn(spark, d).collect()))
        b = sorted(map(tuple, build_new(spark, d).collect()))
        assert a == b, f"MISMATCH at {d}:\n{a}\nvs\n{b}"
        print(f"identity OK at {d}: {a}", flush=True)

    cur, new = [], []
    for r in range(args.repeat):
        t0 = time.perf_counter()
        cur_fn(spark, sf_dir).collect()
        cur.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        build_new(spark, sf_dir).collect()
        new.append(time.perf_counter() - t0)
    fmt = lambda xs: " ".join(f"{x:5.2f}" for x in xs)
    print(f"current: {fmt(cur)}  min={min(cur):.3f}")
    print(f"parsed : {fmt(new)}  min={min(new):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
