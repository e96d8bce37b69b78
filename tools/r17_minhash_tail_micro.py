"""Time minhash_jaccard_estimate's tail consumers separately (noop sink,
guide §1.4) over one shared checkpointed posting frame, plus per-op
DataFrame-construction cost of the tail — to find where the ~1.5 s
tail_exec and ~0.7 s tail_build go.

Usage: python tools/r17_minhash_tail_micro.py [--repeat 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_bam_spark.queries import load_all
from spark_bam_spark.queries.curation import N_COMPONENTS
from spark_bam_spark.queries.dedup import _shingles
from spark_bam_spark.tables import table
from spark_bam_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir

    registry = load_all()
    spark = get_spark("r17-minhash-tail")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        registry["minhash_jaccard_estimate"].fn(spark, "/root/testdata/sf0.001").collect()

    sh = _shingles(table(spark, sf_dir, "documents"), distinct=False)
    post = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .localCheckpoint(eager=True)
    )

    def comp(k: int):
        h = F.md5(F.concat_ws(":", F.lit(k), F.col("s")))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")

    pair_enum = F.expr(
        "flatten(transform(ids, (a, i) ->"
        " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
    )

    def build_tail():
        """Rebuild the full tail from the shared ckpt'd post, timing each
        construction step."""
        ts = {}
        t0 = time.perf_counter()
        hashed = post.select("ids", *[comp(k).alias(f"h{k}") for k in range(N_COMPONENTS)])
        ts["hashed"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sigs = (
            hashed.select(
                F.explode("ids").alias("doc_id"),
                *[F.col(f"h{k}") for k in range(N_COMPONENTS)],
            )
            .groupBy("doc_id")
            .agg(*[F.min(f"h{k}").alias(f"sig_{k}") for k in range(N_COMPONENTS)])
        )
        ts["sigs"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        stack_args = ", ".join(f"{k}, sig_{k}" for k in range(N_COMPONENTS))
        sig_rows = sigs.select(
            "doc_id", F.expr(f"stack({N_COMPONENTS}, {stack_args}) AS (k, sig)")
        )
        matches = (
            sig_rows.groupBy("k", "sig")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode(pair_enum).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_match"))
            .filter(F.col("n_match") >= 2)
        )
        ts["matches"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sizes = (
            post.select(F.explode("ids").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"))
        )
        ts["sizes"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        common = (
            post.filter(F.size("ids") > 1)
            .select(F.explode(pair_enum).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        ts["common"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sa = F.broadcast(sizes.alias("sa"))
        sb = F.broadcast(sizes.alias("sb"))
        est = F.col("n_match").cast("double") / N_COMPONENTS
        jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
        out = (
            matches.join(common, ["doc_a", "doc_b"])
            .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
            .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
            .select(
                "doc_a", "doc_b", est.alias("est_jaccard"),
                F.round(jac, 6).alias("jaccard"),
                F.round(F.abs(est - jac), 6).alias("abs_err"),
            )
        )
        ts["joins"] = time.perf_counter() - t0
        return out, sigs, matches, sizes, common, ts

    # construction-cost breakdown
    for r in range(args.repeat):
        out, sigs, matches, sizes, common, ts = build_tail()
        print("build  " + "  ".join(f"{k}={v:6.3f}" for k, v in ts.items()), flush=True)

    # exec cost per consumer (noop sink)
    for r in range(args.repeat):
        out, sigs, matches, sizes, common, _ = build_tail()
        row = {}
        for name, df in (("sigs", sigs), ("matches", matches), ("sizes", sizes),
                         ("common", common), ("full", out)):
            spark.sparkContext.setJobDescription(f"tail:{name}")
            t0 = time.perf_counter()
            noop(df)
            row[name] = time.perf_counter() - t0
        print("exec   " + "  ".join(f"{k}={v:6.3f}" for k, v in row.items()), flush=True)

    # count pair-enumeration volume once (context for the numbers)
    n_pairs = common.agg(F.sum(F.lit(1))).collect()
    n_post = post.count()
    n_pairrows = (
        post.filter(F.size("ids") > 1).select(F.explode(pair_enum).alias("p")).count()
    )
    n_matches = matches.count()
    print(f"posting_rows={n_post}  exploded_pair_rows={n_pairrows}  "
          f"distinct_common_pairs={n_pairs}  match_pairs={n_matches}")
    spark.stop()


if __name__ == "__main__":
    main()
