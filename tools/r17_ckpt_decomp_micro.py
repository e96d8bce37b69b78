"""Decompose the per-invocation cost of the ckpt-bearing benched queries:
(A) pure DataFrame CONSTRUCTION time up to the checkpoint (no action),
(B) the eager localCheckpoint job itself,
(C) constructing the consumer plan + the main collect.

Run each phase min-of-N in one session (bench warmup semantics) so the
numbers say where a rep's seconds go on this box.

Usage: python tools/r17_ckpt_decomp_micro.py [--repeat 5]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir

    registry = load_all()
    spark = get_spark("r17-ckpt-decomp")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm = "/root/testdata/sf0.001"
    for _ in range(2):
        for n in ("minhash_jaccard_estimate", "bm25_topk_docs", "semdedup_prune_ivf"):
            registry[n].fn(spark, warm).collect()

    # ---- minhash_jaccard_estimate ----------------------------------------
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        sh = _shingles(table(spark, sf_dir, "documents"), distinct=False)
        post_plan = sh.groupBy("s").agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        tA = time.perf_counter() - t0

        t0 = time.perf_counter()
        post = post_plan.localCheckpoint(eager=True)
        tB = time.perf_counter() - t0

        # consumer side: reuse the registered fn? it would rebuild its own
        # ckpt; instead rebuild the tail here exactly as the query does.
        t0 = time.perf_counter()

        def comp(k: int):
            h = F.md5(F.concat_ws(":", F.lit(k), F.col("s")))
            return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")

        hashed = post.select("ids", *[comp(k).alias(f"h{k}") for k in range(N_COMPONENTS)])
        sigs = (
            hashed.select(
                F.explode("ids").alias("doc_id"),
                *[F.col(f"h{k}") for k in range(N_COMPONENTS)],
            )
            .groupBy("doc_id")
            .agg(*[F.min(f"h{k}").alias(f"sig_{k}") for k in range(N_COMPONENTS)])
        )
        stack_args = ", ".join(f"{k}, sig_{k}" for k in range(N_COMPONENTS))
        sig_rows = sigs.select(
            "doc_id", F.expr(f"stack({N_COMPONENTS}, {stack_args}) AS (k, sig)")
        )
        pair_enum = F.expr(
            "flatten(transform(ids, (a, i) ->"
            " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
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
        sizes = (
            post.select(F.explode("ids").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"))
        )
        common = (
            post.filter(F.size("ids") > 1)
            .select(F.explode(pair_enum).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
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
        tC_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        out.collect()
        tC_exec = time.perf_counter() - t0
        print(
            f"minhash  construct={tA:6.3f}  ckpt_job={tB:6.3f}  "
            f"tail_build={tC_build:6.3f}  tail_exec={tC_exec:6.3f}",
            flush=True,
        )

    # ---- bm25_topk_docs ---------------------------------------------------
    from spark_bam_spark.tables import fan_out

    for _ in range(args.repeat):
        t0 = time.perf_counter()
        d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
        toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        tf_plan = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
        tA = time.perf_counter() - t0
        t0 = time.perf_counter()
        tf = tf_plan.localCheckpoint(eager=True)
        tB = time.perf_counter() - t0
        t0 = time.perf_counter()
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
        stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
        docfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
        qterms = docfreq.orderBy(F.desc("df"), "w").limit(3)
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        term = idf * (F.col("tf") * 2.2) / (
            F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
        out = (
            tf.join(F.broadcast(qterms), "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(
                F.round(F.sum(term), 6).alias("bm25"),
                F.count("*").cast("bigint").alias("n_terms_matched"),
            )
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(20)
        )
        tC_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        out.collect()
        tC_exec = time.perf_counter() - t0
        print(
            f"bm25     construct={tA:6.3f}  ckpt_job={tB:6.3f}  "
            f"tail_build={tC_build:6.3f}  tail_exec={tC_exec:6.3f}",
            flush=True,
        )

    # ---- semdedup_prune_ivf: construction vs everything else --------------
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        df = registry["semdedup_prune_ivf"].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.collect()
        t_exec = time.perf_counter() - t0
        print(f"ivf      build(incl ckpt)={t_build:6.3f}  exec={t_exec:6.3f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
