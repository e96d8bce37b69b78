"""A/B the minhash_jaccard_estimate driver-construction rewrite:
current (per-Column py4j construction of the 16 hash components + 16-col
stack unpivot) vs a parsed variant (one selectExpr for the component
hashes, array-of-mins aggregate + posexplode unpivot).  Expressions are
semantically identical (same md5-derived values, same (k, sig) rows);
this is a §5/§7.3 driver-work change only.

Asserts result identity, then interleaves full-query timings.

Usage: python tools/r17_minhash_sexpr_micro.py [--repeat 7]
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

PAIR_ENUM = (
    "flatten(transform(ids, (a, i) ->"
    " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
)


def build_new(spark, sf_dir):
    """The candidate shape: identical math, parsed-expression construction."""
    sh = _shingles(table(spark, sf_dir, "documents"), distinct=False)
    post = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .localCheckpoint(eager=True)
    )
    comp_sql = [
        f"cast(conv(substring(md5(concat_ws(':', {k}, s)), 1, 15), 16, 10) as bigint) as h{k}"
        for k in range(N_COMPONENTS)
    ]
    hashed = post.selectExpr("ids", *comp_sql)
    mins_sql = ", ".join(f"min(h{k})" for k in range(N_COMPONENTS))
    sig_rows = (
        hashed.selectExpr("explode(ids) as doc_id", *[f"h{k}" for k in range(N_COMPONENTS)])
        .groupBy("doc_id")
        .agg(F.expr(f"array({mins_sql})").alias("sig_arr"))
        .selectExpr("doc_id", "posexplode(sig_arr) as (k, sig)")
    )
    pair_enum = F.expr(PAIR_ENUM)
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
    return (
        matches.join(common, ["doc_a", "doc_b"])
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a", "doc_b", est.alias("est_jaccard"),
            F.round(jac, 6).alias("jaccard"),
            F.round(F.abs(est - jac), 6).alias("abs_err"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=7)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir

    registry = load_all()
    cur_fn = registry["minhash_jaccard_estimate"].fn
    spark = get_spark("r17-minhash-sexpr")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _ in range(2):
        cur_fn(spark, "/root/testdata/sf0.001").collect()
        build_new(spark, "/root/testdata/sf0.001").collect()

    # identity check at two scales
    for d in ("/root/testdata/sf0.01", sf_dir):
        a = sorted(map(tuple, cur_fn(spark, d).collect()))
        b = sorted(map(tuple, build_new(spark, d).collect()))
        assert a == b, f"MISMATCH at {d}: {len(a)} vs {len(b)} rows"
        print(f"identity OK at {d}: {len(a)} rows", flush=True)

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
