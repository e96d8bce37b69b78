"""Close the 100x minhash oracle gap (r14 VERDICT order #4).

The r14 scale campaigns left the two minhash heavies
(``dedup_minhash_lsh``, ``minhash_jaccard_estimate``) with 10x-only
DuckDB value evidence: their FULL oracles' quadratic tails (the shingle
posting-list and signature-bucket pair enumerations) grow ~100x from
sf0.1 to the 100x tile and are the cost wall — exactly as the semdedup
pairwise tail was.  This tool transfers tools/run_semdedup_100x.py's
deterministic-sample oracle design to both rows.

Sampled unit: the DOCUMENT (md5(doc_id) first hex char in
``--doc-prefixes``); a pair is in-sample iff BOTH endpoints are.  The
semdedup campaign sampled clusters/cells because its decisions are
cluster-local and the engine rows carry the cluster id; LSH candidate
pairs carry only their ENDPOINTS in the engine output (bucket ids do
not survive the final distinct), and every per-pair value in both
queries is pair-/doc-local (signatures, set sizes, intersections), so
the doc is the sampled unit with engine-side recoverability.
Restricting both oracle tails to sampled docs cuts the quadratic work
by p^2 (p = len(prefixes)/16), while the ONE global stage — the LSH hub
df-cap — is materialized once over the FULL corpus from the registered
oracle's own sliced prefix (never re-implemented), exactly as the
engine computes it over the full corpus.

Engine side: the REGISTERED queries run untouched at the tile; their
output frames are filtered to in-sample pairs with the same md5
predicate (Spark and DuckDB md5 hex agree bit-for-bit) and must
hash-match the sampled oracles; the full output is also counted.

Usage (tiles from tools/gen_scale.py; sf10 = 100x of sf0.1):

    python tools/run_minhash_100x.py [--sf-dir /tmp/spark_bam_spark_scale/sf10]
        [--doc-prefixes 0] [--skip-lsh] [--skip-estimate] [--full-oracle-check]

``--full-oracle-check`` additionally runs the registered FULL oracles
and asserts each sampled oracle equals the full result restricted to
in-sample pairs — feasible at sf0.1/10x only; validates the slicing
tail itself.  Prints one JSON report line at the end.
"""

from __future__ import annotations

import argparse
import datetime
import hashlib
import json
import math
import os
import sys
import time
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

HEX = set("0123456789abcdef")


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _hash_rows(rows) -> str:
    h = hashlib.sha256()
    for r in sorted(tuple(_norm(v) for v in row) for row in rows):
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def _in_sample(doc_id, prefixes) -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] in prefixes


def _doc_pred(prefixes: str) -> str:
    quoted = ", ".join(f"'{c}'" for c in prefixes)
    return f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ({quoted})"


def _restrict_docs(oracle_sql: str, prefixes: str) -> str:
    """Restrict the registered oracle's shingle source to sampled docs —
    the single ``FROM documents)`` inside the shared _SHINGLES_SQL CTE."""
    marker = "FROM documents)"
    assert oracle_sql.count(marker) == 1, "oracle shape changed; re-slice"
    return oracle_sql.replace(
        marker, f"FROM documents WHERE {_doc_pred(prefixes)})"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_bam_spark_scale/sf10")
    ap.add_argument(
        "--doc-prefixes",
        default="0",
        help="first-hex-char md5(doc_id) bucket set; '0' samples 1/16 of "
        "docs and ~1/256 of pairs",
    )
    ap.add_argument("--skip-lsh", action="store_true")
    ap.add_argument("--skip-estimate", action="store_true")
    ap.add_argument(
        "--full-oracle-check",
        action="store_true",
        help="also run the registered FULL oracles and assert the sampled "
        "oracle equals the full result restricted to in-sample pairs "
        "(small tiles only)",
    )
    args = ap.parse_args()
    prefixes = args.doc_prefixes.lower()
    assert prefixes and set(prefixes) <= HEX and len(set(prefixes)) == len(prefixes)

    import duckdb
    from pyspark.sql import functions as F

    from spark_bam_spark.queries import load_all
    from spark_bam_spark.queries.dedup import LSH_DF_CAP
    from spark_bam_spark.session import get_spark

    registry = load_all()
    report: dict = {"sf_dir": args.sf_dir, "doc_prefixes": prefixes}
    try:
        report["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    spark = get_spark("minhash-100x-campaign")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    report["sampled_docs"], report["total_docs"] = con.execute(
        f"SELECT count(*) FILTER (WHERE {_doc_pred(prefixes)}), count(*) FROM documents"
    ).fetchone()

    def pair_sample_filter(df, cols):
        pred = None
        for c in cols:
            e = F.substring(F.md5(F.col(c).cast("string")), 1, 1).isin(list(prefixes))
            pred = e if pred is None else (pred & e)
        return df.filter(pred)

    ok = True

    def run_one(key: str, name: str, oracle_tail_sql: str, pair_cols: list[str]):
        nonlocal ok
        # ---- engine: the registered chain untouched, output filtered ----
        t0 = time.perf_counter()
        df = registry[name].fn(spark, args.sf_dir)
        eng_rows = [tuple(r) for r in pair_sample_filter(df, pair_cols).collect()]
        report[f"{key}_engine_sample_wall_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        report[f"{key}_engine_total_rows"] = registry[name].fn(
            spark, args.sf_dir
        ).count()
        report[f"{key}_engine_total_wall_s"] = round(time.perf_counter() - t0, 1)
        # ---- sampled oracle ----
        t0 = time.perf_counter()
        orc_rows = [tuple(r) for r in con.execute(oracle_tail_sql).fetchall()]
        report[f"{key}_oracle_sample_wall_s"] = round(time.perf_counter() - t0, 1)
        report[f"{key}_sample_rows_engine"] = len(eng_rows)
        report[f"{key}_sample_rows_oracle"] = len(orc_rows)
        report[f"{key}_sample_hash_engine"] = _hash_rows(eng_rows)
        report[f"{key}_sample_hash_oracle"] = _hash_rows(orc_rows)
        report[f"{key}_sample_hash_match"] = (
            report[f"{key}_sample_hash_engine"] == report[f"{key}_sample_hash_oracle"]
        )
        # a sample selecting zero pairs would be vacuous evidence
        ok = ok and report[f"{key}_sample_hash_match"] and len(orc_rows) > 0

        if args.full_oracle_check:
            full = [tuple(r) for r in con.execute(registry[name].oracle).fetchall()]
            restr = [
                r
                for r in full
                if _in_sample(r[0], prefixes) and _in_sample(r[1], prefixes)
            ]
            report[f"{key}_full_oracle_rows"] = len(full)
            report[f"{key}_full_oracle_restricted_match"] = _hash_rows(
                restr
            ) == _hash_rows(orc_rows)
            ok = ok and report[f"{key}_full_oracle_restricted_match"]

    # ---- dedup_minhash_lsh: global hub pass + doc-sampled tail ----------
    if not args.skip_lsh:
        lsh_oracle = registry["dedup_minhash_lsh"].oracle
        # the hub df-cap is the one global stage: materialize it from the
        # registered oracle's own prefix over the FULL corpus (sliced at
        # the `hashed AS (` marker, exactly like the semdedup campaign
        # slices `ex AS (`), so campaign and engine can never diverge on
        # hub semantics
        assert lsh_oracle.count("hashed AS (") == 1, "hashed CTE marker changed; re-slice"
        hub_prefix = lsh_oracle.split("hashed AS (")[0].rstrip().rstrip(",")
        t0 = time.perf_counter()
        con.execute("CREATE TEMP TABLE hub_mat AS " + hub_prefix + " SELECT h0 FROM hub")
        report["lsh_oracle_hub_wall_s"] = round(time.perf_counter() - t0, 1)
        report["lsh_hub_shingles"] = con.execute(
            "SELECT count(*) FROM hub_mat"
        ).fetchone()[0]
        hub_cte = (
            "hub AS (SELECT h0 FROM hashed0 GROUP BY h0 "
            f"HAVING COUNT(DISTINCT doc_id) > {LSH_DF_CAP})"
        )
        assert lsh_oracle.count(hub_cte) == 1, "hub CTE shape changed; re-slice"
        tail = _restrict_docs(
            lsh_oracle.replace(hub_cte, "hub AS (SELECT h0 FROM hub_mat)"), prefixes
        )
        run_one("lsh", "dedup_minhash_lsh", tail, ["doc_a", "doc_b"])

    # ---- minhash_jaccard_estimate: every CTE is doc-/pair-local --------
    if not args.skip_estimate:
        est_tail = _restrict_docs(
            registry["minhash_jaccard_estimate"].oracle, prefixes
        )
        run_one(
            "est", "minhash_jaccard_estimate", est_tail, ["doc_a", "doc_b"]
        )

    report["ok"] = bool(ok)
    print(json.dumps(report))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
