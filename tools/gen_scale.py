"""Generate a scaled-up copy of a testdata dir for throughput probing.

Tiles the sf0.1 tables N× (default 10× => "sf1") with per-tile key offsets
that preserve referential integrity — tile i's lineitem rows join tile i's
orders/part/supplier copies, orders join tile i's customers, and the tiny
dims (region, nation) stay single-copy — so every benched join/agg sees N×
the fact rows with the same key distribution and selectivities, not N×
duplicate keys.

Document text is re-tokenized per tile (every word gets a tile-specific
suffix — a bijective vocabulary rename) so MinHash/LSH sees tile copies as
DISTINCT documents with the SAME intra-tile similarity structure as the
source corpus, keeping the near-dup candidate-pair workload proportional
to corpus size instead of exploding with artificial cross-tile duplicates.

Output goes under /tmp (scale data is a probe, not a fixture — never
committed). Usage:

    python tools/gen_scale.py [--tiles 10] [--src /root/testdata/sf0.1]
                              [--out /tmp/spark_bam_spark_scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

DIMS = ("region", "nation")

# table -> {column: keyspace} ; each tiled key becomes key + tile * span(keyspace)
KEYED = {
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}

SPANS = {
    "c": ("customer", "c_custkey"),
    "s": ("supplier", "s_suppkey"),
    "p": ("part", "p_partkey"),
    "o": ("orders", "o_orderkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_bam_spark_scale/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    spans = {
        k: con.sql(f"SELECT MAX({col}) + 1 FROM '{args.src}/{tbl}.parquet'").fetchone()[0]
        for k, (tbl, col) in SPANS.items()
    }

    for t in DIMS:
        con.sql(f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")

    for t, keycols in KEYED.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keycols:
                sel.append(f"{c} + tile * {spans[keycols[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # per-tile token RENAMING (append tile suffix to every word):
                # a bijective vocabulary map preserves the intra-tile
                # similarity structure exactly (same shingle-set overlaps as
                # the source corpus) while making every cross-tile shingle
                # distinct — no artificial near-dups, no shared marker
                # tokens that would balloon LSH buckets
                sel.append("CASE WHEN tile = 0 THEN text ELSE "
                           "regexp_replace(text, '(\\S+)', '\\1q' || tile, 'g') END AS text")
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM '{args.src}/{t}.parquet', (SELECT unnest(range({args.tiles})) AS tile) "
            f"ORDER BY tile) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.sql(q)
        n = con.sql(f"SELECT COUNT(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
