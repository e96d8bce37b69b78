"""Graph analytics over the relational corpus (engine extension).

Companion to the iterative min-label propagation in dedup.py
(`dedup_clusters`): PageRank is the second canonical iterative-join
algorithm, here over the customer–supplier bipartite graph implied by
orders⋈lineitem.

Cross-engine determinism: ranks are FIXED-POINT BIGINTs (1.0 = 10^9).
Every step is integer arithmetic — truncating integer division for the
per-edge contribution and the damping factor — so Spark and DuckDB agree
bit-for-bit with no float accumulation-order concerns at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.queries.dedup import (
    _BAND_CASE_SQL,
    _BAND_HASH_COLS_SQL,
    _SHINGLES_SQL,
    LSH_DF_CAP,
    N_BANDS,
)
from spark_bam_spark.tables import table

_ONE = 1_000_000_000  # fixed-point 1.0
_TELEPORT = 150_000_000  # (1 - d) with d = 0.85


@register(
    "pagerank_bipartite",
    tags=("graph", "iterative"),
    oracle=f"""
    WITH edges0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst FROM edges0
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst FROM edges0
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST({_ONE} AS BIGINT) AS r FROM deg),
    c1 AS (
      SELECT e.dst AS node, CAST(SUM(r0.r // g.d) AS BIGINT) AS m
      FROM edges e JOIN r0 ON e.src = r0.node JOIN deg g ON g.src = e.src
      GROUP BY e.dst
    ),
    r1 AS (SELECT node, {_TELEPORT} + ((85 * m) // 100) AS r FROM c1),
    c2 AS (
      SELECT e.dst AS node, CAST(SUM(r1.r // g.d) AS BIGINT) AS m
      FROM edges e JOIN r1 ON e.src = r1.node JOIN deg g ON g.src = e.src
      GROUP BY e.dst
    ),
    r2 AS (SELECT node, {_TELEPORT} + ((85 * m) // 100) AS r FROM c2)
    SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r2 ORDER BY r DESC, node LIMIT 20
    """,
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped PageRank iterations over the undirected customer–
    supplier graph (edge per distinct trading pair, both directions, so
    no dangling mass), returning the top-20 nodes.

    Scale shape: the edge list is the big table; each iteration is one
    equi-join of edges⋈ranks on src (both sides hash-partitioned on the
    SAME key, so AQE reuses the partitioning) + one groupBy on dst.
    Degrees join from a table computed once. Two iterations are unrolled
    into a single Catalyst plan; a convergence loop at 100 TB would
    localCheckpoint each iteration to cut lineage exactly as
    `dedup_clusters` does (see dedup.py). Fixed-point BIGINT ranks make
    the result engine-exact AND accumulation-order-independent — the
    float formulation would differ run-to-run under AQE re-partitioning.

    Top-k via rank DESC with node tie-break → TakeOrderedAndProject,
    never a global sort."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnode = F.concat(F.lit("c"), F.col("c").cast("string"))
    snode = F.concat(F.lit("s"), F.col("s").cast("string"))
    edges = e0.select(cnode.alias("src"), snode.alias("dst")).unionAll(
        e0.select(snode.alias("src"), cnode.alias("dst"))
    )
    return (
        _pagerank_ranks(edges, iterations=2)
        .select("node", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "node")
        .limit(20)
    )


def _pagerank_ranks(edges: DataFrame, iterations: int) -> DataFrame:
    """Damped fixed-point PageRank over a directed edge list (src, dst)
    where every node has out-degree >= 1 (the bipartite caller guarantees
    this by emitting both edge directions).  Returns (node, r) with r in
    fixed-point BIGINTs; all arithmetic is truncating-integer so the
    result is accumulation-order independent."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(_ONE).cast("long").alias("r"))
    for _ in range(iterations):
        contribs = (
            edges.join(deg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select("dst", F.expr("r div d").alias("contrib"))
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(F.sum("contrib").alias("m"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_TELEPORT) + F.expr("(85 * m) div 100")).alias("r"),
            )
        )
    return ranks


@register(
    "triangle_count_candidates",
    tags=("graph", "dedup"),
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hashed0 AS (
      SELECT doc_id,
             {_BAND_HASH_COLS_SQL}
      FROM sh
    ),
    hub AS (SELECT h0 FROM hashed0 GROUP BY h0 HAVING COUNT(DISTINCT doc_id) > {LSH_DF_CAP}),
    hashed AS (SELECT * FROM hashed0 WHERE h0 NOT IN (SELECT h0 FROM hub)),
    mh AS (
      SELECT doc_id, b.band, MIN({_BAND_CASE_SQL}) AS sig
      FROM hashed, (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
      GROUP BY doc_id, b.band
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
    ),
    deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT doc_a AS n FROM pairs UNION ALL SELECT doc_b FROM pairs
      ) GROUP BY n
    ),
    w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(COALESCE(SUM((d * (d - 1)) // 2), 0) AS BIGINT) AS n_wedges
          FROM deg),
    e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM pairs p1
      JOIN pairs p2 ON p2.doc_a = p1.doc_b
      JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           ROUND(3.0 * n_triangles / n_wedges, 6) AS clustering_coeff
    FROM w, e, t
    """,
)
def triangle_count_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the MinHash-LSH
    candidate-pair graph — the transitivity audit of a dedup pipeline: a
    clique-y candidate graph (coefficient near 1) means near-duplicates
    cluster consistently; a low coefficient flags hash bands producing
    non-transitive, noisy candidates.

    The join-based triangle enumeration (p1(a,b) |> p2(b,c) |> close with
    p3(a,c)) works on edges stored a < b, so each triangle is counted
    exactly once and the joins stay equi-joins on node ids.  Wedges come
    from the integer degree table ((d*(d-1)) div 2 — exact BIGINTs).  At
    100 TB the candidate graph is orders of magnitude smaller than the
    corpus (that's what LSH is for); the three shuffles key on uniform
    node ids, and the pair set is localCheckpoint'ed so the shingle/LSH
    subtree runs once, not five times.  try_divide keeps the zero-wedge
    (empty-corpus) case NULL instead of an ANSI crash."""
    from spark_bam_spark.queries.dedup import _candidate_pairs

    pairs = _candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)
    return _triangle_stats(pairs)


def _triangle_stats(pairs: DataFrame) -> DataFrame:
    """Node/edge/wedge/triangle counts + global clustering coefficient for
    an undirected edge list stored once per edge as (doc_a < doc_b)."""
    deg = (
        pairs.select(F.col("doc_a").alias("n"))
        .unionAll(pairs.select(F.col("doc_b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    w = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("(d * (d - 1)) div 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    e = pairs.agg(F.count("*").cast("bigint").alias("n_edges"))
    p1, p2 = pairs.alias("p1"), pairs.alias("p2")
    paths = p1.join(p2, F.col("p1.doc_b") == F.col("p2.doc_a")).select(
        F.col("p1.doc_a").alias("a"), F.col("p2.doc_b").alias("c")
    )
    closing = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    t = paths.join(closing, ["a", "c"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    return (
        w.crossJoin(e)
        .crossJoin(t)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.try_divide(F.lit(3.0) * F.col("n_triangles"), F.col("n_wedges")), 6
            ).alias("clustering_coeff"),
        )
    )
