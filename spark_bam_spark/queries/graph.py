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
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(_ONE).cast("long").alias("r"))
    for _ in range(2):
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
    return (
        ranks.select("node", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "node")
        .limit(20)
    )
