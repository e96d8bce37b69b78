"""Similarity search over the ``embeddings`` table (engine extension).

Baseline: brute-force cosine top-k — correct at any scale but O(N) per
query; the scale path prunes candidates with a coarse partition (IVF-style,
here the ``label`` column stands in for a learned centroid assignment).

Determinism contract with the DuckDB oracle: every dot product / norm is
accumulated in DECIMAL (exact, order-independent), then finished in DOUBLE
— bit-identical across engines, so even top-k ordering agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.tables import fan_out, table

QUERY_VEC_ID = 0
TOP_K = 10

_DEC = "decimal(28,12)"


def _dec_array_sum(arr_expr: str) -> str:
    """Exact decimal fold of a product array — order-independent, so it
    matches DuckDB's SUM(DECIMAL) over the unnested terms bit-for-bit."""
    return (
        f"cast(aggregate({arr_expr}, cast(0 as {_DEC}),"
        f" (acc, v) -> cast(acc + v as {_DEC})) as double)"
    )


def _cosine_scores(spark: SparkSession, sf_dir: str, restrict_label: bool) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("label").alias("q_label"), F.col("embedding").alias("qv")
    )
    # one-row broadcast + per-row higher-order expressions: cosine is a
    # narrow map over the scan (no explode, no shuffle) — at 100 TB this
    # is a single pass ending in TakeOrderedAndProject.
    # work_factor=8 (r17): each row evaluates THREE interpreted
    # 64-element DECIMAL folds — roughly an order of magnitude more
    # per-row work than the median fan_out consumer, so the rows-derived
    # floor under-spreads it (measured +0.03 s min at the default floor,
    # interleaved A/B); the declared factor restores the full spread at
    # bench scale and is moot from the 10x tile up.
    j = fan_out(emb, work_factor=8).crossJoin(F.broadcast(q))
    if restrict_label:
        j = j.filter(F.col("label") == F.col("q_label"))
    prod = f"zip_with(embedding, qv, (x, y) -> cast(cast(x as double) * cast(y as double) as {_DEC}))"
    sq = f"transform(embedding, x -> cast(cast(x as double) * cast(x as double) as {_DEC}))"
    qsq = f"transform(qv, y -> cast(cast(y as double) * cast(y as double) as {_DEC}))"
    # try_divide + not-null filter: a zero-norm vector (or query) has no
    # defined cosine — plain `/` would throw DIVIDE_BY_ZERO under ANSI
    # (the deployment default), and a NULL cosine would sort differently
    # in the two engines (Spark DESC = NULLS LAST, DuckDB = NULLS FIRST).
    # The oracle excludes the same rows via HAVING SUM(xx) > 0 AND
    # SUM(yy) > 0.
    return j.select(
        "vec_id",
        F.try_divide(
            F.expr(_dec_array_sum(prod)),
            F.sqrt(F.expr(_dec_array_sum(sq))) * F.sqrt(F.expr(_dec_array_sum(qsq))),
        ).alias("cosine"),
    ).filter(F.col("cosine").isNotNull())


def _oracle(restrict: str) -> str:
    return f"""
    WITH q AS (SELECT embedding AS qv, label AS q_label FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID}),
    prods AS (
      SELECT e.vec_id,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) AS DECIMAL(28,12)))) AS xy,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS xx,
             unnest(list_transform(q.qv,
                    (y, i) -> CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12)))) AS yy
      FROM embeddings e, q
      {restrict}
    )
    SELECT vec_id,
           CAST(SUM(xy) AS DOUBLE) / (sqrt(CAST(SUM(xx) AS DOUBLE)) * sqrt(CAST(SUM(yy) AS DOUBLE))) AS cosine
    FROM prods
    GROUP BY vec_id
    HAVING SUM(xx) > 0 AND SUM(yy) > 0
    ORDER BY cosine DESC, vec_id
    LIMIT {TOP_K}
    """


@register(
    "cosine_topk_bruteforce",
    headline=True,
    tags=("similarity",),
    oracle=_oracle(""),
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against query vec 0.

    Distributed exhaustive scan: broadcast the query vector's components,
    one balanced shuffle on vec_id, TakeOrderedAndProject for the top-k —
    the right baseline even at 100 TB (no index, perfect recall)."""
    return (
        _cosine_scores(spark, sf_dir, restrict_label=False)
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@register(
    "cosine_topk_ivf",
    tags=("similarity", "ann"),
    oracle=_oracle("WHERE e.label = q.q_label"),
)
def cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse partition (``label``
    stands in for a centroid assignment).

    At scale the table is written partitioned by the coarse id, so this
    becomes partition pruning — the scan itself shrinks, not just the
    compute."""
    return (
        _cosine_scores(spark, sf_dir, restrict_label=True)
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


_IVF_DIR = "/tmp/spark_bam_spark_fixture/embeddings_ivf"


@register(
    "cosine_topk_ivf_pruned",
    tags=("similarity", "ann", "layout"),
    oracle=_oracle("WHERE e.label = q.q_label"),
)
def cosine_topk_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the index MATERIALIZED: embeddings written partitioned by
    the coarse id (label), so probing the query's cell is hive-style
    partition pruning — the scan reads one directory, not the table.
    Same oracle as cosine_topk_ivf (identical semantics, better layout).

    Fully declarative: the probe joins the one-row query cell on the
    partition column under a broadcast hash join, so Catalyst inserts a
    dynamic-partition-pruning subquery (``dynamicpruning#…`` in the scan's
    PartitionFilters) — no driver-side ``.first()`` to look up the cell.
    """
    import os

    out = f"{_IVF_DIR}_{os.path.basename(sf_dir.rstrip('/'))}"
    src = table(spark, sf_dir, "embeddings")
    if not os.path.exists(out):
        src.write.mode("overwrite").partitionBy("label").parquet(out)
    # explicit schema: a materialized index over an EMPTY source has no
    # part files to infer from (schema inference would throw); partition
    # columns are still matched by name when present
    emb = spark.read.schema(src.schema).parquet(out)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("label").alias("q_label"), F.col("embedding").alias("qv")
    )
    j = emb.join(F.broadcast(q), emb["label"] == q["q_label"])
    prod = f"zip_with(embedding, qv, (x, y) -> cast(cast(x as double) * cast(y as double) as {_DEC}))"
    sq = f"transform(embedding, x -> cast(cast(x as double) * cast(x as double) as {_DEC}))"
    qsq = f"transform(qv, y -> cast(cast(y as double) * cast(y as double) as {_DEC}))"
    # zero-norm guard: see _cosine_scores
    return (
        j.select(
            "vec_id",
            F.try_divide(
                F.expr(_dec_array_sum(prod)),
                F.sqrt(F.expr(_dec_array_sum(sq))) * F.sqrt(F.expr(_dec_array_sum(qsq))),
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@register(
    "ann_recall_eval",
    tags=("similarity", "eval"),
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    prods AS (
      SELECT q.q_id, q.q_label, e.label, e.vec_id,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) AS DECIMAL(28,12)))) AS xy,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS xx,
             unnest(list_transform(q.qv,
                    (y, i) -> CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12)))) AS yy
      FROM embeddings e, q
    ),
    scores AS (
      SELECT q_id, q_label, label, vec_id,
             CAST(SUM(xy) AS DOUBLE) / (sqrt(CAST(SUM(xx) AS DOUBLE)) * sqrt(CAST(SUM(yy) AS DOUBLE))) AS cosine
      FROM prods GROUP BY q_id, q_label, label, vec_id
      HAVING SUM(xx) > 0 AND SUM(yy) > 0
    ),
    exact AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM scores) WHERE rn <= {TOP_K}
    ),
    approx AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM scores WHERE label = q_label) WHERE rn <= {TOP_K}
    ),
    hits AS (
      SELECT a.q_id, COUNT(*) AS n_hits
      FROM approx a JOIN exact e USING (q_id, vec_id) GROUP BY a.q_id
    )
    SELECT qq.q_id, COALESCE(h.n_hits, 0) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM (SELECT DISTINCT q_id FROM q) qq LEFT JOIN hits h USING (q_id)
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF probe against exact brute force, per query —
    the evaluation an ANN index needs before it replaces the exhaustive
    scan (companion to `lsh_quality_eval` on the dedup side).

    10 query vectors run as ONE plan: broadcast the 10-row query side,
    score every (query, vector) pair in a narrow decimal-exact map, then
    take per-query top-k twice — unrestricted (ground truth) and probe-
    restricted (label == query's label, the IVF cell). row_number() <= k
    compiles to WindowGroupLimit, so each shuffle partition pre-prunes to
    its local top-k before the exchange — per-query work is O(N/p + k),
    not a global sort. Recall joins the two k-row sets on (q_id, vec_id).

    At 100 TB: identical shape — the ground-truth side is the expensive
    exhaustive pass you run once on a sample to validate the index; the
    probe side reads only matching cells (see cosine_topk_ivf_pruned for
    the partition-pruned variant)."""
    from pyspark.sql import Window

    N_Q = 10
    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"),
    )
    prod = f"zip_with(embedding, qv, (x, y) -> cast(cast(x as double) * cast(y as double) as {_DEC}))"
    sq = f"transform(embedding, x -> cast(cast(x as double) * cast(x as double) as {_DEC}))"
    qsq = f"transform(qv, y -> cast(cast(y as double) * cast(y as double) as {_DEC}))"
    # zero-norm guard: see _cosine_scores
    scores = (
        fan_out(emb)
        .crossJoin(F.broadcast(qs))
        .select(
            "q_id",
            "q_label",
            "label",
            "vec_id",
            F.try_divide(
                F.expr(_dec_array_sum(prod)),
                F.sqrt(F.expr(_dec_array_sum(sq))) * F.sqrt(F.expr(_dec_array_sum(qsq))),
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    exact = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id")
    )
    approx = (
        scores.filter(F.col("label") == F.col("q_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id")
    )
    hits = approx.join(F.broadcast(exact), ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        qs.select("q_id")
        .join(F.broadcast(hits), "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


N_QUERIES = 5  # vec_id 0..4 act as the query batch
JOIN_K = 3


@register(
    "ann_join_topk_per_query",
    tags=("similarity", "ann", "join"),
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    prods AS (
      SELECT q.q_id, e.vec_id,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) AS DECIMAL(28,12)))) AS xy,
             unnest(list_transform(e.embedding,
                    (x, i) -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS xx,
             unnest(list_transform(q.qv,
                    (y, i) -> CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12)))) AS yy
      FROM embeddings e, q
      WHERE e.vec_id >= {N_QUERIES}
    ),
    scored AS (
      SELECT q_id, vec_id,
             CAST(SUM(xy) AS DOUBLE) / (sqrt(CAST(SUM(xx) AS DOUBLE)) * sqrt(CAST(SUM(yy) AS DOUBLE))) AS cosine
      FROM prods GROUP BY q_id, vec_id
      HAVING SUM(xx) > 0 AND SUM(yy) > 0
    )
    SELECT q_id, vec_id, cosine, rnk FROM (
      SELECT q_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      FROM scored
    ) WHERE rnk <= {JOIN_K}
    ORDER BY q_id, rnk
    """,
)
def ann_join_topk_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-to-many similarity JOIN: top-k neighbors for a whole batch of
    query vectors at once (the RAG / retrieval-training shape, vs the
    single-query lookup of cosine_topk_bruteforce).

    Scale shape: the query batch broadcasts (it is the small side by
    construction); scoring is a narrow map over the corpus scan — one
    row per (query, candidate) pair but never materialized wider than the
    corpus partition; per-query top-k is a single window shuffle keyed by
    q_id (bounded fan-out: k rows per query survive). At 100 TB the corpus
    side stays partition-parallel and the only shuffle moves
    |queries| x |corpus| scored pairs reduced map-side by rank pruning
    under AQE; for larger query batches the same plan shards the batch."""
    from pyspark.sql import Window as W

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    corpus = fan_out(emb.filter(F.col("vec_id") >= N_QUERIES))
    j = corpus.crossJoin(F.broadcast(q))
    prod = f"zip_with(embedding, qv, (x, y) -> cast(cast(x as double) * cast(y as double) as {_DEC}))"
    sq = f"transform(embedding, x -> cast(cast(x as double) * cast(x as double) as {_DEC}))"
    qsq = f"transform(qv, y -> cast(cast(y as double) * cast(y as double) as {_DEC}))"
    # zero-norm guard: see _cosine_scores
    scored = j.select(
        "q_id",
        "vec_id",
        F.try_divide(
            F.expr(_dec_array_sum(prod)),
            F.sqrt(F.expr(_dec_array_sum(sq))) * F.sqrt(F.expr(_dec_array_sum(qsq))),
        ).alias("cosine"),
    ).filter(F.col("cosine").isNotNull())
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= JOIN_K)
        .orderBy("q_id", "rnk")
    )
