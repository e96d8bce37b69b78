"""Training-data-pipeline operators beyond the dedup/similarity families:
signed-random-projection LSH, iterative k-means (Lloyd), embedding column
statistics, stratified deterministic sampling, and intra-document
repetition scoring (Gopher-style quality signal).

Scale notes (the 100 TB design point these are written for):

- ``dedup_srp_lsh``: signatures are a narrow map over the scan (one pass,
  per-row array math, no explode); the only shuffle is the bucket
  self-join — the canonical LSH shape, never all-pairs.
- ``kmeans_lloyd``: each Lloyd iteration is one broadcast join (k rows)
  plus one k-bounded aggregation with map-side partial aggregation; the
  centroid table never leaves the driver-side plan as anything bigger
  than k×dim doubles. No ``collect()`` — the loop is a fixed unrolled
  plan, so Catalyst sees the whole pipeline.
- ``embedding_norm_stats``: pure map + one partial-aggregated shuffle.
- ``sample_stratified``: row-local md5 predicate — pushes to the scan,
  no shuffle at all (deterministic replacement for ``sampleBy``).
- ``text_repetition``: the bigram explode is a narrow generate; the
  (doc, bigram) count shuffle is uniform (keys are per-doc).

Determinism contract with the DuckDB oracle: every floating accumulation
is cast to DECIMAL(28,12) per term and summed exactly (order-independent,
identical across engines); divisions happen once, in DOUBLE, from exact
integer/decimal inputs on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.queries.dedup import (
    _BAND_CASE_SQL,
    _BAND_HASH_COLS_SQL,
    _band_hash_col,
    LSH_DF_CAP,
    N_BANDS,
)
from spark_bam_spark.tables import fan_out, table

_DEC = "decimal(28,12)"

# --------------------------------------------------------------------------
# Signed-random-projection (SRP) LSH over embeddings
# --------------------------------------------------------------------------

SRP_PLANES = 8

# Deterministic ±1 hyperplane component for (plane p, 0-based dim d):
# +1 when ((31*p + 17*d) mod 5) >= 2 else -1 — a fixed pseudo-random
# pattern both engines compute from integers (no RNG, no literals table).


def _srp_bucket_expr() -> str:
    bits = []
    for p in range(SRP_PLANES):
        prod = (
            f"aggregate(transform(embedding, (x, d) -> cast(cast(x as double) * "
            f"(case when ((31*{p} + 17*d) % 5) >= 2 then 1.0d else -1.0d end) as {_DEC})), "
            f"cast(0 as {_DEC}), (a, v) -> cast(a + v as {_DEC}))"
        )
        bits.append(f"(case when {prod} >= 0 then {1 << p} else 0 end)")
    return "cast(" + " + ".join(bits) + " as bigint)"


def _srp_oracle() -> str:
    return f"""
    WITH terms AS (
      SELECT e.vec_id, p.p,
             unnest(list_transform(e.embedding, (x, i) -> CAST(CAST(x AS DOUBLE) *
                    (CASE WHEN ((31*p.p + 17*(i - 1)) % 5) >= 2 THEN 1.0 ELSE -1.0 END)
                    AS DECIMAL(28,12)))) AS t
      FROM embeddings e, range(0, {SRP_PLANES}) p(p)
    ),
    bits AS (
      SELECT vec_id, p,
             CASE WHEN SUM(t) >= 0 THEN (1 << p) ELSE 0 END AS bit
      FROM terms GROUP BY vec_id, p
    ),
    sigs AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket
    FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


@register(
    "dedup_srp_lsh",
    tags=("dedup", "lsh", "embedding"),
    oracle=_srp_oracle(),
)
def dedup_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SRP) LSH candidate pairs over embeddings.

    Complements MinHash (token sets) and SimHash (token weights) with the
    embedding-space variant: sign of the dot product with each of
    ``SRP_PLANES`` fixed hyperplanes packs into a bucket id; vectors in
    the same bucket are near-duplicate candidates (cosine-similar vectors
    agree on most signs). Signature computation is a narrow map; the
    bucket self-join is the only shuffle — never all-pairs.
    """
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    sigs = emb.select("vec_id", F.expr(_srp_bucket_expr()).alias("bucket"))
    a = sigs.alias("a")
    b = sigs.alias("b")
    return a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.bucket").alias("bucket"),
    )


# --------------------------------------------------------------------------
# Embedding column statistics
# --------------------------------------------------------------------------

_NORM2 = (
    f"aggregate(transform(embedding, x -> cast(cast(x as double) * cast(x as double) as {_DEC})), "
    f"cast(0 as {_DEC}), (a, v) -> cast(a + v as {_DEC}))"
)


@register(
    "embedding_norm_stats",
    tags=("embedding", "agg"),
    oracle="""
    WITH t AS (
      SELECT vec_id, label,
             unnest(list_transform(embedding,
                    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS v
      FROM embeddings
    ),
    n2 AS (SELECT vec_id, label, SUM(v) AS norm2 FROM t GROUP BY vec_id, label)
    SELECT label, COUNT(*) AS n,
           CAST(SUM(norm2) AS DOUBLE) / COUNT(*) AS mean_sq_norm,
           sqrt(CAST(MIN(norm2) AS DOUBLE)) AS min_norm,
           sqrt(CAST(MAX(norm2) AS DOUBLE)) AS max_norm
    FROM n2 GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics of the embedding column.

    The per-row squared norm accumulates in DECIMAL (exact), so the group
    SUM/MIN/MAX are order-independent — mean of squared norms instead of
    mean of norms precisely so no cross-row float addition ever happens.
    One narrow map + one partially-aggregated shuffle on ``label``.
    """
    emb = table(spark, sf_dir, "embeddings")
    n2 = emb.select("label", F.expr(_NORM2).alias("norm2"))
    return n2.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.sum("norm2").cast("double") / F.count("*")).alias("mean_sq_norm"),
        F.sqrt(F.min("norm2").cast("double")).alias("min_norm"),
        F.sqrt(F.max("norm2").cast("double")).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# k-means: two unrolled Lloyd iterations (iterative algorithm, declarative)
# --------------------------------------------------------------------------

KMEANS_K = 4
EMB_DIM = 64  # embeddings.embedding is FLOAT[64] in the synthetic corpus
QUERY_VEC_FOR_IVF = 7  # probe query for ivf_kmeans_probe (not an init centroid)
IVF_TOP_K = 10


def _dec_sum(arr: str) -> str:
    return f"aggregate({arr}, cast(0 as {_DEC}), (a, v) -> cast(a + v as {_DEC}))"


def _centroid_update(assigned: DataFrame, *keys: str) -> DataFrame:
    """Mean-centroid update (count + EMB_DIM exact DECIMAL element sums,
    then cast-to-double / n), emitted as ONE parsed SQL aggregate plus ONE
    transform lambda.

    r17: the previous shape built 64 ``F.sum(...)`` Columns, 64 division
    Columns and an ``F.array`` through INDIVIDUAL py4j calls — measured
    0.6-0.7 s of driver-side construction time PER CALL SITE at
    EMB_DIM=64 (tools/r17_semdedup_micro.py; Catalyst analysis itself is
    <50 ms — the cost was round-trip chatter), paid on every invocation.
    Semantics are unchanged: the same 64 DECIMAL(28,12) sums (exact, so
    order-independent), the same double division by the group count —
    bit-identical centroids, same HashAggregate buffers."""
    sums_sql = ", ".join(f"sum(cast(v[{i}] as {_DEC}))" for i in range(EMB_DIM))
    return (
        assigned.groupBy(*keys)
        .agg(F.expr("count(*)").alias("n"), F.expr(f"array({sums_sql})").alias("sa"))
        .select(*keys, F.expr("transform(sa, s -> cast(s as double) / n)").alias("c"))
    )


# Double-precision pre-select band for the DECIMAL argmin (see _assign):
# a 64-term nonnegative double fold carries <= 64 ulp ~ 7.1e-15 relative
# error, so a 1e-12 relative band is a >100x margin — a centroid outside
# the band provably exceeds the true minimum and cannot be the DECIMAL
# argmin; everything inside the band (including exact ties, e.g.
# duplicate planted vectors) is re-scored in exact DECIMAL.  The 1e-30
# absolute term covers an exactly-zero minimum (vector == centroid).
_PRESELECT_BAND = "* 1.000000000001d + 1e-30d"


def _preselect_enabled() -> bool:
    """A/B toggle for the double pre-select inside the in-row argmin
    (SPARK_GRAFT_ASSIGN_PRESELECT=0 restores the all-DECIMAL r7 path).
    Labels are bit-identical either way — the band argument above — so
    this is a physical choice, like the checkpoint modes."""
    import os

    return os.environ.get("SPARK_GRAFT_ASSIGN_PRESELECT", "1") != "0"


def _argmin_select(base: DataFrame, vec: str, out: list) -> DataFrame:
    """Shared in-row argmin tail: given `base` carrying a packed
    centroid-struct array `cs` (fields cluster, c), append the winning
    cluster id for `vec` as `cluster`.  With pre-select on, the K
    DECIMAL distance computations collapse to K double folds + exact
    DECIMAL for the (almost always 1) in-band candidates; doubles are
    hoisted into columns so nothing re-expands per element."""
    d2 = _dec_sum(f"zip_with({vec}, s.c, (x, y) -> cast((x - y) * (x - y) as {_DEC}))")
    if not _preselect_enabled():
        argmin = F.expr(
            f"array_min(transform(cs, s -> struct({d2} as d2, s.cluster as cluster))).cluster"
        )
        return base.select(*out, argmin.alias("cluster"))
    dbl = (
        f"aggregate(zip_with({vec}, s.c, (x, y) -> (x - y) * (x - y)),"
        f" cast(0 as double), (a, t) -> a + t)"
    )
    staged = (
        base.withColumn("dds", F.expr(f"transform(cs, s -> {dbl})"))
        # array_min hoisted to its own column: inlined in the filter
        # lambda it would re-evaluate per element (K^2 doubles per row)
        .withColumn("mind", F.expr("array_min(dds)"))
        .withColumn("cands", F.expr(f"filter(cs, (s, i) -> dds[i] <= mind {_PRESELECT_BAND})"))
    )
    argmin = F.expr(
        f"array_min(transform(cands, s -> struct({d2} as d2, s.cluster as cluster))).cluster"
    )
    return staged.select(*out, argmin.alias("cluster"))


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with NO shuffle: the k-row centroid
    table is packed into a single broadcast row (collect_list of
    (cluster, centroid)), and the argmin runs in-row as an array_min over
    per-centroid struct(d2, cluster) — exact DECIMAL distance
    accumulation, ties broken by lowest cluster id (struct ordering
    matches the oracle's ORDER BY d2, cluster). The input row keeps its
    vector, so the downstream centroid update needs no join back.

    r8: a double pre-select (see _PRESELECT_BAND) skips the DECIMAL
    math for every centroid provably outside the minimum's error band —
    labels stay bit-identical to the all-DECIMAL oracle."""
    packed = cents.agg(F.collect_list(F.struct("cluster", "c")).alias("cs"))
    return _argmin_select(emb.crossJoin(F.broadcast(packed)), "v", ["vec_id", "v"])


@register(
    "kmeans_lloyd",
    tags=("embedding", "iterative"),
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < {KMEANS_K}),
    t1 AS (SELECT e.vec_id, c0.cluster,
                  unnest(list_transform(e.v, (x, i) ->
                         CAST((x - c0.c[i]) * (x - c0.c[i]) AS DECIMAL(28,12)))) AS t
           FROM e, c0),
    d1 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t1 GROUP BY vec_id, cluster),
    a1 AS (SELECT vec_id, cluster FROM d1
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    m1 AS (SELECT a1.cluster, i.i AS i,
                  CAST(SUM(CAST(e.v[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
           FROM a1 JOIN e USING (vec_id), range(1, {EMB_DIM + 1}) i(i)
           GROUP BY a1.cluster, i.i),
    t2 AS (SELECT e.vec_id, m1.cluster,
                  CAST((e.v[m1.i] - m1.cv) * (e.v[m1.i] - m1.cv) AS DECIMAL(28,12)) AS t
           FROM e, m1),
    d2 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t2 GROUP BY vec_id, cluster),
    a2 AS (SELECT vec_id, cluster FROM d2
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    n1 AS (SELECT cluster, COUNT(*) AS n_iter1 FROM a1 GROUP BY cluster),
    n2 AS (SELECT cluster, COUNT(*) AS n_iter2 FROM a2 GROUP BY cluster)
    SELECT COALESCE(n1.cluster, n2.cluster) AS cluster,
           COALESCE(n_iter1, 0) AS n_iter1,
           COALESCE(n_iter2, 0) AS n_iter2
    FROM n1 FULL OUTER JOIN n2 ON n1.cluster = n2.cluster
    """,
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means over embeddings
    (init = vectors 0..k-1), reporting cluster sizes after each pass.

    Iterative algorithm expressed declaratively: assignment is an in-row
    argmin against a one-row broadcast of the packed centroid list (no
    join, no shuffle); centroid update is one aggregation with
    ``EMB_DIM`` exact DECIMAL column sums (arrays stay packed — no
    explode); the second iteration consumes the first's centroid
    DataFrame directly, so the whole two-pass pipeline is one Catalyst
    plan with no driver-side collect. At 100 TB each iteration is one
    narrow pass over the scan + one k-bounded partial-aggregated
    shuffle.
    """
    raw = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    emb = fan_out(raw)
    # c0 from the UN-fanned scan (r18, guide §2.4/§6): identical k rows,
    # but the init broadcast's build job drops the insurance exchange and
    # vec_id < K reaches the parquet scan as a pushed filter
    c0 = raw.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    a1 = _assign(emb, c0)
    a2 = _assign(emb, _centroid_update(a1, "cluster"))

    n1 = a1.groupBy("cluster").agg(F.count("*").alias("n_iter1"))
    n2 = a2.groupBy("cluster").agg(F.count("*").alias("n_iter2"))
    return (
        n1.join(n2, "cluster", "full_outer")
        .select(
            "cluster",
            F.coalesce("n_iter1", F.lit(0)).alias("n_iter1"),
            F.coalesce("n_iter2", F.lit(0)).alias("n_iter2"),
        )
    )


# --------------------------------------------------------------------------
# Stratified deterministic sampling (sampleBy without rand())
# --------------------------------------------------------------------------

# Per-stratum keep thresholds on the first md5 byte (hex): 'en' keeps
# bucket < 0x80 (~50%), every other language < 0x1a (~10%).


@register(
    "sample_stratified",
    tags=("sample",),
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < (CASE WHEN lang = 'en' THEN '80' ELSE '1a' END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: ~50% of 'en' docs, ~10% of the
    rest, selected by md5(doc_id) hex buckets.

    The distributed-correct replacement for ``df.sampleBy`` in a training
    pipeline: the predicate is row-local (no shuffle, pushes to the
    scan), reproducible across runs/engines, and stable under
    repartitioning — ``rand()``-based sampling is none of those.
    """
    doc = table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("1a"))
    return doc.filter(bucket < thr).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# Intra-document repetition (Gopher-style quality signal)
# --------------------------------------------------------------------------

_WORDS = "split(text, ' ')"


@register(
    "text_repetition",
    tags=("text", "quality"),
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    base AS (SELECT doc_id, array_length(ws) AS n_words FROM w WHERE array_length(ws) >= 2),
    bg AS (SELECT doc_id,
                  unnest(list_transform(ws, (x, i) ->
                         CASE WHEN i < array_length(ws) THEN x || ' ' || ws[i + 1] END)) AS bigram
           FROM w WHERE array_length(ws) >= 2),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
            WHERE bigram IS NOT NULL GROUP BY doc_id, bigram),
    top AS (SELECT doc_id, MAX(c) AS top_bigram_cnt FROM cnt GROUP BY doc_id)
    SELECT base.doc_id AS doc_id, n_words, top_bigram_cnt,
           CAST(2 * top_bigram_cnt AS DOUBLE) / n_words AS rep_ratio
    FROM base JOIN top USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-bigram repetition ratio per document: the fraction of tokens
    covered by the single most frequent word bigram (2·count/n_words) —
    the classic repetition-removal quality signal for web-scale corpora.

    The bigram TRANSFORM is built and exploded inline (no pre-projected
    array column — see the InferFiltersFromGenerate note in dedup.py),
    but the word split binds to a column first (r17): the lambda
    re-evaluated split(text, ' ') TWICE per bigram position — transform
    lambdas are interpreted and loop-invariant subexpressions are not
    hoisted, an O(words²) term per document.  Binding just the split is
    safe from the filter-inference trap (the generate input stays a
    complex inline expression — the _shingles discipline).  The
    (doc, bigram) count shuffle is uniform because keys are doc-scoped.
    """
    doc = table(spark, sf_dir, "documents")
    bg = (
        doc.select("doc_id", F.expr(_WORDS).alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> concat(ws[i], ' ', ws[i+1]))"
                )
            ).alias("bigram"),
        )
    )
    top = (
        bg.groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_cnt"))
    )
    base = doc.select("doc_id", F.expr(f"size({_WORDS})").alias("n_words")).filter(
        F.col("n_words") >= 2
    )
    return base.join(top, "doc_id").select(
        "doc_id",
        "n_words",
        "top_bigram_cnt",
        ((F.lit(2) * F.col("top_bigram_cnt")).cast("double") / F.col("n_words")).alias("rep_ratio"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# --------------------------------------------------------------------------

DECON_N = 5  # n-gram width
BENCH_MAX_DOC = 20  # doc_id < 20 stands in for the held-out benchmark set


@register(
    "decontaminate_overlap",
    tags=("text", "decontamination"),
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(w) - {DECON_N - 1}, 0)),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    ),
    bench AS (SELECT DISTINCT s FROM g WHERE doc_id < {BENCH_MAX_DOC})
    SELECT g.doc_id, COUNT(*) AS n_shared_grams
    FROM g JOIN bench USING (s)
    WHERE g.doc_id >= {BENCH_MAX_DOC}
    GROUP BY g.doc_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: flag every training document sharing
    at least one distinct {DECON_N}-gram with the benchmark set
    (doc_id < {BENCH_MAX_DOC} stands in for the eval corpus), with the
    count of shared grams.

    The 100 TB shape: the benchmark gram set is tiny relative to the
    corpus, so it BROADCASTS — decontamination is then a narrow
    map+filter over the training scan (one gram explode, no corpus-side
    shuffle except the per-doc count)."""
    doc = table(spark, sf_dir, "documents")
    toks = fan_out(doc).select("doc_id", F.split("text", " ").alias("w"))
    # transform (and its if() short-doc guard: sequence(1, 0) is
    # descending in Spark, so w[i+3] would be out of bounds under ANSI
    # for a <DECON_N-word doc) stays INLINE in the explode
    # (InferFiltersFromGenerate / filter-pushdown — see _shingles)
    g = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"if(size(w) < {DECON_N}, array(),"
                    f" transform(sequence(1, size(w) - {DECON_N - 1}),"
                    " i -> concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2], w[i+3])))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    bench = g.filter(F.col("doc_id") < BENCH_MAX_DOC).select("s").distinct()
    return (
        g.filter(F.col("doc_id") >= BENCH_MAX_DOC)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


# --------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# --------------------------------------------------------------------------

VOCAB_SIZE = 50


@register(
    "vocab_coverage",
    tags=("text", "vocab"),
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    cnt AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    vocab AS (SELECT token FROM cnt
              QUALIFY row_number() OVER (ORDER BY c DESC, token) <= {VOCAB_SIZE}),
    totals AS (SELECT SUM(c) AS total_tokens, COUNT(*) AS distinct_tokens FROM cnt),
    oov AS (SELECT COALESCE(SUM(c), 0) AS oov_tokens FROM cnt
            WHERE token NOT IN (SELECT token FROM vocab))
    SELECT CAST(total_tokens AS BIGINT) AS total_tokens,
           distinct_tokens,
           CAST(oov_tokens AS BIGINT) AS oov_tokens,
           CAST(oov_tokens AS DOUBLE) / total_tokens AS oov_rate
    FROM totals, oov
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VOCAB_SIZE} vocabulary coverage: corpus token counts, then the
    out-of-vocabulary occurrence rate if only the most frequent
    {VOCAB_SIZE} tokens were kept (ties broken lexicographically).

    Two-level aggregation — per-token counts (map-side combined), then a
    scalar rollup; the vocab itself is a TakeOrderedAndProject and
    broadcasts back for the OOV anti-join."""
    doc = table(spark, sf_dir, "documents")
    toks = fan_out(doc).select(F.explode(F.split("text", " ")).alias("token"))
    cnt = toks.groupBy("token").agg(F.count("*").alias("c"))
    vocab = cnt.orderBy(F.desc("c"), "token").limit(VOCAB_SIZE).select("token")
    totals = cnt.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count("*").alias("distinct_tokens"),
    )
    oov = (
        cnt.join(F.broadcast(vocab), "token", "left_anti")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("oov_tokens"))
    )
    return totals.crossJoin(oov).select(
        "total_tokens",
        "distinct_tokens",
        "oov_tokens",
        (F.col("oov_tokens").cast("double") / F.col("total_tokens")).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# Sequence packing for training (greedy in-order token packing per shard)
# --------------------------------------------------------------------------

PACK_BUDGET = 512  # tokens per packed training sequence


@register(
    "pack_training_sequences",
    tags=("text", "packing"),
    oracle=f"""
    WITH d AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    c AS (SELECT source, doc_id, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
          FROM d)
    SELECT source, CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM c GROUP BY source, bin
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order packing of documents into {PACK_BUDGET}-token
    training sequences, independently per source shard: a document starts
    the bin its running token offset falls into (concat-then-chunk
    packing, W5's prefix-sum bucket assignment applied to the LLM
    pipeline). Reports docs and tokens per packed sequence.

    Partitioning by ``source`` keeps the prefix-sum window parallel — the
    100 TB version packs within shards for exactly this reason (a single
    global ordering would serialize on one task)."""
    from pyspark.sql.window import Window

    doc = table(spark, sf_dir, "documents")
    d = doc.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    c = d.withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        c.groupBy("source", (F.col("start_tok") / PACK_BUDGET).cast("bigint").alias("bin"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    )


# --------------------------------------------------------------------------
# LSH quality evaluation: precision/recall against planted near-duplicates
# --------------------------------------------------------------------------

_MUT_EVERY = 7  # mutate every 7th word of the planted near-duplicates
_JACCARD_THRESH = 0.5


@register(
    "lsh_quality_eval",
    tags=("dedup", "lsh", "evaluation"),
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(list_transform(string_split(text, ' '),
                      (x, i) -> CASE WHEN (i - 1) % {_MUT_EVERY} = 0 THEN 'zz' || x ELSE x END), ' ')
      FROM documents WHERE doc_id % 7 = 0
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
      )
    ),
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
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
    ),
    planted AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
                FROM documents WHERE doc_id % 7 = 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
                 AND a.s = b.s
      GROUP BY c.doc_a, c.doc_b
    ),
    jac AS (
      SELECT c.doc_a, c.doc_b,
             CAST(COALESCE(i.n_common, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(i.n_common, 0)) AS j
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
    )
    SELECT (SELECT COUNT(*) FROM planted) AS n_planted,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM cand JOIN planted USING (doc_a, doc_b)) AS n_planted_found,
           CAST((SELECT COUNT(*) FROM cand JOIN planted USING (doc_a, doc_b)) AS DOUBLE)
           / (SELECT COUNT(*) FROM planted) AS recall,
           (SELECT COUNT(*) FROM jac WHERE j >= {_JACCARD_THRESH}) AS n_verified,
           CAST((SELECT COUNT(*) FROM jac WHERE j >= {_JACCARD_THRESH}) AS DOUBLE)
           / (SELECT COUNT(*) FROM cand) AS precision
    """,
)
def lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the MinHash-LSH configuration itself: plant deterministic
    near-duplicates (every {_MUT_EVERY}th word mutated), run the same
    band/signature pipeline, and report recall against the planted pairs
    plus precision under true shingle-Jaccard ≥ {_JACCARD_THRESH}.

    The meta-operator a production dedup pipeline needs before trusting
    an LSH config at 100 TB: both metrics come from joins against sets
    that are tiny relative to the corpus (planted pairs, candidate
    pairs), so evaluation cost is dominated by the same one-pass
    signature computation as the dedup itself."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(split(text, ' '),"
            f" (x, i) -> case when i % {_MUT_EVERY} = 0 then concat('zz', x) else x end))"
        ).alias("text"),
    )
    corpus = fan_out(d.unionAll(mutated))
    toks = corpus.select("doc_id", F.split("text", " ").alias("w"))
    # inline if() short-doc guard: sequence(1, 0) is descending in Spark
    # — see _shingles
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(w) < 3, array(),"
                " transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"
            )
        ).alias("s"),
    ).distinct()
    # production LSH config EXACTLY (dedup_minhash_lsh): independent
    # per-band md5 hashes AND the h0-keyed hub df-cap — the eval must
    # measure recall/precision of the config actually deployed.  (This
    # realignment is what exposed the Kirsch-Mitzenmacher recall loss:
    # the KM scheme scored 43/72 planted pairs here vs 66/72 for
    # independent bands — sf0.01, pinned in tests/test_lsh_df_cap.py —
    # and was retired from production as a result.)
    hashed = sh.select(
        "doc_id", *[_band_hash_col(b).alias(f"h{b}") for b in range(N_BANDS)]
    )
    hubs = (
        hashed.groupBy("h0")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > LSH_DF_CAP)
        .select("h0")
    )
    capped = hashed.join(F.broadcast(hubs), "h0", "left_anti")
    sigs = capped.groupBy("doc_id").agg(
        *[F.min(F.col(f"h{b}")).alias(f"sig_{b}") for b in range(N_BANDS)]
    )
    stack_args = ", ".join(f"{b}, sig_{b}" for b in range(N_BANDS))
    mh = sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )
    a, b = mh.alias("a"), mh.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    planted = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1_000_000).alias("doc_b")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "s")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        cand.join(sa, "doc_a").join(sb, ["doc_b", "s"]).groupBy("doc_a", "doc_b").agg(
            F.count("*").alias("n_common")
        )
    )
    jac = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("n_common", F.lit(0)))
            ).alias("j")
        )
    )
    n_planted = planted.agg(F.count("*").alias("n_planted"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_found = cand.join(planted, ["doc_a", "doc_b"]).agg(F.count("*").alias("n_planted_found"))
    n_ver = jac.filter(F.col("j") >= _JACCARD_THRESH).agg(F.count("*").alias("n_verified"))
    return (
        n_planted.crossJoin(n_cand)
        .crossJoin(n_found)
        .crossJoin(n_ver)
        .select(
            "n_planted",
            "n_candidates",
            "n_planted_found",
            # try_divide: an empty corpus has nothing planted/candidated —
            # NULL ratios, not an ANSI divide-by-zero crash (the oracle is
            # unaffected: denominators are nonzero on any nonempty input)
            F.try_divide(F.col("n_planted_found").cast("double"), F.col("n_planted")).alias(
                "recall"
            ),
            "n_verified",
            F.try_divide(F.col("n_verified").cast("double"), F.col("n_candidates")).alias(
                "precision"
            ),
        )
    )


# --------------------------------------------------------------------------
# Dataset mixing: per-source keep rates toward a target token distribution
# --------------------------------------------------------------------------


@register(
    "dataset_mix_weights",
    tags=("text", "mixing"),
    oracle="""
    WITH s AS (
      SELECT source,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 0.07 ELSE 0.03 END AS target_share,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT SUM(n_tokens) AS total_tokens FROM s)
    SELECT source, n_docs, n_tokens,
           CAST(target_share AS DOUBLE) AS target_share,
           least(CAST(1.0 AS DOUBLE), CAST(target_share AS DOUBLE) * total_tokens / n_tokens) AS keep_rate
    FROM s, t
    """,
)
def dataset_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing weights: given target corpus shares per source
    (here a deterministic 0.07/0.03 split by source parity), compute the
    per-source keep-rate that reaches the target token distribution —
    the planning step before `sample_stratified` executes the mix.

    One partially-aggregated shuffle on ``source`` plus a broadcast of
    the one-row total; everything downstream of the counts is exact
    integer→double arithmetic, identical across engines."""
    doc = table(spark, sf_dir, "documents")
    s = doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "target_share",
        F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.07)).otherwise(
            F.lit(0.03)
        ),
    )
    total = s.agg(F.sum("n_tokens").alias("total_tokens"))
    return s.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.col("target_share").cast("double").alias("target_share"),
        F.least(
            F.lit(1.0),
            F.col("target_share").cast("double") * F.col("total_tokens") / F.col("n_tokens"),
        ).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# Learned IVF: k-means centroids as the coarse quantizer for ANN probes
# --------------------------------------------------------------------------


@register(
    "ivf_kmeans_probe",
    tags=("similarity", "ann", "iterative"),
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c0 AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < {KMEANS_K}),
    t1 AS (SELECT e.vec_id, c0.cluster,
                  unnest(list_transform(e.v, (x, i) ->
                         CAST((x - c0.c[i]) * (x - c0.c[i]) AS DECIMAL(28,12)))) AS t
           FROM e, c0),
    d1 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t1 GROUP BY vec_id, cluster),
    a1 AS (SELECT vec_id, cluster FROM d1
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    m1 AS (SELECT a1.cluster, i.i AS i,
                  CAST(SUM(CAST(e.v[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
           FROM a1 JOIN e USING (vec_id), range(1, {EMB_DIM + 1}) i(i)
           GROUP BY a1.cluster, i.i),
    t2 AS (SELECT e.vec_id, m1.cluster,
                  CAST((e.v[m1.i] - m1.cv) * (e.v[m1.i] - m1.cv) AS DECIMAL(28,12)) AS t
           FROM e, m1),
    d2 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t2 GROUP BY vec_id, cluster),
    a2 AS (SELECT vec_id, cluster FROM d2
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    qc AS (SELECT cluster FROM a2 WHERE vec_id = {QUERY_VEC_FOR_IVF}),
    cand AS (SELECT a2.vec_id FROM a2, qc WHERE a2.cluster = qc.cluster),
    qv AS (SELECT v FROM e WHERE vec_id = {QUERY_VEC_FOR_IVF}),
    prods AS (
      SELECT c.vec_id,
             unnest(list_transform(e.v, (x, i) -> CAST(x * q.v[i] AS DECIMAL(28,12)))) AS xy,
             unnest(list_transform(e.v, (x, i) -> CAST(x * x AS DECIMAL(28,12)))) AS xx,
             unnest(list_transform(q.v, (y, i) -> CAST(y * y AS DECIMAL(28,12)))) AS yy
      FROM cand c JOIN e ON e.vec_id = c.vec_id, qv q
    )
    SELECT vec_id,
           CAST(SUM(xy) AS DOUBLE) /
           (sqrt(CAST(SUM(xx) AS DOUBLE)) * sqrt(CAST(SUM(yy) AS DOUBLE))) AS cosine
    FROM prods GROUP BY vec_id
    HAVING SUM(xx) > 0 AND SUM(yy) > 0
    ORDER BY cosine DESC, vec_id
    LIMIT {IVF_TOP_K}
    """,
)
def ivf_kmeans_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN with a LEARNED coarse quantizer: the k-means centroids from
    one Lloyd update become the IVF cell assignment; the probe searches
    only the query's cell, with exact DECIMAL cosine inside it.

    Completes the ANN family: cosine_topk_bruteforce (exact baseline) →
    cosine_topk_ivf[_pruned] (label as given cells) → this (cells
    LEARNED from the data, end-to-end in one declarative plan: train,
    assign, probe). At 100 TB the assignment is a narrow map, cells are
    written out partitioned (as in the _pruned variant), and each query
    touches 1/k of the data."""
    raw = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    emb = fan_out(raw)
    # c0/qvec from the UN-fanned scan (r18) — see kmeans_lloyd: identical
    # rows, no insurance exchange in their broadcast builds, vec_id
    # predicates pushed into the parquet scan
    c0 = raw.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    a1 = _assign(emb, c0)
    a2 = _assign(emb, _centroid_update(a1, "cluster"))
    qcell = a2.filter(F.col("vec_id") == QUERY_VEC_FOR_IVF).select(F.col("cluster").alias("qc"))
    qvec = raw.filter(F.col("vec_id") == QUERY_VEC_FOR_IVF).select(F.col("v").alias("qv"))
    cand = a2.join(F.broadcast(qcell), F.col("cluster") == F.col("qc"))
    prod = f"zip_with(v, qv, (x, y) -> cast(x * y as {_DEC}))"
    sq = f"transform(v, x -> cast(x * x as {_DEC}))"
    qsq = f"transform(qv, y -> cast(y * y as {_DEC}))"
    return (
        cand.crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            # zero-norm guard: see similarity._cosine_scores
            F.try_divide(
                F.expr(_dec_sum(prod)),
                F.sqrt(F.expr(_dec_sum(sq))) * F.sqrt(F.expr(_dec_sum(qsq))),
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(IVF_TOP_K)
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means blocking + in-cluster cosine pruning
# --------------------------------------------------------------------------

SEM_K = 8  # minimum clusters for the semantic blocking pass
SEM_TARGET = 512  # target cluster size: K = max(SEM_K, ceil(n / SEM_TARGET))
SEM_TAU = 0.99  # prune threshold (planted near-dups score ~0.9999)
# Planted-copy id offset.  Must clear the corpus id range at ANY probe
# scale, not just the bench SFs: the historical +100,000 aliased ~9k
# planted ids onto REAL vec_ids on the 100x scale tile (ids 0..199,999),
# fanning out every join-by-vec_id in the oracles and keying the decision
# list ambiguously (found while closing the r13 100x oracle gap, VERDICT
# r13 order #2).  1e9 clears a 10,000x tile of the sf0.1 corpus with two
# orders of margin; the literal appears in both oracle SQL bodies via
# f-string interpolation so engine and oracle can never diverge.
SEM_PLANT_OFFSET = 1_000_000_000


def _score_clusters_numpy(assigned: DataFrame) -> DataFrame:
    """SemDeDup scoring phase shared by the production paths: one numpy
    cosine matmul per cluster group (Arrow-batched grouped map), emitting
    the prune decision list (cluster, vec_pruned, kept_vec).  Input must
    have columns (vec_id, v, cluster)."""
    import pandas as pd

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        M = np.asarray(pdf["v"].to_list(), dtype=np.float64)[order]
        nrm = np.sqrt(np.einsum("ij,ij->i", M, M))
        ok = nrm > 0.0
        U = np.where(ok[:, None], M / np.where(ok, nrm, 1.0)[:, None], 0.0)
        C = U @ U.T
        mask = C >= SEM_TAU
        mask[~ok, :] = False
        mask[:, ~ok] = False
        mask[np.tril_indices(len(ids))] = False  # keep i<j in vec_id order
        has = mask.any(axis=0)
        kept = mask.argmax(axis=0)  # first True = lowest kept vec_id
        return pd.DataFrame(
            {
                "cluster": np.full(int(has.sum()), pdf["cluster"].iloc[0], dtype=np.int64),
                "vec_pruned": ids[has],
                "kept_vec": ids[kept[has]],
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        score, "cluster bigint, vec_pruned bigint, kept_vec bigint"
    )


def _semdedup_corpus(spark: SparkSession, sf_dir: str):
    """Planted corpus + adaptive-K scalar, shared by the flat and IVF
    blocking phases.  Returns (corpus, kk, raw): ``corpus`` is the
    fan_out-spread frame the heavy argmin passes iterate over; ``raw``
    is the SAME union before the insurance repartition — the init/scalar
    subtrees (the adaptive-K count here, c0 in the callers) must derive
    from ``raw``, not ``corpus`` (r18, guide §2.4): count(*) and a
    vec_id filter commute with repartition, so reading through fan_out
    only adds the insurance exchange to every broadcast-build job that
    materializes those tiny frames (measured: the corpus
    scan→repartition re-executed inside 4+ broadcast subquery builds per
    IVF invocation, tools/r18_ivf_jobs.py), and at 100 TB it puts a full
    corpus shuffle under a scalar count that needs none."""
    emb0 = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    planted = emb0.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + SEM_PLANT_OFFSET).alias("vec_id"),
        F.expr("transform(v, (x, i) -> if(i = 0, x * 1.01d, x))").alias("v"),
    )
    raw = emb0.unionAll(planted)
    corpus = fan_out(raw)
    kk = raw.agg(
        F.greatest(
            F.lit(SEM_K), F.ceil(F.count("*") / float(SEM_TARGET)).cast("long")
        ).alias("k")
    )
    return corpus, kk, raw


def _semdedup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SemDeDup blocking phase: plant the near-dups, pick adaptive
    K = max(SEM_K, ceil(n/SEM_TARGET)), run one Lloyd update from the
    deterministic init, and return (vec_id, v, cluster).  Distance/centroid
    arithmetic is exact DECIMAL so the cluster labels are bit-identical
    across engines AND row orders — both the oracle-twin (DECIMAL scoring)
    and the production path (numpy scoring) consume the same blocking."""
    corpus, kk, raw = _semdedup_corpus(spark, sf_dir)
    # c0 from the UN-fanned union (r18): the k-row init frame is
    # identical — the filter commutes with the repartition — but its
    # broadcast build no longer executes the insurance exchange
    c0 = (
        raw.crossJoin(F.broadcast(kk))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("cluster"), F.col("v").alias("c"))
    )
    a1 = _assign(corpus, c0)
    return _assign(corpus, _centroid_update(a1, "cluster"))


# Shared oracle CTE prefix: plant + adaptive K + one DECIMAL Lloyd update
# (mirrors _semdedup_assign exactly; both the DECIMAL oracle-twin and the
# numpy production path append their own scoring tail to it).
_SEM_ASSIGN_SQL = f"""
    WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
    e AS (
      SELECT vec_id, v FROM e0
      UNION ALL
      SELECT vec_id + {SEM_PLANT_OFFSET},
             list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x * 1.01 ELSE x END)
      FROM e0 WHERE vec_id % 11 = 0
    ),
    kk AS (SELECT greatest({SEM_K}, CAST(ceil(COUNT(*) / {SEM_TARGET}.0) AS BIGINT)) AS k
           FROM e),
    c0 AS (SELECT vec_id AS cluster, v AS c FROM e, kk WHERE vec_id < kk.k),
    t1 AS (SELECT e.vec_id, c0.cluster,
                  unnest(list_transform(e.v, (x, i) ->
                         CAST((x - c0.c[i]) * (x - c0.c[i]) AS DECIMAL(28,12)))) AS t
           FROM e, c0),
    d1 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t1 GROUP BY vec_id, cluster),
    a1 AS (SELECT vec_id, cluster FROM d1
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    m1 AS (SELECT a1.cluster, i.i AS i,
                  CAST(SUM(CAST(e.v[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
           FROM a1 JOIN e USING (vec_id), range(1, {EMB_DIM + 1}) i(i)
           GROUP BY a1.cluster, i.i),
    t2 AS (SELECT e.vec_id, m1.cluster,
                  CAST((e.v[m1.i] - m1.cv) * (e.v[m1.i] - m1.cv) AS DECIMAL(28,12)) AS t
           FROM e, m1),
    d2x AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t2 GROUP BY vec_id, cluster),
    a2 AS (SELECT vec_id, cluster FROM d2x
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1)"""


@register(
    "semdedup_prune",
    tags=("dedup", "similarity", "embedding", "iterative"),
    oracle=_SEM_ASSIGN_SQL
    + f""",
    ex AS (SELECT e.vec_id, a2.cluster,
                  unnest(list_transform(e.v, (x, i) -> {{'i': i, 'x': x}}),
                         recursive := true)
           FROM e JOIN a2 USING (vec_id)),
    norms AS (SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS xx
              FROM ex GROUP BY vec_id),
    dots AS (SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb,
                    CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dotp
             FROM ex a JOIN ex b
               ON a.cluster = b.cluster AND a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY a.cluster, a.vec_id, b.vec_id),
    scored AS (SELECT cluster, va, vb, dotp / (sqrt(na.xx) * sqrt(nb.xx)) AS cos
               FROM dots
               JOIN norms na ON na.vec_id = va
               JOIN norms nb ON nb.vec_id = vb)
    SELECT cluster, vec_pruned, kept_vec, ROUND(cos, 6) AS cosine
    FROM (SELECT cluster, vb AS vec_pruned, va AS kept_vec, cos,
                 row_number() OVER (PARTITION BY vb ORDER BY va) AS rn
          FROM scored WHERE cos >= {SEM_TAU})
    WHERE rn = 1
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    blocking — cluster the embedding corpus (one Lloyd update from
    deterministic init, exactly the ivf_kmeans_probe quantizer), then
    compute pairwise cosine ONLY within each cluster and prune every
    vector whose cosine to a lower-id cluster-mate reaches {SEM_TAU}
    (survivor = lowest vec_id, the dedup_exact/minhash convention;
    kept_vec = the lowest-id partner, so the output is the prune
    *decision list*). The synthetic corpus has no natural near-dups (max
    in-label cosine ~0.47), so the input re-ingests every 11th vector
    with one element scaled 1.01 (cos ~0.9999) — the operator must find
    exactly those planted copies, and both engines plant identically.

    Scale shape: clustering is the SemDeDup point — all-pairs cosine is
    quadratic, pairs-within-cluster is ~(n/k)² per cell and
    embarrassingly parallel across cells. K is therefore ADAPTIVE:
    max({SEM_K}, ceil(n/{SEM_TARGET})), computed identically on both
    engines from one count, so cell size — and with it per-cell pair
    work AND the worst single task — stays bounded as the corpus grows
    (a fixed K=8 run at 10x data put ~all pairs in one mega-cluster:
    one straggler task ran minutes while the other cells took seconds).
    The centroid table (k rows) broadcasts for assignment (no shuffle);
    the pair join shuffles once on the cluster id; norms ride along
    in-row. DECIMAL accumulation keeps both engines bit-identical;
    ranking/threshold use the raw double."""
    # checkpoint the assignment: the k*dim DECIMAL argmin subplan (scan ->
    # a1 -> cent1 -> a2) would otherwise execute on BOTH sides of the pair
    # self-join — measured 2x+ of the operator's wall time at 10x data.
    # LAZY so building the DataFrame (e.g. `cli explain`) runs no jobs;
    # materialization happens once at first execution and is then reused.
    a2 = (
        _semdedup_assign(spark, sf_dir)
        .withColumn(
            "xx",
            F.expr(f"cast({_dec_sum('transform(v, x -> cast(x * x as ' + _DEC + '))')} as double)"),
        )
        .localCheckpoint(eager=False)
    )
    dot = (
        f"cast({_dec_sum(f'zip_with(a.v, b.v, (x, y) -> cast(x * y as {_DEC}))')} as double)"
    )
    a, b = a2.alias("a"), a2.alias("b")
    scored = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.cluster").alias("cluster"),
        F.col("a.vec_id").alias("kept_vec"),
        F.col("b.vec_id").alias("vec_pruned"),
        # zero-norm guard (see similarity._cosine_scores); the NULL cos of
        # a zero-norm pair then fails the >= SEM_TAU filter in BOTH engines
        F.try_divide(F.expr(dot), F.sqrt("a.xx") * F.sqrt("b.xx")).alias("cos"),
    )
    w = W.partitionBy("vec_pruned").orderBy("kept_vec")
    return (
        scored.filter(F.col("cos") >= SEM_TAU)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster", "vec_pruned", "kept_vec", F.round("cos", 6).alias("cosine"))
    )


@register(
    "semdedup_prune_fast",
    headline2=True,
    tags=("dedup", "similarity", "embedding", "pandas-udf"),
    oracle=_SEM_ASSIGN_SQL
    + f""",
    ex AS (SELECT e.vec_id, a2.cluster,
                  unnest(list_transform(e.v, (x, i) -> {{'i': i, 'x': x}}),
                         recursive := true)
           FROM e JOIN a2 USING (vec_id)),
    norms AS (SELECT vec_id, SUM(x * x) AS xx FROM ex GROUP BY vec_id),
    dots AS (SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dotp
             FROM ex a JOIN ex b
               ON a.cluster = b.cluster AND a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY a.cluster, a.vec_id, b.vec_id),
    scored AS (SELECT cluster, va, vb, dotp / (sqrt(na.xx) * sqrt(nb.xx)) AS cos
               FROM dots
               JOIN norms na ON na.vec_id = va
               JOIN norms nb ON nb.vec_id = vb
               WHERE na.xx > 0 AND nb.xx > 0)
    SELECT cluster, vb AS vec_pruned, CAST(MIN(va) AS BIGINT) AS kept_vec
    FROM scored WHERE cos >= {SEM_TAU}
    GROUP BY cluster, vb
    """,
)
def semdedup_prune_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup production path: identical blocking to ``semdedup_prune``
    (shared ``_semdedup_assign`` — exact DECIMAL Lloyd update, so both
    engines put every vector in the same cluster), but the in-cluster
    pairwise cosine runs as ONE numpy matmul per cluster inside an
    Arrow-batched ``applyInPandas`` instead of a DECIMAL zip_with
    self-join.  Output is the prune decision list only (no float cosine
    column): the planted near-dups score ~0.9999 vs the natural max
    ~0.47 against the {SEM_TAU} threshold, so the ~1e-13 summation-order
    noise between BLAS, Spark, and DuckDB can never flip membership —
    the decision set is engine-exact even though the scoring is double.

    Scale shape: the grouped-map shuffle is one pass keyed on the
    cluster id, and adaptive K bounds each group near {SEM_TARGET} rows,
    so the per-task matmul is ~{SEM_TARGET}x{SEM_TARGET}x{EMB_DIM} —
    constant work per task, task count grows linearly with the corpus.
    This is the SemDeDup paper's own execution shape (per-cluster dense
    matmuls); the DECIMAL twin exists to give the driver a bit-exact
    oracle, at ~5x the cost.

    Known scale term: the shared assignment phase is n*K distances with
    K = n/{SEM_TARGET}, i.e. O(n²/{SEM_TARGET}) — measured 45s at the
    30x local probe vs 2s at sf0.1 (the scoring phase stays linear).
    It is kept flat + DECIMAL deliberately, so the production path makes
    IDENTICAL decisions to the oracle twin (pinned in
    tests/test_semdedup_paths.py).  The 100 TB escape hatch is a
    two-level (coarse-then-fine, IVF-style) assignment — O(n*sqrt(K)) —
    mirrored on both engine sides; it is registered as its own query
    (``semdedup_prune_ivf``, below) so this decision-list contract stays
    intact."""
    return _score_clusters_numpy(_semdedup_assign(spark, sf_dir))


# --------------------------------------------------------------------------
# SemDeDup two-level (IVF-style) blocking: the O(n·√K) assignment
# --------------------------------------------------------------------------
#
# The flat assignment above is n·K distances with K = n/SEM_TARGET, i.e.
# O(n²/SEM_TARGET) — the one super-linear term left in the family (45s at
# the 30× local probe).  This variant blocks in two exact DECIMAL levels:
# K1 = ceil(√K) coarse cells (one Lloyd update), then per-cell fine
# subclusters sized to SEM_TARGET (one Lloyd update inside each cell) —
# O(n·√K) total distance work, labels still bit-identical across engines.
# Nested blocking is NOT flat k-means, so its decision list legitimately
# differs from semdedup_prune/semdedup_prune_fast; the quality contract is
# planted-near-dup recall (tests/test_semdedup_paths.py pins it at 100%).
#
# Registered in round 7 (the r5 verdict froze registrations outside its
# sanctioned items; the r6 verdict ordered this registration): the
# `register(...)` call sits below SEMDEDUP_IVF_ORACLE_SQL, and the r7
# driver window includes the name (see queries/__init__.py ordering).

SEM_IVF_MIN_COARSE = 4  # K1 = max(this, ceil(sqrt(K)))
SEM_IVF_CELL_SHIFT = 1_000_000  # composite label = coarse * shift + fine


def _ivf_ckpt_mode() -> str:
    """How _semdedup_assign_ivf truncates lineage at the coarse
    assignment (A/B toggle): 'off' = none (the pre-r8 plan, coarse
    subtree re-evaluates ~4x), 'pairs' = checkpoint (vec_id, g, rn)
    only, 'mem' = checkpoint with the vector, 'memw' = mem behind an
    explicit wide repartition (the default), 'cache' = diagnosis only.

    Decision evidence (tools/run_ivf_ckpt_ab.py, fresh process per cell,
    idle box, min-of-3; VERIFICATION_r8.md §4a): off/pairs/mem/memw =
    4.46/4.05/4.16/4.64 s at sf0.1, 7.49/18.22/8.67/5.64 at 10x,
    22.11/11.88/23.74/11.33 at 30x.  memw wins 1.33x at 10x and 1.95x
    at 30x and ties at sf0.1; the naive variants LOST at 10x because
    AQE coalesces the small assignment shuffle to one partition and the
    checkpoint freezes that layout, serializing the fine phase — the
    explicit repartition (exempt from AQE coalescing) is what makes the
    checkpoint safe.  All modes produce identical decision lists."""
    import os

    v = os.environ.get("SPARK_GRAFT_SEMDEDUP_IVF_CKPT", "memw")
    return {"0": "off", "1": "pairs", "2": "mem"}.get(v, v)


def _assign_in_cell(members: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-fine-centroid assignment WITHIN each coarse cell: the per-
    cell centroid lists (K total rows) broadcast, argmin runs in-row —
    exact DECIMAL distances, ties to the lowest fine id (struct ordering
    mirrors the oracle's ORDER BY d2, fid).  Same double pre-select as
    _assign (the fine phase is the larger half of the O(n·√K) work)."""
    packed = cents.groupBy("g").agg(
        F.collect_list(
            F.struct(F.col("fid").alias("cluster"), F.col("c").alias("c"))
        ).alias("cs")
    )
    return _argmin_select(
        members.join(F.broadcast(packed), "g"), "v", ["vec_id", "v", "g"]
    ).withColumnRenamed("cluster", "fid")


def _semdedup_assign_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level blocking: coarse K1-means (one Lloyd update, flat
    algorithm at √K scale), then per-cell fine subclustering (init = the
    K_g lowest vec_ids of the cell, one Lloyd update).  Returns
    (vec_id, v, cluster) with the composite bigint label."""
    corpus, kk, raw = _semdedup_corpus(spark, sf_dir)
    kk1 = kk.select(
        F.greatest(
            F.lit(SEM_IVF_MIN_COARSE), F.ceil(F.sqrt(F.col("k").cast("double"))).cast("long")
        ).alias("k1")
    )
    # c0 from the UN-fanned union (r18) — see _semdedup_corpus
    c0 = (
        raw.crossJoin(F.broadcast(kk1))
        .filter(F.col("vec_id") < F.col("k1"))
        .select(F.col("vec_id").alias("cluster"), F.col("v").alias("c"))
    )
    a1 = _assign(corpus, c0)
    coarse = _assign(corpus, _centroid_update(a1, "cluster")).withColumnRenamed("cluster", "g")
    mode = _ivf_ckpt_mode()
    if mode == "pairs":
        # variant A: checkpoint only the ~24 B/row (vec_id, g, rn)
        # assignment; consumers re-derive v via a corpus join
        asg = (
            coarse.select("vec_id", "g")
            .withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("vec_id")))
            .localCheckpoint(eager=True)
        )
        mem = corpus.join(asg, "vec_id").select("vec_id", "v", "g", "rn")
        kg_src = asg
    elif mode == "mem":
        # variant B: checkpoint the assignment WITH its vector (~540 B/row)
        # so no consumer needs a rejoin
        mem = (
            coarse.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("vec_id")))
            .localCheckpoint(eager=True)
        )
        kg_src = mem
    elif mode == "cache":
        # variant C (diagnosis only, NOT production-eligible: Spark's
        # cache matches by logical-plan equality, so a later identical
        # call would silently reuse the entry — per-call cost becomes
        # unrepresentative and bench repeats dishonest)
        mem = coarse.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy("vec_id"))
        ).cache()
        kg_src = mem
    elif mode == "memw":
        # variant D: 'mem' + an explicit wide repartition BEFORE the
        # checkpoint.  Root cause of mem/pairs underperforming at the
        # 10x probe: AQE coalesces the small row_number shuffle to ONE
        # partition, the checkpoint materializes that layout, and the
        # expensive fine phase downstream runs single-task.  An explicit
        # repartition is exempt from AQE coalescing, so the materialized
        # assignment stays executor-wide at every scale.
        # r17 (late): the width is anchored to the CORPUS SCAN's own
        # parallelism, capped at the core count — fan_out already derives
        # that from the measured input size, so a bench-scale corpus (7
        # partitions at sf0.1) no longer fans the checkpoint to 32
        # overhead-bound tasks, while at the 10x tile and beyond the
        # anchor saturates at defaultParallelism and the materialized
        # layout is exactly the pre-change one.  Decision list proven
        # identical and measured -6.5% min / -8.8% med on the full query
        # (interleaved in-process A/B, 6 rounds).
        # r18 (ADVICE r17 #2 examined): the anchor CAN be 1 when the rows
        # floor leaves a sub-512-row corpus on one partition — but for
        # THIS operator that case is self-limiting, not the variant-D
        # pathology: n < 512 forces kg = ceil(n_g/SEM_TARGET) = 1 fine
        # centroid per cell, so the single-task fine phase does ~one
        # distance per row.  Per-row fine work scales with n_g/SEM_TARGET
        # and only grows once n (and with it the anchor) does; a declared
        # work_factor here would guard a load this operator cannot reach.
        mem = (
            coarse.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("vec_id")))
            .repartition(
                min(spark.sparkContext.defaultParallelism, corpus.rdd.getNumPartitions())
            )
            .localCheckpoint(eager=True)
        )
        kg_src = mem
    else:
        mem = coarse.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("vec_id")))
        kg_src = coarse
    # per-cell fine budget + deterministic init (lowest K_g vec_ids)
    kg = kg_src.groupBy("g").agg(F.count("*").alias("n_g")).select(
        "g",
        F.greatest(F.lit(1), F.ceil(F.col("n_g") / float(SEM_TARGET)).cast("long")).alias("kg"),
    )
    finit = (
        mem.join(F.broadcast(kg), "g")
        .filter(F.col("rn") <= F.col("kg"))
        .select("g", (F.col("rn") - 1).alias("fid"), F.col("v").alias("c"))
    )
    members = mem.select("vec_id", "v", "g")
    fa1 = _assign_in_cell(members, finit)
    fcent = _centroid_update(fa1, "g", "fid")
    fa2 = _assign_in_cell(members, fcent)
    return fa2.select(
        "vec_id", "v", (F.col("g") * SEM_IVF_CELL_SHIFT + F.col("fid")).alias("cluster")
    )


def semdedup_prune_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the O(n·√K) two-level blocking and numpy scoring —
    the 100 TB production shape.  Assignment cost is n·(√K + n_g/√K)
    distances instead of n·K: measured 24.9s vs 45.2s at the 30× local
    probe, with planted-near-dup recall pinned at 100% and 63,454/63,455
    decisions identical to the flat path (tests/test_semdedup_paths.py).

    Since r8 the coarse assignment is localCheckpoint-ed behind an
    explicit wide repartition (_ivf_ckpt_mode 'memw'): the r7 plan
    re-evaluated the 2-distance-pass coarse subtree ~4x (52 exchanges);
    truncating it wins 1.33x at 10x and 1.95x at 30x and ties at sf0.1
    (clean per-process A/B in tools/run_ivf_ckpt_ab.py; decision math
    and the AQE single-partition trap in _ivf_ckpt_mode's docstring)."""
    return _score_clusters_numpy(_semdedup_assign_ivf(spark, sf_dir))


SEMDEDUP_IVF_ORACLE_SQL = f"""
    WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
    e AS (
      SELECT vec_id, v FROM e0
      UNION ALL
      SELECT vec_id + {SEM_PLANT_OFFSET},
             list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x * 1.01 ELSE x END)
      FROM e0 WHERE vec_id % 11 = 0
    ),
    kk AS (SELECT greatest({SEM_K}, CAST(ceil(COUNT(*) / {SEM_TARGET}.0) AS BIGINT)) AS k
           FROM e),
    kk1 AS (SELECT greatest({SEM_IVF_MIN_COARSE},
                            CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT)) AS k1 FROM kk),
    c0 AS (SELECT vec_id AS cluster, v AS c FROM e, kk1 WHERE vec_id < kk1.k1),
    t1 AS (SELECT e.vec_id, c0.cluster,
                  unnest(list_transform(e.v, (x, i) ->
                         CAST((x - c0.c[i]) * (x - c0.c[i]) AS DECIMAL(28,12)))) AS t
           FROM e, c0),
    d1 AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t1 GROUP BY vec_id, cluster),
    a1 AS (SELECT vec_id, cluster FROM d1
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    m1 AS (SELECT a1.cluster, i.i AS i,
                  CAST(SUM(CAST(e.v[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
           FROM a1 JOIN e USING (vec_id), range(1, {EMB_DIM + 1}) i(i)
           GROUP BY a1.cluster, i.i),
    t2 AS (SELECT e.vec_id, m1.cluster,
                  CAST((e.v[m1.i] - m1.cv) * (e.v[m1.i] - m1.cv) AS DECIMAL(28,12)) AS t
           FROM e, m1),
    d2x AS (SELECT vec_id, cluster, SUM(t) AS d2 FROM t2 GROUP BY vec_id, cluster),
    a2 AS (SELECT vec_id, cluster AS g FROM d2x
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
    kg AS (SELECT g, greatest(1, CAST(ceil(COUNT(*) / {SEM_TARGET}.0) AS BIGINT)) AS kg
           FROM a2 GROUP BY g),
    mem AS (SELECT e.vec_id, e.v, a2.g,
                   row_number() OVER (PARTITION BY a2.g ORDER BY e.vec_id) AS rn
            FROM e JOIN a2 USING (vec_id)),
    finit AS (SELECT mem.g, mem.rn - 1 AS fid, mem.v AS c
              FROM mem JOIN kg USING (g) WHERE mem.rn <= kg.kg),
    ft1 AS (SELECT mem.vec_id, mem.g, finit.fid,
                   unnest(list_transform(mem.v, (x, i) ->
                          CAST((x - finit.c[i]) * (x - finit.c[i]) AS DECIMAL(28,12)))) AS t
            FROM mem JOIN finit ON finit.g = mem.g),
    fd1 AS (SELECT vec_id, g, fid, SUM(t) AS d2 FROM ft1 GROUP BY vec_id, g, fid),
    fa1 AS (SELECT vec_id, g, fid FROM fd1
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, fid) = 1),
    fm1 AS (SELECT fa1.g, fa1.fid, i.i AS i,
                   CAST(SUM(CAST(e.v[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
            FROM fa1 JOIN e USING (vec_id), range(1, {EMB_DIM + 1}) i(i)
            GROUP BY fa1.g, fa1.fid, i.i),
    ft2 AS (SELECT mem.vec_id, mem.g, fm1.fid,
                   CAST((mem.v[fm1.i] - fm1.cv) * (mem.v[fm1.i] - fm1.cv) AS DECIMAL(28,12)) AS t
            FROM mem JOIN fm1 ON fm1.g = mem.g),
    fd2 AS (SELECT vec_id, g, fid, SUM(t) AS d2 FROM ft2 GROUP BY vec_id, g, fid),
    fa2 AS (SELECT vec_id, g, fid FROM fd2
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, fid) = 1),
    ex AS (SELECT e.vec_id, fa2.g, fa2.fid,
                  unnest(list_transform(e.v, (x, i) -> {{'i': i, 'x': x}}),
                         recursive := true)
           FROM e JOIN fa2 USING (vec_id)),
    norms AS (SELECT vec_id, SUM(x * x) AS xx FROM ex GROUP BY vec_id),
    dots AS (SELECT a.g, a.fid, a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dotp
             FROM ex a JOIN ex b
               ON a.g = b.g AND a.fid = b.fid AND a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY a.g, a.fid, a.vec_id, b.vec_id),
    scored AS (SELECT g, fid, va, vb, dotp / (sqrt(na.xx) * sqrt(nb.xx)) AS cos
               FROM dots
               JOIN norms na ON na.vec_id = va
               JOIN norms nb ON nb.vec_id = vb
               WHERE na.xx > 0 AND nb.xx > 0)
    SELECT g * {SEM_IVF_CELL_SHIFT} + fid AS cluster,
           vb AS vec_pruned, CAST(MIN(va) AS BIGINT) AS kept_vec
    FROM scored WHERE cos >= {SEM_TAU}
    GROUP BY g, fid, vb
    """

# register() applied as a call (not a decorator) so the oracle — which is
# defined after the function for readability — can be referenced directly.
register(
    "semdedup_prune_ivf",
    # benched since r14 (VERDICT r13 order #1): the engine's own 100×
    # measurement (IVF 91.4s vs flat 1503.9s, VERIFICATION_r13 §9f) makes
    # this the at-scale SemDeDup path, so its wall-clock is tracked
    # round-over-round in tier 2 alongside semdedup_prune_fast.  NOTE:
    # BENCH_r14's headline2_total therefore includes one more query than
    # r13's — compare per-query medians, not the raw tier total.
    headline2=True,
    oracle=SEMDEDUP_IVF_ORACLE_SQL,
    tags=("dedup", "similarity", "embedding", "pandas-udf", "ivf"),
)(semdedup_prune_ivf)


# --------------------------------------------------------------------------
# Int8 scalar quantization + exact-integer top-k
# --------------------------------------------------------------------------

QUANT_QUERY_VEC = 0
QUANT_TOP_K = 10

# symmetric per-vector scale; floor(x*scale + 0.5) instead of round() so
# both engines share one unambiguous rounding rule
_QSCALE = "(127.0 / greatest(array_max(transform(embedding, x -> abs(cast(x as double)))), 1e-12d))"
_QVEC = f"transform(embedding, x -> cast(floor(cast(x as double) * {_QSCALE} + 0.5d) as bigint))"


@register(
    "quantize_int8_topk",
    tags=("similarity", "quantization"),
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
                    (127.0 / greatest(list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), 1e-12))
                    + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qq AS (SELECT qv AS query_qv FROM q WHERE vec_id = {QUANT_QUERY_VEC}),
    dots AS (
      SELECT q.vec_id,
             unnest(list_transform(q.qv, (x, i) -> x * qq.query_qv[i])) AS t
      FROM q, qq
    )
    SELECT vec_id, CAST(SUM(t) AS BIGINT) AS qdot
    FROM dots GROUP BY vec_id
    ORDER BY qdot DESC, vec_id
    LIMIT {QUANT_TOP_K}
    """,
)
def quantize_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column, then
    top-k by EXACT integer dot product against the quantized query
    vector — the storage/compute-reduction path for 100 TB ANN (4× less
    data moved, integer SIMD instead of float, no float-order
    nondeterminism at all).

    Quantize is a narrow map; the query vector broadcasts; the result is
    a single TakeOrderedAndProject."""
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", F.expr(_QVEC).alias("qv"))
    query = q.filter(F.col("vec_id") == QUANT_QUERY_VEC).select(F.col("qv").alias("query_qv"))
    dot = "aggregate(zip_with(qv, query_qv, (x, y) -> x * y), cast(0 as bigint), (a, v) -> a + v)"
    return (
        q.crossJoin(F.broadcast(query))
        .select("vec_id", F.expr(dot).alias("qdot"))
        .orderBy(F.desc("qdot"), "vec_id")
        .limit(QUANT_TOP_K)
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# --------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_D = EMB_DIM // PQ_M  # dims per subspace
PQ_K = 16  # codes per subspace codebook (4 bits/code)
PQ_QUERY_VEC = 77  # probe query (outside the init-centroid range)
PQ_TOP_K = 10
PQ_RERANK_L = 50  # ADC candidate depth for exact re-ranking


_PQ_ORACLE_CTES = f"""
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    sub AS (
      SELECT vec_id, m.m AS m, v[m.m * {PQ_D} + 1 : m.m * {PQ_D} + {PQ_D}] AS sv
      FROM e, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m
    ),
    c0 AS (SELECT m, vec_id AS j, sv AS c FROM sub WHERE vec_id < {PQ_K}),
    t1 AS (
      SELECT s.vec_id, s.m, c0.j,
             unnest(list_transform(s.sv, (x, i) ->
                    CAST((x - c0.c[i]) * (x - c0.c[i]) AS DECIMAL(28,12)))) AS t
      FROM sub s JOIN c0 ON c0.m = s.m
    ),
    d1 AS (SELECT vec_id, m, j, SUM(t) AS d2 FROM t1 GROUP BY vec_id, m, j),
    a1 AS (SELECT vec_id, m, j FROM d1
           QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1),
    m1 AS (
      SELECT a1.m, a1.j, i.i AS i,
             CAST(SUM(CAST(s.sv[i.i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
      FROM a1 JOIN sub s ON s.vec_id = a1.vec_id AND s.m = a1.m,
           range(1, {PQ_D + 1}) i(i)
      GROUP BY a1.m, a1.j, i.i
    ),
    t2 AS (
      SELECT s.vec_id, s.m, m1.j,
             CAST((s.sv[m1.i] - m1.cv) * (s.sv[m1.i] - m1.cv) AS DECIMAL(28,12)) AS t
      FROM sub s JOIN m1 ON m1.m = s.m
    ),
    d2t AS (SELECT vec_id, m, j, SUM(t) AS d2 FROM t2 GROUP BY vec_id, m, j),
    a2 AS (SELECT vec_id, m, j FROM d2t
           QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1),
    qs AS (SELECT m, sv FROM sub WHERE vec_id = {PQ_QUERY_VEC}),
    dq AS (
      SELECT m1.m, m1.j,
             SUM(CAST((qs.sv[m1.i] - m1.cv) * (qs.sv[m1.i] - m1.cv)
                      AS DECIMAL(28,12))) AS d2q
      FROM m1 JOIN qs ON qs.m = m1.m
      GROUP BY m1.m, m1.j
    ),
    est AS (
      SELECT a2.vec_id, CAST(SUM(dq.d2q) AS DOUBLE) AS pq_d2
      FROM a2 JOIN dq ON dq.m = a2.m AND dq.j = a2.j
      GROUP BY a2.vec_id
    ),
    qv AS (SELECT v FROM e WHERE vec_id = {PQ_QUERY_VEC}),
    ext AS (
      SELECT e.vec_id,
             unnest(list_transform(e.v, (x, i) ->
                    CAST((x - qv.v[i]) * (x - qv.v[i]) AS DECIMAL(28,12)))) AS t
      FROM e, qv
    ),
    exact AS (SELECT vec_id, CAST(SUM(t) AS DOUBLE) AS exact_d2 FROM ext GROUP BY vec_id)
"""


def _pq_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared PQ pipeline: every vector (except nothing — the query row
    included) scored with its ADC estimate AND exact L2 distance to the
    probe; consumers apply their own filter/ordering/limit."""
    emb = fan_out(table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    sub = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> struct(m as m, slice(v, m * {PQ_D} + 1, {PQ_D}) as sv))"
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.sv")

    def assign(cbs: DataFrame) -> DataFrame:
        """Per-(vec, subspace) nearest-code argmin, in-row against the
        broadcast packed codebook (struct ordering = ORDER BY d2, j)."""
        packed = cbs.agg(F.collect_list(F.struct("m", "j", "c")).alias("cbs"))
        d2 = _dec_sum(f"zip_with(sv, s.c, (x, y) -> cast((x - y) * (x - y) as {_DEC}))")
        argmin = F.expr(
            f"array_min(transform(filter(cbs, s -> s.m = m),"
            f" s -> struct({d2} as d2, s.j as j))).j"
        )
        return sub.crossJoin(F.broadcast(packed)).select(
            "vec_id", "m", "sv", argmin.alias("j")
        )

    c0 = sub.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("j"), F.col("sv").alias("c")
    )
    a1 = assign(c0)
    sums = [F.sum(F.expr(f"cast(sv[{i}] as {_DEC})")).alias(f"s{i}") for i in range(PQ_D)]
    cent1 = (
        a1.groupBy("m", "j")
        .agg(F.count("*").alias("n"), *sums)
        .select(
            "m",
            "j",
            F.array(
                *[(F.col(f"s{i}").cast("double") / F.col("n")) for i in range(PQ_D)]
            ).alias("c"),
        )
    )
    codes = assign(cent1).select("vec_id", "m", "j")
    qs = sub.filter(F.col("vec_id") == PQ_QUERY_VEC).select("m", F.col("sv").alias("qsv"))
    d2q = _dec_sum(f"zip_with(qsv, c, (x, y) -> cast((x - y) * (x - y) as {_DEC}))")
    dq = cent1.join(F.broadcast(qs), "m").select("m", "j", F.expr(d2q).alias("d2q"))
    est = (
        codes.join(F.broadcast(dq), ["m", "j"])
        .groupBy("vec_id")
        .agg(F.sum("d2q").cast("double").alias("pq_d2"))
    )
    qvec = emb.filter(F.col("vec_id") == PQ_QUERY_VEC).select(F.col("v").alias("qv"))
    ed2 = _dec_sum(f"zip_with(v, qv, (x, y) -> cast((x - y) * (x - y) as {_DEC}))")
    exact = emb.crossJoin(F.broadcast(qvec)).select(
        "vec_id", F.expr(ed2).cast("double").alias("exact_d2")
    )
    return est.join(exact, "vec_id")


@register(
    "ann_pq_adc_topk",
    tags=("similarity", "ann", "quantization", "contract"),
    oracle=f"""
    WITH {_PQ_ORACLE_CTES}
    SELECT est.vec_id,
           ROUND(pq_d2, 6) AS pq_d2,
           ROUND(exact_d2, 6) AS exact_d2,
           ROUND(ABS(pq_d2 - exact_d2), 6) AS abs_err
    FROM est JOIN exact ON exact.vec_id = est.vec_id
    WHERE est.vec_id != {PQ_QUERY_VEC}
    ORDER BY est.pq_d2, est.vec_id
    LIMIT {PQ_TOP_K}
    """,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    split each vector into {PQ_M} subspaces of {PQ_D} dims, learn a
    {PQ_K}-entry codebook per subspace (one Lloyd update from a
    deterministic init, as in ivf_kmeans_probe), encode every vector as
    {PQ_M} one-byte codes, and answer a query by summing the
    query-to-codebook distance table over each vector's codes — with the
    EXACT L2 distance joined in-frame so the quantization error of every
    returned neighbor is part of the verified result.

    This completes the ANN family's storage axis: int8 SQ compresses 4x
    (quantize_int8_topk); PQ compresses {4 * EMB_DIM}B -> {PQ_M}B per
    vector, and the scan that answers a query reads ONLY the code
    columns plus a {PQ_M * PQ_K}-row broadcast distance table — the
    layout that makes 100 TB of embeddings probe-able from kilobytes of
    codebook. All codebook training and distance math accumulates in
    DECIMAL (argmin ties broken by code id), so codes, estimates, and
    the top-k boundary are bit-identical across engines.

    Scale shape: subspace explode is a narrow map (x{PQ_M} rows, same
    bytes); codebooks train on a {PQ_M * PQ_K}-group agg; encoding is an
    in-row argmin against the broadcast codebook; ADC is a broadcast
    lookup join + per-vector sum — no shuffle ever carries vectors
    except the two tiny groupBys."""
    scored = _pq_scored(spark, sf_dir)
    return (
        scored
        .filter(F.col("vec_id") != PQ_QUERY_VEC)
        .orderBy("pq_d2", "vec_id")
        .limit(PQ_TOP_K)
        .select(
            "vec_id",
            F.round("pq_d2", 6).alias("pq_d2"),
            F.round("exact_d2", 6).alias("exact_d2"),
            F.round(F.abs(F.col("pq_d2") - F.col("exact_d2")), 6).alias("abs_err"),
        )
    )


@register(
    "pq_recall_eval",
    tags=("similarity", "quantization", "eval", "contract"),
    oracle=f"""
    WITH {_PQ_ORACLE_CTES},
    scored AS (
      SELECT est.vec_id, est.pq_d2, exact.exact_d2
      FROM est JOIN exact ON exact.vec_id = est.vec_id
      WHERE est.vec_id != {PQ_QUERY_VEC}
    ),
    pq_top AS (SELECT vec_id FROM scored ORDER BY pq_d2, vec_id LIMIT {PQ_TOP_K}),
    exact_top AS (SELECT vec_id FROM scored ORDER BY exact_d2, vec_id LIMIT {PQ_TOP_K}),
    cand AS (SELECT vec_id, exact_d2 FROM scored ORDER BY pq_d2, vec_id LIMIT {PQ_RERANK_L}),
    rerank_top AS (SELECT vec_id FROM cand ORDER BY exact_d2, vec_id LIMIT {PQ_TOP_K})
    SELECT {PQ_TOP_K} AS k,
           CAST((SELECT COUNT(*) FROM pq_top JOIN exact_top USING (vec_id)) AS BIGINT)
             AS adc_overlap,
           ROUND(CAST((SELECT COUNT(*) FROM pq_top JOIN exact_top USING (vec_id)) AS DOUBLE)
                 / {PQ_TOP_K}, 6) AS adc_recall,
           CAST((SELECT COUNT(*) FROM rerank_top JOIN exact_top USING (vec_id)) AS BIGINT)
             AS rerank_overlap,
           ROUND(CAST((SELECT COUNT(*) FROM rerank_top JOIN exact_top USING (vec_id)) AS DOUBLE)
                 / {PQ_TOP_K}, 6) AS rerank_recall
    """,
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ-ADC index against the exact L2 top-k, for both
    the raw ADC ranking and the production shape — ADC retrieves a
    {PQ_RERANK_L}-deep candidate list, exact distances re-rank it — so
    the metric that decides codebook size AND rerank depth is part of
    the verified result (companion to ann_recall_eval for the IVF
    family).

    Honest numbers on this corpus: the synthetic embeddings are
    near-random, which bounds what {PQ_K}-entry codebooks can capture
    (ADC recall 0.1-0.3, reranked 0.3-0.6 across probes/SFs); the eval
    exists precisely to expose that — production would raise K / L
    until rerank_recall clears its target.

    Scale shape: one shared PQ plan (broadcast distance table over
    codes + exact distances in the same frame), three
    TakeOrderedAndProject heads over it, and {PQ_TOP_K}-row joins.  All
    distances are exact DECIMAL, so every boundary — ADC top-k,
    candidate cut, rerank — is bit-identical across engines."""
    scored = _pq_scored(spark, sf_dir).filter(F.col("vec_id") != PQ_QUERY_VEC)
    pq_top = scored.orderBy("pq_d2", "vec_id").limit(PQ_TOP_K).select("vec_id")
    exact_top = scored.orderBy("exact_d2", "vec_id").limit(PQ_TOP_K).select("vec_id")
    rerank_top = (
        scored.orderBy("pq_d2", "vec_id")
        .limit(PQ_RERANK_L)
        .orderBy("exact_d2", "vec_id")
        .limit(PQ_TOP_K)
        .select("vec_id")
    )
    adc = pq_top.join(exact_top, "vec_id").agg(
        F.count("*").cast("bigint").alias("adc_overlap")
    )
    rr = rerank_top.join(exact_top, "vec_id").agg(
        F.count("*").cast("bigint").alias("rerank_overlap")
    )
    return adc.crossJoin(rr).select(
        F.lit(PQ_TOP_K).alias("k"),
        "adc_overlap",
        F.round(F.col("adc_overlap").cast("double") / PQ_TOP_K, 6).alias("adc_recall"),
        "rerank_overlap",
        F.round(F.col("rerank_overlap").cast("double") / PQ_TOP_K, 6).alias(
            "rerank_recall"
        ),
    )


SRP_QUERY_VEC = 77
SRP_TOP_K = 10
SRP_MULTIPROBE_HAMMING = 1  # probe buckets within this Hamming radius


@register(
    "srp_recall_eval",
    tags=("similarity", "lsh", "eval", "contract"),
    oracle=f"""
    WITH terms AS (
      SELECT e.vec_id, p.p,
             unnest(list_transform(e.embedding, (x, i) -> CAST(CAST(x AS DOUBLE) *
                    (CASE WHEN ((31*p.p + 17*(i - 1)) % 5) >= 2 THEN 1.0 ELSE -1.0 END)
                    AS DECIMAL(28,12)))) AS t
      FROM embeddings e, range(0, {SRP_PLANES}) p(p)
    ),
    bits AS (
      SELECT vec_id, p,
             CASE WHEN SUM(t) >= 0 THEN (1 << p) ELSE 0 END AS bit
      FROM terms GROUP BY vec_id, p
    ),
    sigs AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id),
    qb AS (SELECT bucket FROM sigs WHERE vec_id = {SRP_QUERY_VEC}),
    cand AS (
      SELECT s.vec_id FROM sigs s, qb
      WHERE s.vec_id != {SRP_QUERY_VEC}
        AND bit_count(xor(s.bucket, qb.bucket)) <= {SRP_MULTIPROBE_HAMMING}
    ),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    qv AS (SELECT v FROM e WHERE vec_id = {SRP_QUERY_VEC}),
    prods AS (
      SELECT e.vec_id,
             unnest(list_transform(e.v, (x, i) -> CAST(x * qv.v[i] AS DECIMAL(28,12)))) AS xy,
             unnest(list_transform(e.v, (x, i) -> CAST(x * x AS DECIMAL(28,12)))) AS xx,
             unnest(list_transform(qv.v, (y, i) -> CAST(y * y AS DECIMAL(28,12)))) AS yy
      FROM e, qv WHERE e.vec_id != {SRP_QUERY_VEC}
    ),
    cosine AS (
      SELECT vec_id,
             CAST(SUM(xy) AS DOUBLE) /
             (sqrt(CAST(SUM(xx) AS DOUBLE)) * sqrt(CAST(SUM(yy) AS DOUBLE))) AS cos
      FROM prods GROUP BY vec_id
      HAVING SUM(xx) > 0 AND SUM(yy) > 0
    ),
    exact_top AS (SELECT vec_id FROM cosine ORDER BY cos DESC, vec_id LIMIT {SRP_TOP_K})
    SELECT {SRP_TOP_K} AS k,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM cand JOIN exact_top USING (vec_id)) AS BIGINT)
             AS n_overlap,
           ROUND(CAST((SELECT COUNT(*) FROM cand JOIN exact_top USING (vec_id)) AS DOUBLE)
                 / {SRP_TOP_K}, 6) AS recall_at_k
    """,
)
def srp_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of multi-probe SRP-LSH against the exact cosine top-k —
    completing the approximate-index evaluation trilogy
    (lsh_quality_eval for MinHash banding, pq_recall_eval for PQ, this
    for random-hyperplane buckets).  Candidates are every vector whose
    {SRP_PLANES}-bit bucket lies within Hamming distance
    {SRP_MULTIPROBE_HAMMING} of the probe's bucket (multi-probe: sign
    flips near a hyperplane are the dominant miss mode, so probing
    adjacent buckets buys recall without touching more than
    ({SRP_PLANES}+1)/2^{SRP_PLANES} of the corpus).

    Scale shape: signatures are the narrow SRP map; the Hamming filter
    is bit_count(xor()) against one broadcast bucket id — at 100 TB one
    would enumerate the {SRP_PLANES}+1 bucket ids and semi-join the
    bucket-partitioned signature table instead of scanning, but the
    candidate SET is identical; the exact side is one DECIMAL cosine
    pass + TakeOrderedAndProject.  Every boundary is exact across
    engines."""
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    sigs = emb.select("vec_id", F.expr(_srp_bucket_expr()).alias("bucket"))
    qb = sigs.filter(F.col("vec_id") == SRP_QUERY_VEC).select(F.col("bucket").alias("qb"))
    cand = (
        sigs.crossJoin(F.broadcast(qb))
        .filter(
            (F.col("vec_id") != SRP_QUERY_VEC)
            & (F.bit_count(F.col("bucket").bitwiseXOR(F.col("qb"))) <= SRP_MULTIPROBE_HAMMING)
        )
        .select("vec_id")
    )
    ev = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qv = ev.filter(F.col("vec_id") == SRP_QUERY_VEC).select(F.col("v").alias("qv"))
    dot = _dec_sum(f"zip_with(v, qv, (x, y) -> cast(x * y as {_DEC}))")
    n2 = _dec_sum(f"transform(v, x -> cast(x * x as {_DEC}))")
    qn2 = _dec_sum(f"transform(qv, y -> cast(y * y as {_DEC}))")
    exact_top = (
        ev.filter(F.col("vec_id") != SRP_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            # zero-norm guard: see similarity._cosine_scores
            F.try_divide(
                F.expr(dot).cast("double"),
                F.sqrt(F.expr(n2).cast("double")) * F.sqrt(F.expr(qn2).cast("double")),
            ).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
        .orderBy(F.desc("cos"), "vec_id")
        .limit(SRP_TOP_K)
        .select("vec_id")
    )
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    n_hit = cand.join(exact_top, "vec_id").agg(
        F.count("*").cast("bigint").alias("n_overlap")
    )
    return n_cand.crossJoin(n_hit).select(
        F.lit(SRP_TOP_K).alias("k"),
        "n_candidates",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / SRP_TOP_K, 6).alias("recall_at_k"),
    )
