"""Deduplication operators over the ``documents`` table (engine extension).

Design point is 100 TB of text: every variant is a shuffle-bounded
DataFrame pipeline (hash-partition on a fingerprint/bucket key), never a
driver-side pairwise loop. Cross-engine determinism: all hashes are md5
(identical hex in Spark and DuckDB); ratios are exact int divisions.

- exact:          group on md5(text)           (one shuffle)
- minhash-LSH:    shingle → per-band seeded min-hash → bucket self-join
                  (candidate pairs only; bands bound recall/precision)
- ngram-jaccard:  true Jaccard on shingle sets for candidate pairs
- simhash:        16-bit majority fingerprint from token hashes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_bam_spark.queries import REGISTRY, register
from spark_bam_spark.tables import fan_out, table

N_BANDS = 4
# Hub-shingle document-frequency cap for the LSH candidate generator: a
# shingle present in more than this many documents (boilerplate headers,
# license text, navigation chrome) is dropped BEFORE min-hashing.  Hubs are
# what break banded LSH at scale: one shingle shared by m documents tends to
# become the band minimum for all of them, producing an O(m²) candidate
# bucket that no banding parameter can split.  With the cap, every bucket is
# bounded near the cap, so candidate pairs grow ~linearly with the corpus.
# Recall cost is nil for near-dup detection — a shingle carried by >64
# documents has no discriminative power (true copies still share their many
# sub-cap shingles).  The test fixtures' max df is 25 (sf0.1), so the valve
# provably never fires there; tests/test_lsh_df_cap.py pins the degenerate
# corpus where it does.
LSH_DF_CAP = 64
_DEC = "decimal(28,12)"


def _shingles(df: DataFrame, distinct: bool = True) -> DataFrame:
    """doc_id + exploded 3-word shingles (distinct where the consumer
    needs set semantics; min-hash is duplicate-insensitive so it skips
    the dedup shuffle)."""
    toks = fan_out(df).select("doc_id", F.split("text", " ").alias("w"))
    # the transform stays INLINE in the explode: naming it as a column
    # first lets InferFiltersFromGenerate derive a `size(shingles) > 0`
    # predicate that projection-collapse expands to the full transform
    # (with split(text) re-evaluated per element → O(words²)) and pushes
    # below the repartition Exchange — onto the serial scan stage. Inline,
    # no such filter is inferred and the work runs once, parallel.
    # The if() short-doc guard stays inside the expression for the same
    # reason (an explicit row filter would also push below the Exchange):
    # Spark's sequence(1, 0) is DESCENDING ([1, 0]), not empty like
    # DuckDB's generate_series — a <3-word doc would hit w[i+1] out of
    # bounds (ANSI error) without it.
    out = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(w) < 3, array(),"
                " transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"
            )
        ).alias("s"),
    )
    return out.distinct() if distinct else out


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
"""


@register(
    "dedup_exact",
    tags=("dedup",),
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5(text) AS text_hash,
           COUNT(*) AS group_size,
           MIN(doc_id) AS survivor_doc_id
    FROM corpus
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); survivor = min doc_id.

    One shuffle on the 128-bit hash — at 100 TB this is the cheapest
    possible dedup (hash keys are uniform, no skew). The synthetic corpus
    has no exact duplicates, so the input unions a deterministic re-ingest
    (doc_id % 7) — the operator must find exactly those groups."""
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    # Plant-offset scale bound (here and at every doc_id + 1_000_000 plant
    # in dedup/curation/mlprep): collision-free while max doc_id < 1e6,
    # i.e. through a 200x tile of the sf0.1 corpus (5,000 docs); the
    # gen_scale campaigns probe <=100x.  The embedding-side plant hit the
    # analogous bound at 100x and moved to SEM_PLANT_OFFSET=1e9 (r14);
    # bump these the same way (with a _FORCE_RECHECK rotation) before any
    # >=200x document-table campaign.
    reingest = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return (
        d.unionAll(reingest)
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("survivor_doc_id"))
        .filter(F.col("group_size") > 1)
    )


# Independent 60-bit hash per band: md5('<b>:' || s).  Kirsch-Mitzenmacher
# double hashing (h1 + b*h2 from ONE md5) was used through round 6 — 4x
# less hash CPU — until lsh_quality_eval, realigned to evaluate the
# PRODUCTION config, measured its planted-near-dup recall at 43/72
# (0.597) vs 66/72 (0.917) for independent bands (sf0.01 eval, pinned in
# tests/test_lsh_df_cap.py): KM band minima are correlated (bands tend
# to agree on which shingle attains the minimum), so one differing
# minimum often kills all four band collisions at once.  Recall is the
# product of a dedup pipeline; the 4x hash CPU is linear and cheap.
def _band_hash_sql(b: int) -> str:
    """DuckDB expression for band b's 60-bit shingle hash — the single
    source of truth for the oracle side (bit-identical to the engine's
    _band_hash_col, pinned in tests/test_lsh_df_cap.py)."""
    return f"('0x' || substr(md5('{b}:' || s), 1, 15))::BIGINT"


_BAND_HASH_COLS_SQL = ",\n             ".join(
    f"{_band_hash_sql(b)} AS h{b}" for b in range(N_BANDS)
)
_BAND_CASE_SQL = (
    "CASE b.band " + " ".join(f"WHEN {b} THEN h{b}" for b in range(N_BANDS)) + " END"
)


def _band_hash_col(b: int):
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(b), F.col("s"))), 1, 15), 16, 10
    ).cast("long")


@register(
    "dedup_minhash_lsh",
    headline=True,
    tags=("dedup", "lsh"),
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
    )
    SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
    FROM mh a JOIN mh c ON a.band = c.band AND a.sig = c.sig AND a.doc_id < c.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding: shingle → per-band min-hash → bucket
    self-join emits candidate near-duplicate pairs.

    Band hashes are INDEPENDENT 60-bit md5-derived permutations (see the
    module note above _BAND_HASH_COLS_SQL for why the cheaper
    Kirsch-Mitzenmacher double hashing was retired: correlated band
    minima cost 32 recall points on the planted-near-dup eval);
    signatures stay 8-byte longs, so the shuffled width is unchanged.

    Scale path: the self-join key is (band, signature) — uniformly
    distributed, so the shuffle is balanced; candidate pairs (not all
    pairs) are materialized, which is the whole point of LSH at 100 TB.
    The df-cap pass (see LSH_DF_CAP) adds one distinct-aggregate shuffle
    keyed on the band-0 shingle hash — 8-byte longs, not the shingle
    strings, and partial-distinct combines map-side — and the resulting
    hub list is tiny (only shingles in >{LSH_DF_CAP} docs), so the cap
    itself is a broadcast anti-join on the already-computed h0.  (At
    100 TB the exact df pass can run on a p-sample of documents with the
    threshold scaled to p·cap — true hubs sit far above the cap, so a
    sample finds them reliably; a count-min sketch is NOT the right tool
    here because its error grows with stream size, so detecting a low
    absolute threshold would need a sketch as large as the df table.
    Exactness is kept in-repo because the DuckDB oracle hashes the
    result bit-for-bit.)
    """
    sh = _shingles(table(spark, sf_dir, "documents"), distinct=False)
    # all band signatures in ONE pass: N_BANDS min-aggregates over the raw
    # shingle stream (no distinct — min is duplicate-insensitive; no band
    # cross-join — the explode would multiply shuffle volume ×N_BANDS),
    # then unpivot the per-doc signature row with stack().
    # DELIBERATELY NOT CHECKPOINTED (r7 decision, measured): `hashed`
    # feeds both the hub-df aggregation and the signature aggregation, so
    # the scan+explode+4×md5 subtree executes twice.  A
    # localCheckpoint(eager=True) here (the r6-verdict order) was built
    # and A/B'd — identical-session min-of-5 at sf0.1 AND sf1 showed it
    # noise-neutral locally (the materialization write+read and lost
    # stage overlap offset the saved recompute), and the 100 TB math is
    # against it: the derived stream is ~40 B/word (doc_id + 4 longs) vs
    # ~6 B/word of column-pruned source text, so checkpointing writes ~6×
    # the input to executor disk while recompute pays one extra pruned
    # parquet scan + linear md5 CPU.  `minhash_jaccard_estimate`
    # (curation.py) checkpoints because its shared stream feeds an
    # expensive candidate JOIN twice; here both consumers are cheap
    # map-side-combined aggregations.  Evidence: VERIFICATION_r7.md §2.
    hashed = sh.select(
        "doc_id", *[_band_hash_col(b).alias(f"h{b}") for b in range(N_BANDS)]
    )
    # hub detection on h0, not the string: both engines compute the same
    # md5-derived key, so even a (negligible, 60-bit) collision caps the
    # same shingles on both sides
    hubs = (
        hashed.groupBy("h0")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > LSH_DF_CAP)
        .select("h0")
    )
    sigs = hashed.join(F.broadcast(hubs), "h0", "left_anti").groupBy("doc_id").agg(
        *[F.min(F.col(f"h{b}")).alias(f"sig_{b}") for b in range(N_BANDS)]
    )
    stack_args = ", ".join(f"{b}, sig_{b}" for b in range(N_BANDS))
    mh = sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )
    # bucket-and-enumerate instead of a self-join: a self-join would
    # recompute the shingle+md5 subtree for both sides AND shuffle it
    # twice; grouping by (band, sig) shuffles the tiny signature table
    # once and emits each bucket's pairs with array combinatorics.
    # LSH buckets are small by construction (that's the point of
    # banding), so the per-bucket quadratic stays bounded; a degenerate
    # giant bucket would indicate a broken hash, not a plan problem.
    buckets = (
        mh.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.expr(
        "flatten(transform(ids, (a, i) ->"
        " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    tags=("dedup",),
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for pairs sharing ≥1 shingle, thresholded.

    The shingle equi-join is the candidate generator (at 100 TB you'd LSH
    first — dedup_minhash_lsh — and verify with this); integer set sizes
    make the ratio exact and engine-identical."""
    sh = _shingles(table(spark, sf_dir, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # bucket-and-enumerate (see dedup_minhash_lsh): a shingle self-join
    # would recompute and shuffle the shingle subtree twice; grouping by
    # shingle shuffles it once and enumerates each posting list's pairs
    pairs = F.expr(
        "flatten(transform(ids, (a, i) ->"
        " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
    )
    common = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # per-doc size table is tiny next to the pair stream — broadcast both
    # probes so the big side never shuffles again
    sa = F.broadcast(sizes.alias("sa"))
    sb = F.broadcast(sizes.alias("sb"))
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_embedding_cosine",
    tags=("dedup", "similarity"),
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             unnest(list_transform(embedding,
                    (x, i) -> {'i': i, 'x': CAST(x AS DOUBLE)}), recursive := true)
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS xx
      FROM e GROUP BY vec_id
    ),
    dots AS (
      SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS DOUBLE) AS dotp
      FROM e a JOIN e b ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.label, a.vec_id, b.vec_id
    ),
    scored AS (
      SELECT label, vec_a, vec_b, dotp / (sqrt(na.xx) * sqrt(nb.xx)) AS cos
      FROM dots JOIN norms na ON na.vec_id = vec_a JOIN norms nb ON nb.vec_id = vec_b
      WHERE na.xx > 0 AND nb.xx > 0
    )
    SELECT label, vec_a, vec_b, ROUND(cos, 6) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_a, vec_b) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: top-5 most-similar vector pairs per
    coarse bucket (``label`` = the blocking key).

    The 100 TB shape: NEVER all-pairs — block first (here by label; in
    production by LSH/IVF bucket), pairwise only within blocks — and the
    vectors stay ARRAY columns end-to-end: one shuffle of dim-independent
    rows on the blocking key, then ``zip_with``+``aggregate`` compute each
    pair's dot product element-wise in the JVM. (The earlier posexplode
    formulation multiplied shuffled rows ×dim and re-joined on (label, i);
    r1 verdict flagged it — this is the similarity.py formulation.)
    Per-term products in double, accumulation in DECIMAL so Spark and
    DuckDB agree bit-for-bit; ranking uses the raw double."""
    from pyspark.sql import Window

    # the accumulator lambda re-casts to keep the decimal type stable
    # (decimal + decimal widens precision by one otherwise)
    norm_expr = (
        f"CAST(aggregate(embedding, CAST(0 AS {_DEC}), (acc, x) -> "
        f"CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}) AS {_DEC})) AS DOUBLE)"
    )
    dot_expr = (
        "CAST(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS {_DEC}), (acc, v) -> "
        f"CAST(acc + CAST(v AS {_DEC}) AS {_DEC})) AS DOUBLE)"
    )
    emb = fan_out(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding", F.expr(norm_expr).alias("xx")
    )
    a, b = emb.alias("a"), emb.alias("b")
    scored = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        # zero-norm guard: see similarity._cosine_scores
        F.try_divide(F.expr(dot_expr), F.sqrt("a.xx") * F.sqrt("b.xx")).alias("cos"),
    ).filter(F.col("cos").isNotNull())
    w = Window.partitionBy("label").orderBy(F.desc("cos"), "vec_a", "vec_b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("label", "vec_a", "vec_b", F.round("cos", 6).alias("cosine"))
    )


@register(
    "dedup_simhash",
    tags=("dedup",),
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN ascii(substr(md5(tok), j + 1, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, (SELECT unnest(generate_series(0, 15)) AS j) jj
      GROUP BY doc_id, j
    )
    SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-token md5-derived bit votes, majority per bit.

    Near-dups differ in few bits → group/bucket by simhash (or by rotated
    prefixes for Hamming-distance search) downstream. Two balanced
    shuffles; all vectorized JVM expressions, no Python in the hot path."""
    d = table(spark, sf_dir, "documents")
    tok = fan_out(d).select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    bits = tok.select("doc_id", "tok", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
    vote = F.when(F.expr("ascii(substring(md5(tok), j + 1, 1)) % 2 = 1"), 1).otherwise(-1)
    per_bit = bits.groupBy("doc_id", "j").agg(F.sum(vote).alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1, j)")).otherwise(0)).cast("bigint").alias("simhash")
    )


def _candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minhash-LSH candidate pairs (shared pipeline head)."""
    return REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)


@register(
    "dedup_clusters",
    tags=("dedup", "graph", "iterative"),
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
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
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    walk(doc, lbl) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.doc = e.dst
    )
    SELECT doc AS doc_id, MIN(lbl) AS cluster_id
    FROM walk GROUP BY doc
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the LSH
    candidate-pair graph by iterative min-label propagation — the
    survivor-selection step of a production dedup pipeline.

    Iterative DataFrame algorithm (not SQL-expressible in one query —
    the oracle uses a recursive CTE): each round every node adopts the
    minimum label among itself and its neighbors; converges in
    O(component diameter) rounds. localCheckpoint() truncates lineage
    per round so plans don't grow; dup components are tiny, so rounds
    are few and every round is two balanced shuffles."""
    pairs = _candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    # size-aware iteration width: each round runs 2 shuffles + 2 actions,
    # so on a small candidate graph the cost is pure task-scheduling
    # overhead — narrow the loop to a handful of partitions. On a 100 TB
    # corpus n_edges keeps this at the session default (dup graphs are
    # sparse: edges ≪ corpus, but still sharded wide when they are big).
    n_edges = edges.count()
    parallelism = spark.sparkContext.defaultParallelism
    width = max(1, min(parallelism, n_edges // 50_000))
    if width < parallelism:
        edges = edges.coalesce(width).localCheckpoint(eager=True)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        labels = _propagate_min_labels(edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return labels.select(F.col("doc").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def _propagate_min_labels(edges: DataFrame) -> DataFrame:
    labels = edges.select("src").distinct().select(F.col("src").alias("doc"), F.col("src").alias("lbl"))
    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # carry a `changed` flag through the same pass — one join and one
        # count per round instead of a second labels join
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.src, "left")
            .select(
                "doc",
                F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.coalesce("nlbl", "lbl") < F.col("lbl")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


@register(
    "dedup_survivors",
    tags=("dedup", "pipeline"),
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
    ),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT COUNT(*) FILTER (rn = 1) AS survivors,
           COUNT(*) FILTER (rn > 1) AS removed,
           COUNT(*) AS total
    FROM ranked
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OUTPUT: keep the first document of each exact-hash group
    (window rank over the hash), report survivors/removed. At 100 TB the
    window is one shuffle on the uniform 128-bit hash — identical cost to
    the groupBy formulation but yields the cleaned corpus, not just the
    group list."""
    from pyspark.sql import Window

    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = d.unionAll(
        d.filter(F.col("doc_id") % 7 == 0).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ranked = corpus.select("doc_id", F.row_number().over(w).alias("rn"))
    return ranked.agg(
        F.count(F.when(F.col("rn") == 1, 1)).alias("survivors"),
        F.count(F.when(F.col("rn") > 1, 1)).alias("removed"),
        F.count("*").alias("total"),
    )


@register(
    "dedup_incremental",
    tags=("dedup",),
    oracle="""
    WITH batch AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    corpus_h AS (SELECT DISTINCT md5(text) AS h FROM documents),
    fresh AS (
      SELECT b.doc_id, md5(b.text) AS h FROM batch b
      WHERE md5(b.text) NOT IN (SELECT h FROM corpus_h)
    )
    SELECT h AS text_hash, MIN(doc_id) AS survivor_doc_id, COUNT(*) AS batch_copies
    FROM fresh GROUP BY h
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch (fresh crawl) deduped against the
    EXISTING corpus, then within itself — the steady-state shape of a
    production training-data pipeline (the full-corpus variants above are
    the bootstrap). Batch = re-ingested copies (docs ≡0 mod 3, all dropped
    by the anti-join) + genuinely-new revisions (docs ≡0 mod 7, text
    mutated, all survive).

    Scale shape: one anti-join shuffled on the 128-bit hash + one groupBy
    on the same key (AQE coalesces the second exchange). At 100 TB the
    corpus hash set is the big side but only `h` wide (16 bytes/doc);
    Spark's runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter)
    prunes most batch rows before the shuffle, and the corpus side can be
    written hash-bucketed once and reused across every nightly batch."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionAll(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat("text", F.lit(" v2")).alias("text"),
        )
    )
    corpus_h = d.select(F.md5("text").alias("h")).distinct()
    fresh = batch.select("doc_id", F.md5("text").alias("h")).join(
        corpus_h, "h", "left_anti"
    )
    return fresh.groupBy(F.col("h").alias("text_hash")).agg(
        F.min("doc_id").alias("survivor_doc_id"),
        F.count("*").alias("batch_copies"),
    )


@register(
    "dup_ngram_coverage",
    tags=("dedup", "text"),
    oracle="""
    WITH toks AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
    pos AS (
      SELECT doc_id, source, array_to_string(w[i:i+7], ' ') AS gram
      FROM toks, unnest(range(1, len(w)-6)) AS t(i)
      WHERE len(w) >= 8
    ),
    cnt AS (SELECT gram, COUNT(*) AS c FROM pos GROUP BY gram)
    SELECT source,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS dup_fraction
    FROM pos JOIN cnt USING (gram)
    GROUP BY source
    """,
)
def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage: the fraction of each source's 8-gram
    positions whose gram occurs ≥2× corpus-wide — the scalable proxy for
    exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better": their suffix-array pass finds repeated ≥50-
    char spans; repeated fixed-width n-grams are the shuffle-friendly
    approximation, since a repeated long span is a run of repeated
    n-grams).

    Scale shape (r10 rework): explode → ONE shuffle of the gram stream
    (window count over partitionBy(gram) — the gram stream is the largest
    intermediate, and the old groupBy-then-join-back shape exchanged it
    twice: once aggregating, once joining the counts back on) → per-source
    agg. The per-gram window frame is the gram's occurrence list (tiny —
    that's what's being counted), so the window buffers O(c) rows, never
    O(partition). Every shuffle is keyed on the gram hash (uniform);
    nothing is quadratic. The explode keeps its array expression inline
    (InferFiltersFromGenerate trap)."""
    d = fan_out(table(spark, sf_dir, "documents").select("source", "text"))
    toks = d.select("source", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 8
    )
    pos = toks.select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' '))")
        ).alias("gram"),
    )
    cnt = pos.withColumn("c", F.count("*").over(W.partitionBy("gram")))
    dup = F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
    return cnt.groupBy("source").agg(
        F.count("*").alias("n_grams"),
        dup.cast("bigint").alias("n_dup_grams"),
        (dup.cast("double") / F.count("*")).alias("dup_fraction"),
    )


@register(
    "boilerplate_segments",
    tags=("dedup", "text"),
    oracle="""
    WITH segs AS (
      SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, greatest(CAST(ceil(len(w) / 4.0) AS INT), 0)),
                 i -> array_to_string(w[(i-1)*4+1:(i-1)*4+4], ' '))) AS seg
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
    SELECT s.doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           ROUND(CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS boiler_frac
    FROM segs s JOIN freq f USING (seg)
    GROUP BY s.doc_id
    HAVING SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) > 0
    """,
)
def boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level boilerplate detection: cut each document into
    non-overlapping 4-word segments (the punctuation-free stand-in for
    sentences), count each segment's cross-document frequency, and score
    every document by the fraction of its segments that are boilerplate
    (appear in >= 2 distinct docs). This is the line-level dedup pass of
    the C4/CCNet family of pipelines (remove nav bars / cookie banners
    that repeat across pages) re-expressed relationally.

    Scale shape: explode -> distinct-doc count per segment (map-side
    partial agg on a uniform text key) -> hash join back on the same key
    -> per-doc agg. Both shuffles key on the segment hash (uniform; the
    df>=2 tail is tiny) — nothing quadratic, no driver state. At 100 TB
    the freq table would be md5(seg)-keyed; text keys keep the oracle
    engine-identical here."""
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    # inline transform in the explode (InferFiltersFromGenerate trap —
    # see _shingles)
    segs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(cast(ceil(size(w) / 4.0) as int), 0)),"
                " i -> array_join(slice(w, (i-1)*4 + 1, 4), ' '))"
            )
        ).alias("seg"),
    )
    freq = segs.groupBy("seg").agg(F.count_distinct("doc_id").alias("df"))
    boiler = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        segs.join(freq, "seg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            boiler.cast("bigint").alias("n_boiler"),
            F.round(boiler.cast("double") / F.count("*"), 6).alias("boiler_frac"),
        )
        .filter(F.col("n_boiler") > 0)
    )


@register(
    "ngram_containment",
    tags=("dedup",),
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS containment
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.6
    """,
)
def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment scoring C(A,B) = |A∩B| / min(|A|,|B|) on 3-gram shingle
    sets — the asymmetric companion to Jaccard that catches SUBSET
    duplication (a short doc embedded verbatim inside a long one scores
    ~1.0 here but low on Jaccard, because the union is dominated by the
    long doc). This is the measure suffix-array substring dedup
    approximates; see dup_ngram_coverage for the positional variant.

    Scale shape: identical to dedup_ngram_jaccard — one shuffle of the
    shingle stream (bucket-and-enumerate posting lists, never a shingle
    self-join), pair counts on a uniform composite key, then two
    broadcast probes of the tiny per-doc size table. Threshold applied
    before projection so the pair stream never widens."""
    sh = _shingles(table(spark, sf_dir, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = F.expr(
        "flatten(transform(ids, (a, i) ->"
        " transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
    )
    common = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = F.broadcast(sizes.alias("sa"))
    sb = F.broadcast(sizes.alias("sb"))
    cont = F.col("n_common").cast("double") / F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(cont >= 0.6)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


@register(
    "dedup_substring_spans",
    headline2=True,
    tags=("dedup", "text"),
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pos AS (
      SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram
      FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
      WHERE len(w) >= 8
    ),
    cnt AS (SELECT gram, COUNT(*) AS c FROM pos GROUP BY gram),
    dup AS (SELECT doc_id, i FROM pos JOIN cnt USING (gram) WHERE c >= 2),
    isl AS (
      SELECT doc_id, i,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM dup
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(i) AS BIGINT) AS span_start,
             CAST(MAX(i) - MIN(i) + 8 AS BIGINT) AS span_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_dup_grams
      FROM isl GROUP BY doc_id, grp
      HAVING COUNT(*) >= 5
    )
    SELECT s.doc_id, span_start, span_tokens, n_dup_grams,
           md5(array_to_string(w[span_start:span_start + span_tokens - 1], ' '))
             AS span_hash
    FROM spans s JOIN toks USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span extraction — the actionable output of
    exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): for each document, the maximal token ranges
    whose every 8-gram occurs >= 2x corpus-wide, i.e. the spans a
    dedup pass would delete. Where dup_ngram_coverage reports a per-source
    coverage *fraction*, this emits the spans themselves (start, length,
    and an md5 of the exact span text so the extraction is char-exact
    across engines). Runs of >= 5 consecutive duplicated grams (>= 12
    tokens) stand in for the reference method's >= 50-char threshold.

    Scale shape (r10 rework): explode -> ONE shuffle of the gram stream
    (window count over partitionBy(gram); the old groupBy-then-join-back
    exchanged the full (doc_id, i, gram) stream twice — measured -24% at
    sf0.1, 7 exchanges -> 5) -> one window over (doc_id, position) for the
    gaps-and-islands grouping -> per-(doc, island) agg. The per-gram
    window frame is the gram's occurrence list (tiny), so it buffers O(c)
    rows, never O(partition). Every shuffle keys on the gram hash or
    doc_id (both uniform); the islands window partitions by doc_id so its
    sort is per-document, never global. Positions are ints, so island
    detection (i - row_number) is exact in both engines."""
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    # short-doc guard lives INSIDE the explode expression: a row filter on
    # size(w) would be pushed below fan_out's repartition into the FileScan
    # (InferFiltersFromGenerate trap — see _shingles), serializing split()
    # on the scan stage and re-evaluating it at every reuse of this subtree
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    pos = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(w) < 8, array(),"
                " transform(sequence(1, size(w) - 7),"
                " i -> struct(i AS i, array_join(slice(w, i, 8), ' ') AS gram)))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.i").alias("i"), F.col("p.gram").alias("gram"))
    dup = (
        pos.withColumn("c", F.count("*").over(W.partitionBy("gram")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "i")
    )
    isl = dup.withColumn(
        "grp", F.col("i") - F.row_number().over(W.partitionBy("doc_id").orderBy("i"))
    )
    spans = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") - F.min("i") + 8).cast("bigint").alias("span_tokens"),
            F.count("*").cast("bigint").alias("n_dup_grams"),
        )
        .filter(F.col("n_dup_grams") >= 5)
        .drop("grp")
    )
    # r18 (VERDICT r17 #6, guide §1.2-2): the hash-probe side reads the
    # UN-fanned scan and splits AFTER the broadcast join.  The old probe
    # (fan_out(d) → split → join) re-tokenized every document and paid
    # the insurance exchange, then the broadcast join kept ~1% of the
    # rows; splitting the joined side instead tokenizes only documents
    # that actually carry a span — at 100 TB that converts a corpus-wide
    # split pass into a survivors-only one.  Spans stay the build side
    # (tiny, the r10 shape); rows and hashes are identical because
    # split(text) is computed on the same text either way.
    probe = table(spark, sf_dir, "documents").select("doc_id", "text")
    return F.broadcast(spans).join(probe, "doc_id").select(
        "doc_id",
        "span_start",
        "span_tokens",
        "n_dup_grams",
        F.md5(
            F.expr(
                "array_join(slice(split(text, ' '), cast(span_start as int),"
                " cast(span_tokens as int)), ' ')"
            )
        ).alias("span_hash"),
    )


@register(
    "boilerplate_strip",
    tags=("dedup", "text"),
    oracle="""
    WITH segs AS (
      SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, greatest(CAST(ceil(len(w) / 4.0) AS INT), 0)),
                 i -> {'i': i, 'seg': array_to_string(w[(i-1)*4+1:(i-1)*4+4], ' ')}),
               recursive := true)
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           md5(COALESCE(string_agg(CASE WHEN f.df < 2 THEN s.seg END, ' ' ORDER BY s.i), ''))
             AS clean_hash
    FROM segs s JOIN freq f USING (seg)
    GROUP BY s.doc_id
    """,
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL — the actionable companion to
    boilerplate_segments (which only scores): rebuild each document with
    its cross-document repeated 4-word segments deleted and emit the md5
    of the cleaned text, so the reconstruction is char-exact across
    engines (the C4/CCNet line-dedup pass as a transformation, not a
    report; same relationship as dedup_substring_spans to
    dup_ngram_coverage).

    Scale shape: identical to boilerplate_segments — explode →
    distinct-doc count per segment (map-side partial agg, uniform text
    key) → hash join back → per-doc agg; the reassembly is an in-row
    array_sort over the kept (position, segment) structs, no extra
    shuffle. Kept segments re-join on ' ' in position order in BOTH
    engines (collect_list and string_agg each skip the removed-segment
    NULLs); a fully-boilerplate doc hashes the empty string."""
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    # inline transform in the explode (InferFiltersFromGenerate trap)
    segs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(cast(ceil(size(w) / 4.0) as int), 0)),"
                " i -> struct(i AS i, array_join(slice(w, (i-1)*4 + 1, 4), ' ') AS seg))"
            )
        ).alias("p"),
    ).select("doc_id", "p.i", "p.seg")
    freq = segs.groupBy("seg").agg(F.count_distinct("doc_id").alias("df"))
    return (
        segs.join(freq, "seg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum((F.col("df") >= 2).cast("int")).cast("bigint").alias("n_removed"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "case when df < 2 then struct(i AS i, seg AS seg) end)),"
                    " s -> s.seg), ' ')"
                )
            ).alias("clean_hash"),
        )
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: the eval-leakage scan every LLM training
# pipeline runs before a data release
# --------------------------------------------------------------------------

DECONTAM_MOD = 31  # held-out "benchmark" slice: doc_id % MOD == 0
# (31 keeps the scan non-vacuous at every fixture SF — mod 97 finds zero
# colliding pairs at sf0.01, and a 0-row result would hash-match its
# oracle trivially, exactly the vacuity the window check must avoid)
DECONTAM_N = 8  # n-gram width (the dedup_substring_spans gram size)
DECONTAM_MIN_SHARED = 2  # report pairs sharing >= this many distinct grams


@register(
    "decontamination_ngram_overlap",
    tags=("dedup", "decontamination", "text"),
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g0 AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(w, i.i + 1, i.i + {DECONTAM_N}), ' ')) AS g
      FROM t, LATERAL (SELECT unnest(generate_series(0, len(w) - {DECONTAM_N})) AS i) i
      WHERE len(w) >= {DECONTAM_N}
    ),
    g AS (SELECT DISTINCT doc_id, g FROM g0),
    b AS (SELECT doc_id AS bench_doc, g FROM g WHERE doc_id % {DECONTAM_MOD} = 0),
    tr AS (SELECT doc_id AS train_doc, g FROM g WHERE doc_id % {DECONTAM_MOD} != 0),
    shared AS (
      SELECT train_doc, bench_doc, COUNT(*) AS n_shared
      FROM tr JOIN b USING (g)
      GROUP BY train_doc, bench_doc
      HAVING COUNT(*) >= {DECONTAM_MIN_SHARED}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id)
    SELECT s.train_doc, s.bench_doc,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(sz.n AS BIGINT) AS train_ngrams,
           ROUND(CAST(s.n_shared AS DOUBLE) / sz.n, 6) AS contamination
    FROM shared s JOIN sizes sz ON sz.doc_id = s.train_doc
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: which TRAINING documents leak
    held-out BENCHMARK content?  A deterministic slice of the corpus
    (doc_id % 31 == 0, DECONTAM_MOD) stands in for the benchmark suite;
    a train/bench pair is reported when the two share >= 2
    (DECONTAM_MIN_SHARED) distinct 8-grams, with the shared
    count and the contaminated fraction of the training doc's gram set
    — the n-gram-collision decontamination used before LLM data
    releases (the asymmetric, labeled counterpart of
    ``ngram_containment``: here direction matters, and the output is an
    actionable drop list keyed by train_doc).

    Scale shape: grams are md5-hashed in-row (16-byte shuffle keys, the
    dedup.py discipline) with the short-doc guard INLINE in the
    expression — Spark's sequence(0, negative) runs DESCENDING, unlike
    DuckDB's empty generate_series, and a row-level filter would push
    below the fan_out exchange onto the serial scan (see _shingles).
    One distinct shuffle on (doc_id, g); the benchmark side is 1/31
    of the corpus here and a fixed small suite in production, so it
    broadcasts and the train stream never reshuffles for the probe; the
    pair agg keys on a uniform composite; per-doc sizes re-aggregate
    the same distinct stream.  No self-join, no cartesian."""
    grams_expr = F.expr(
        f"if(size(w) >= {DECONTAM_N},"
        f" transform(sequence(0, size(w) - {DECONTAM_N}),"
        f" i -> md5(concat_ws(' ', slice(w, i + 1, {DECONTAM_N})))),"
        " array())"
    )
    # g feeds THREE consumers (train stream + the broadcast-built bench
    # and sizes sides), each re-running the scan → explode → distinct
    # subtree — this query posted the worst 10x wall ratio in the r18
    # probe (4.64), so a bm25-style localCheckpoint of g was PROBED in
    # r18 and REVERTED on measurement: −9% at sf0.1 (1.22 → 1.11 min)
    # but +15-27% at the 10x tile (2.88 → 3.31/3.65, interleaved
    # fresh-process A/B) — unlike bm25's tf (token stream → vocab-sized)
    # or minhash's postings (~10x smaller), the distinct (doc, gram)
    # frame is the SAME size as its input, so materializing it costs
    # more than the two saved re-derivations precisely where scale
    # makes it matter.  Guide §5's cache rule, measured.
    g = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", F.explode(grams_expr).alias("g"))
        .distinct()
    )
    bench = g.filter(F.col("doc_id") % DECONTAM_MOD == 0).select(
        F.col("doc_id").alias("bench_doc"), "g"
    )
    train = g.filter(F.col("doc_id") % DECONTAM_MOD != 0).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    shared = (
        train.join(F.broadcast(bench), "g")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= DECONTAM_MIN_SHARED)
    )
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n"))
    return (
        shared.join(F.broadcast(sizes), shared.train_doc == sizes.doc_id)
        .select(
            "train_doc",
            "bench_doc",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n").cast("bigint").alias("train_ngrams"),
            F.round(F.col("n_shared").cast("double") / F.col("n"), 6).alias("contamination"),
        )
    )


def band_signatures(docs: DataFrame, hub_h0: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, sig) band-min signatures — the dedup_minhash_lsh
    signature contract (same shingles, same independent 60-bit band
    hashes, same min-aggregate-then-stack plan) WITHOUT the hub df-cap
    by default: the streaming consumer trades the valve for a
    min-mergeable state table (the cap needs a GLOBAL document-frequency
    pass, which no bounded per-batch state can reproduce; see
    stream_dedup_minhash_lsh).

    ``hub_h0`` is the production replacement: a frame of band-0 shingle
    hashes (column ``h0``) derived OFFLINE with the registered df-cap
    rule and broadcast-anti-joined out before min-hashing — at 100 TB a
    periodic job refreshes the blocklist from a df pass and every
    micro-batch applies it at O(|blocklist|) broadcast cost
    (tests/test_lsh_df_cap.py pins the valve on the degenerate hub
    corpus)."""
    sh = _shingles(docs, distinct=False)
    hashed = sh.select(
        "doc_id", *[_band_hash_col(b).alias(f"h{b}") for b in range(N_BANDS)]
    )
    if hub_h0 is not None:
        hashed = hashed.join(F.broadcast(hub_h0.select("h0")), "h0", "left_anti")
    sigs = hashed.groupBy("doc_id").agg(
        *[F.min(F.col(f"h{b}")).alias(f"sig_{b}") for b in range(N_BANDS)]
    )
    stack_args = ", ".join(f"{b}, sig_{b}" for b in range(N_BANDS))
    return sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )


def lsh_hub_blocklist(docs: DataFrame, cap: int = LSH_DF_CAP) -> DataFrame:
    """Derive the offline hub-shingle blocklist — a one-column frame of
    band-0 shingle hashes (``h0``) whose document frequency exceeds
    ``cap`` — for ``band_signatures(hub_h0=...)`` and the streaming
    entry points (``lsh_dedup_stream``): the SAME df-cap rule the batch
    query ``dedup_minhash_lsh`` applies in-line, lifted out so a bounded
    per-batch state can consume it as a broadcast anti-join.

    Production shape: the df pass is one groupBy over the shingle stream
    (uniform 60-bit keys, map-side combined) run PERIODICALLY over the
    accumulated corpus — not per batch — and the result is tiny
    (shingles with df > cap are by definition rare), so every nightly
    micro-batch applies it at O(|blocklist|) broadcast cost.  h0 alone
    identifies the shingle (the other band hashes are functions of the
    same preimage), so blocking on h0 drops the whole shingle row before
    min-hashing — exactly the in-line cap's semantics."""
    return (
        _shingles(docs, distinct=False)
        .select("doc_id", _band_hash_col(0).alias("h0"))
        .groupBy("h0")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > cap)
        .select("h0")
    )


# Lex key for streaming precedence: okey = batch_tag * SPAN + doc_id.
# SPAN must clear the corpus id range at any probe scale (same class of
# bound as SEM_PLANT_OFFSET, mlprep.py): 1e9 is collision-free while
# max doc_id < 1e9, i.e. far beyond any gen_scale tile.
_STREAM_TAG_SPAN = 1_000_000_000


def _stream_tag_col():
    """The fixture's batch-tag rule (tag = doc_id % 3) as a Column — the
    ONE engine-side definition, consumed by lsh_dedup_batch_step's tag
    column and (via _stream_okey_col) the arrival-order tripwire, so the
    decision key, the state's owner_tag, and the tripwire watermark can
    never drift apart (the oracle encodes the same rule in its keyed
    CTE)."""
    return F.col("doc_id") % 3


def _stream_okey_col():
    """The streaming lex-precedence key (tag * SPAN + doc_id) as a
    Column — see _stream_tag_col."""
    return _stream_tag_col() * _STREAM_TAG_SPAN + F.col("doc_id")


def _stream_lsh_oracle_sql(hub_cap: int | None = None) -> str:
    """The streaming-dedup decision oracle, shared by ALL stream twins
    (plain, mid-stream-compacted, hub-valved): the relational
    recomputation of the whole decision stream — owner of a bucket =
    lex-min carrier; a doc is pruned iff some bucket it carries has a
    lex-earlier owner; dup_of = the lex-min such owner.  One template so
    the twins can never silently encode different contracts: hub_cap
    None yields the unvalved form; an int inserts the batch query's hub
    CTE at exactly the point the engine applies the broadcast anti-join
    (whole shingle rows dropped before the per-band min)."""
    if hub_cap is None:
        hashed_cte = f"""hashed AS (
      SELECT doc_id,
             {_BAND_HASH_COLS_SQL}
      FROM sh
    )"""
    else:
        hashed_cte = f"""hashed0 AS (
      SELECT doc_id,
             {_BAND_HASH_COLS_SQL}
      FROM sh
    ),
    hub AS (SELECT h0 FROM hashed0
            GROUP BY h0 HAVING COUNT(DISTINCT doc_id) > {hub_cap}),
    hashed AS (SELECT * FROM hashed0 WHERE h0 NOT IN (SELECT h0 FROM hub))"""
    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    {hashed_cte},
    mh AS (
      SELECT doc_id, b.band, MIN({_BAND_CASE_SQL}) AS sig
      FROM hashed, (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
      GROUP BY doc_id, b.band
    ),
    keyed AS (SELECT doc_id, (doc_id % 3) * {_STREAM_TAG_SPAN} + doc_id AS okey,
                     band, sig
              FROM mh),
    owners AS (SELECT band, sig, MIN(okey) AS okey FROM keyed GROUP BY band, sig)
    SELECT k.doc_id AS doc_pruned,
           CAST(MIN(o.okey) % {_STREAM_TAG_SPAN} AS BIGINT) AS dup_of
    FROM keyed k JOIN owners o USING (band, sig)
    WHERE o.okey < k.okey
    GROUP BY k.doc_id
    """


_STREAM_LSH_ORACLE_SQL = _stream_lsh_oracle_sql()


@register(
    "stream_dedup_minhash_lsh",
    tags=("dedup", "lsh", "streaming", "stateful"),
    oracle=_STREAM_LSH_ORACLE_SQL,
)
def stream_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental MinHash-LSH near-dedup — the nightly-crawl
    steady state of a 100 TB training-data pipeline, run as a REAL
    Structured Streaming query (file source, maxFilesPerTrigger=1,
    Trigger.AvailableNow, foreachBatch with a persisted bucket-owner
    state table; streaming/lsh_dedup_stream).  The corpus lands as three
    tag-ordered parquet files (tag = doc_id % 3); each micro-batch's
    docs are shingled and band-min-hashed, pruned against every bucket
    already owned by a lex-earlier doc, then absorbed into the state.

    Decisions are a pure function of the global lex order
    (batch_tag, doc_id) — NOT of arrival time or batch boundaries — so
    any consecutive split of the landing files yields identical output
    (tests pin stream == single-batch global recomputation) and the
    DuckDB oracle can recompute the whole thing relationally: owner of a
    bucket = lex-min carrier; a doc is pruned iff some bucket it carries
    has a lex-earlier owner; dup_of = the lex-min such owner.

    vs dedup_minhash_lsh (the bootstrap full-corpus pass): same
    signature contract, but the HUB VALVE IS DELIBERATELY ABSENT — the
    df-cap needs a global document-frequency pass, which a bounded
    min-mergeable state cannot reproduce.  The production form is
    END-TO-END executable: ``lsh_hub_blocklist`` derives the blocklist
    offline with the registered df-cap rule and ``lsh_dedup_stream``
    threads it through every micro-batch's transaction as a broadcast
    anti-join (the full stream is pinned valved-vs-unvalved on the
    degenerate hub corpus, tests/test_lsh_df_cap.py) — this registered
    query runs unvalved because the fixtures' max df (25) sits far below
    the cap, so valved and unvalved are bit-identical here anyway.
    State is (band, sig) -> owner: O(distinct
    buckets) ~24 B rows, min-mergeable, equi-joined per batch on
    uniformly distributed keys — no skew, no growth with re-crawls.
    Each batch WRITES only its changed buckets (an O(batch) delta,
    published by an atomic pointer commit), decisions land in per-batch
    overwrite dirs, and committed batches are skipped on replay — the
    determinism contract holds across foreachBatch's at-least-once
    restarts, not just the happy path (streaming.lsh_dedup_process_batch
    documents the crash windows; tests simulate them).

    The landing/state/decision dirs live under a per-sf /tmp root keyed
    on a hash of the FULL sf_dir path (two sf dirs sharing a basename
    must not collide on working state), rebuilt from scratch each run
    (the stream — not the setup — is the operator under test; a torn
    previous run must not leak state in)."""
    return _lsh_stream_run(spark, sf_dir)


@register(
    "stream_dedup_lsh_compacted",
    tags=("dedup", "lsh", "streaming", "stateful"),
    oracle=_STREAM_LSH_ORACLE_SQL,
)
def stream_dedup_lsh_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_dedup_minhash_lsh with the state MAINTENANCE loop in the
    stream: after the second micro-batch commits, ``lsh_state_compact``
    folds the committed deltas into one base generation INSIDE the
    running query, and the third batch then joins against the compacted
    state.  The oracle is byte-identical to the plain stream's — that IS
    the pin: compaction must be invisible to the decision stream (the
    resolved per-bucket lex-min owners are the same before and after the
    fold), verified here by the driver's value hash rather than only by
    pytest.  At 100 TB this is the nightly shape — ingest increments
    land as O(batch) deltas, a periodic compaction bounds the reader's
    min-merge amplification, and neither step may perturb decisions.

    Working dirs live under a DISTINCT /tmp root (root_tag) so the twin
    queries never share state in a sweep."""
    return _lsh_stream_run(spark, sf_dir, root_tag="-compact", compact_after=1)


# The valved stream's df-cap: deliberately LOWER than the batch query's
# LSH_DF_CAP (64) so the valve actually FIRES on the fixtures (max
# shingle df is 7 at sf0.01, 25 at sf0.1) — with the production cap the
# blocklist would be empty there and the driver hash would prove nothing
# about the anti-join.  Production tunes this to its boilerplate
# tolerance; the mechanism under test is cap-independent.
STREAM_HUB_CAP = 5


@register(
    "lsh_blocklist_refresh",
    tags=("dedup", "lsh"),
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hashed0 AS (
      SELECT doc_id, {_band_hash_sql(0)} AS h0
      FROM sh
    )
    SELECT h0, COUNT(DISTINCT doc_id) AS df
    FROM hashed0
    GROUP BY h0
    HAVING COUNT(DISTINCT doc_id) > {STREAM_HUB_CAP}
    """,
)
def lsh_blocklist_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OFFLINE VALVE-REFRESH JOB of the streaming dedup loop, as its
    own driver-hashed query — the third leg of the nightly cycle whose
    other two are already registered (ingest = stream_dedup_*; state
    maintenance = stream_dedup_lsh_compacted; valve refresh = THIS,
    consumed by stream_dedup_lsh_hub_valved).  Returns the hub blocklist
    WITH its document frequencies (h0, df) — the observability shape an
    operator reviews before deploying a new blocklist (how many hubs,
    how hubby) — at STREAM_HUB_CAP, the deployed valved-stream cap.

    Scale shape: one count-distinct aggregate over the shingle stream on
    uniform 60-bit keys (map-side combined, no skew — boilerplate
    shingles have high df but df is what's being AGGREGATED, not the
    join key), output is O(hubs).  Operational note, measured on the
    scale tiles: an ABSOLUTE cap makes the blocklist grow with corpus
    replication (24.5k hubs at sf0.1 → 245k at the 10× tile — every df
    multiplies), so production either raises the cap with corpus size
    or caps on df FRACTION; the broadcast stays cheap either way (245k
    rows ≈ 2 MB).  At 100 TB this is the periodic batch job that
    publishes the blocklist table the micro-batches broadcast."""
    # no outer fan_out: _shingles fans out internally, and wrapping here
    # would stack two back-to-back repartitions (the inner one can't see
    # through the outer Exchange)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        _shingles(docs, distinct=False)
        .select("doc_id", _band_hash_col(0).alias("h0"))
        .groupBy("h0")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > STREAM_HUB_CAP)
        .select("h0", F.col("df").cast("bigint").alias("df"))
    )


@register(
    "stream_dedup_lsh_hub_valved",
    tags=("dedup", "lsh", "streaming", "stateful"),
    oracle=_stream_lsh_oracle_sql(STREAM_HUB_CAP),
)
def stream_dedup_lsh_hub_valved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_dedup_minhash_lsh with the PRODUCTION hub valve live and
    FIRING: ``lsh_hub_blocklist`` derives the df-cap blocklist offline
    over the corpus (the nightly refresh job), and every micro-batch's
    transaction broadcast-anti-joins it before min-hashing
    (``lsh_dedup_stream(hub_h0=...)``).  The cap is set BELOW the
    fixtures' max shingle df (STREAM_HUB_CAP=5 vs df up to 7 at sf0.01 /
    25 at sf0.1), so the blocklist is NON-empty and the decision stream
    genuinely diverges from the unvalved twin — the driver's value hash
    checks the valve's effect on real data end-to-end, not just the
    degenerate-corpus pytest pin (tests/test_lsh_df_cap.py).

    The oracle is the unvalved stream oracle with the batch query's hub
    CTE inserted at the same point the engine applies it: shingles whose
    band-0 hash has df > cap are dropped before the per-band min — the
    exact relational statement of the broadcast anti-join.  Everything
    else (lex-order contract, O(batch) deltas, crash envelope, arrival
    tripwire) is the plain stream's; see stream_dedup_minhash_lsh.

    Causality disclosure: this single-run fixture derives the blocklist
    from the SAME corpus it then streams (a lookahead), because one
    bounded run has no "previous night".  A production loop derives it
    from the corpus accumulated BEFORE tonight's batches.  The mechanism
    under test — materialized blocklist, broadcast anti-join inside
    every micro-batch transaction — is identical either way, and the
    oracle encodes exactly what the engine computes."""
    hub = lsh_hub_blocklist(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        cap=STREAM_HUB_CAP,
    )
    return _lsh_stream_run(spark, sf_dir, root_tag="-valved", hub_h0=hub)


def _lsh_write_landing(docs: DataFrame, landing_dir: str) -> None:
    """Write the tag-ordered landing zone — three single-file tag
    batches (tag = doc_id % 3) with staggered mtimes — the ONE layout
    definition shared by the registered stream runners and the
    stream-level tests (so a layout change can't leave a test exercising
    a stale shape).  DuckDB writes plain files the stream source can
    admit one-per-trigger; the Arrow hop is driver-side by design — a
    real deployment's landing files are written by the upstream crawler,
    not by this setup.

    The staggered mtimes ARE load-bearing for the decision stream: the
    lex-order contract makes decisions invariant to how the lex-ordered
    stream is SPLIT into batches, but decisions are append-only, so a
    lex-later batch admitted early would be emitted not-pruned and never
    revisited (only the STATE converges under any arrival order; the
    engine-side tripwire now catches violations loudly).  Staggered
    mtimes plus lexical batch-N filenames guarantee the required
    order."""
    import os
    import time

    import duckdb

    docs_arrow = docs.toArrow()
    con = duckdb.connect()
    con.register("docs_arrow", docs_arrow)
    base = time.time()
    for tag in range(3):
        path = os.path.join(landing_dir, f"batch-{tag}.parquet")
        con.execute(
            f"COPY (SELECT doc_id, text FROM docs_arrow"
            f"      WHERE doc_id % 3 = {tag} ORDER BY doc_id)"
            f" TO '{path}' (FORMAT PARQUET)"
        )
        os.utime(path, (base + 10 * tag, base + 10 * tag))
    con.close()


def _lsh_stream_run(
    spark: SparkSession,
    sf_dir: str,
    root_tag: str = "",
    compact_after: int | None = None,
    hub_h0: DataFrame | None = None,
) -> DataFrame:
    """Shared runner for the streaming LSH dedup queries: build the
    tag-ordered landing zone, run the real Structured Streaming query
    (optionally compacting mid-stream), return the decisions frame."""
    import hashlib
    import os
    import shutil

    from spark_bam_spark.streaming import lsh_dedup_stream

    full = os.path.abspath(sf_dir.rstrip("/"))
    root = os.path.join(
        "/tmp/spark_bam_spark_lsh_stream",
        f"{os.path.basename(full) or 'sf'}-"
        f"{hashlib.md5(full.encode()).hexdigest()[:8]}{root_tag}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    state_dir = os.path.join(root, "state")
    out_dir = os.path.join(root, "decisions")

    # Landing-zone SETUP (not the operator under test): split the corpus
    # into three single-file tag batches.  Read through the engine's own
    # table() so dir-shaped parquet (e.g. the empty-tables sweep fixture)
    # works; the shared builder below owns the layout.
    _lsh_write_landing(table(spark, sf_dir, "documents").select("doc_id", "text"), landing)

    # pre-create + explicit schema: on a degenerate corpus (empty tables,
    # all-short docs) every batch's decision set is empty and Spark may
    # write no schema-carrying part files at all — inference would fail
    # where the correct answer is simply zero rows.  recursiveFileLookup
    # descends into the per-batch_id subdirs the idempotent sink writes
    # (streaming.lsh_dedup_process_batch) without treating them as
    # partition columns.
    os.makedirs(out_dir, exist_ok=True)
    # hub_h0 may be the lazy derivation plan: lsh_dedup_stream
    # materializes it once to <state>/_hub before streaming
    lsh_dedup_stream(
        spark, landing, state_dir, out_dir,
        compact_after=compact_after, hub_h0=hub_h0,
    )
    return (
        spark.read.schema("doc_pruned bigint, dup_of bigint")
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
    )
