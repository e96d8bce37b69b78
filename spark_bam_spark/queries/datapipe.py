"""Training-data-pipeline operators, part 2 (engine extension): PII
redaction, learned-classifier quality scoring, per-source caps, and
DataSketches-based one-pass distribution/cardinality estimation.

All verification-sensitive arithmetic is integer-valued or
rank-validated so the DuckDB oracle matches bit-for-bit:

- the linear classifier uses integer token weights (order-independent
  integer sums, divided once at the end);
- sketch queries (KLL quantiles, HLL distinct counts) cannot be
  reproduced by DuckDB, so the oracle checks the *accuracy contract*
  instead: the Spark side computes the sketch estimate AND its true
  rank/exact value in-frame and emits a boolean `ok`; the oracle emits
  the exact values with `ok = true`.  A sketch outside its published
  error bound hash-mismatches — a meaningful differential check.

At 100 TB: sketches are the headline here — KLL/HLL are mergeable
monoids, so per-partition partial aggregation does almost all the work
map-side and the shuffle carries kilobyte sketches, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.tables import fan_out, table

# Injected-PII construction: the synthetic corpus is clean word soup, so
# the query plants deterministic PII (email every 7th doc, phone every
# 11th) before detecting it — detector correctness is what's under test,
# and both engines plant identically.
_EMAIL_RE = r"[a-z0-9.]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"\d{3}-\d{4}"


@register(
    "pii_redact_stats",
    tags=("text", "pii"),
    oracle=rf"""
    WITH planted AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' u' || CAST(doc_id AS VARCHAR) || '@mail.com' ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phone,
           CAST(length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM planted
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
    """,
)
def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails, phone numbers) as pure JVM
    regexp expressions — narrow per-row map, no shuffle, the standard
    pre-training scrub pass."""
    d = table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" u"), F.col("doc_id").cast("string"), F.lit("@mail.com"))).otherwise(""),
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit(" 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
    )
    planted = d.select("doc_id", t.alias("t")).filter((F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0))
    email, phone = _EMAIL_RE.replace("\\", "\\\\"), _PHONE_RE.replace("\\", "\\\\")
    return planted.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(t, '{email}', 0)")).cast("long").alias("n_email"),
        F.size(F.expr(f"regexp_extract_all(t, '{phone}', 0)")).cast("long").alias("n_phone"),
        F.length(
            F.regexp_replace(F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>")
        ).cast("long").alias("redacted_len"),
    )


# Integer token weight: (ascii(tok)*31 + length(tok)*7) % 101 in [0, 100].
# Integer sums are order-independent, so Spark and DuckDB agree exactly
# regardless of evaluation order; one float division at the end.
_W_SPARK = "aggregate(filter(split(text, ' '), x -> length(x) > 0), 0L, (acc, x) -> acc + (ascii(x)*31 + length(x)*7) % 101)"
_N_SPARK = "size(filter(split(text, ' '), x -> length(x) > 0))"


@register(
    "classifier_linear_score",
    tags=("text", "mlprep", "classifier"),
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             COALESCE(list_aggregate(list_transform(list_filter(string_split(text, ' '), x -> length(x) > 0),
                                                    x -> (ascii(x)*31 + length(x)*7) % 101), 'sum'), 0) AS raw,
             len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS n_tok
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(raw) AS BIGINT) AS raw_total,
           ROUND(AVG(CAST(raw AS DOUBLE) / (101.0 * NULLIF(n_tok, 0))), 6) AS mean_score
    FROM scored GROUP BY lang
    """,
)
def classifier_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring with a (stand-in) learned linear classifier:
    hash each token to an integer weight, score = mean weight / 101.
    The shape is what matters at scale — per-row JVM lambda over the
    token array (no UDF, no shuffle), one hash-agg by language.  A real
    deployment swaps the weight expression for a broadcast weight table
    lookup; the plumbing is identical."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        F.expr(_W_SPARK).alias("raw"),
        F.expr(_N_SPARK).alias("n_tok"),
    )
    # NULLIF keeps a zero-token document out of the mean identically on
    # both engines (AVG skips NULL); raw stays 0 so raw_total still counts it
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("raw").cast("bigint").alias("raw_total"),
        F.round(
            F.avg(F.col("raw").cast("double") / (101.0 * F.nullif(F.col("n_tok"), F.lit(0)))), 6
        ).alias("mean_score"),
    )


_SOURCE_CAP = 1000


@register(
    "source_cap_filter",
    tags=("mlprep", "sample"),
    oracle=f"""
    WITH ranked AS (
      SELECT source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {_SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ranked GROUP BY source
    """,
)
def source_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the CommonCrawl per-domain cap pattern):
    keep the first N docs per source by doc_id, report kept counts.  One
    shuffle on source; at 100 TB the cap would ride the same shuffle as
    any per-domain aggregation.  doc_id is unique so the ranking is
    total (deterministic)."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    ranked = d.select("source", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rn") <= _SOURCE_CAP, 1).otherwise(0)).cast("bigint").alias("n_kept"),
    )


# KLL normalized rank error for the default k=200 is ~1.65%; allow 3%.
_KLL_RANK_TOL = 0.03


@register(
    "sketch_doclen_quantiles",
    tags=("mlprep", "sketch"),
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM documents GROUP BY source
    """,
)
def sketch_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc-length quantiles via KLL sketch (one-pass,
    mergeable — the 100 TB way to get distribution stats), validated
    in-frame: the true rank of each sketch-estimated quantile must be
    within the sketch's published error bound.  The oracle pins the
    booleans TRUE, so a sketch breaking its contract fails the hash."""
    d = table(spark, sf_dir, "documents")
    sk = d.groupBy("source").agg(F.kll_sketch_agg_bigint("n_chars").alias("sk"))
    est = sk.select(
        "source",
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.9)).alias("p90_est"),
    )
    joined = d.join(F.broadcast(est), "source")
    ranked = joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.avg((F.col("n_chars") <= F.col("p50_est")).cast("double")).alias("rank50"),
        F.avg((F.col("n_chars") <= F.col("p90_est")).cast("double")).alias("rank90"),
    )
    return ranked.select(
        "source",
        "n_docs",
        (F.abs(F.col("rank50") - 0.5) <= _KLL_RANK_TOL).alias("p50_ok"),
        (F.abs(F.col("rank90") - 0.9) <= _KLL_RANK_TOL).alias("p90_ok"),
    )


@register(
    "sketch_distinct_users_daily",
    tags=("sketch", "agg"),
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS hll_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS day, COUNT(DISTINCT user_id) AS n_users, TRUE AS hll_ok
    FROM events
    """,
)
def sketch_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users: exact count paired with an HLL sketch
    estimate validated to ±5% in-frame, plus an 'ALL' row whose estimate
    comes from MERGING the daily sketches (hll_union_agg) — proving the
    monoid property a 1000-executor rollup relies on (estimate once,
    re-aggregate at any granularity without rescanning)."""
    ev = table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    daily = ev.groupBy(day).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    tol = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= F.greatest(F.lit(1), (0.05 * exact).cast("long"))
    )
    per_day = daily.select(
        "day", "n_users", tol(F.hll_sketch_estimate("sk"), F.col("n_users")).alias("hll_ok")
    )
    merged = daily.agg(
        F.sum("n_users").alias("_ignore"),
        F.hll_union_agg("sk").alias("sk_all"),
    )
    exact_all = ev.agg(F.count_distinct("user_id").alias("n_users"))
    all_row = merged.crossJoin(exact_all).select(
        F.lit("ALL").alias("day"),
        "n_users",
        tol(F.hll_sketch_estimate("sk_all"), F.col("n_users")).alias("hll_ok"),
    )
    return per_day.unionByName(all_row)


@register(
    "sketch_user_overlap",
    tags=("sketch", "setop"),
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS t_a, b.event_type AS t_b,
           COUNT(DISTINCT a.user_id) AS exact_overlap,
           TRUE AS theta_ok
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every event-type pair, estimated by
    theta-sketch set intersection and validated in-frame against the
    exact answer (oracle pins theta_ok TRUE).

    The scale story: exact distinct-set intersection needs a self-join on
    the identity key — a shuffle proportional to the data.  Theta
    sketches intersect AFTER aggregation: one pass builds a
    kilobyte-sized sketch per group, and any pairwise (or n-way)
    overlap/union/difference is then computed on sketches alone.  At
    100 TB the exact branch here is dropped and only the sketch column
    survives; it exists in-frame purely as the verification contract."""
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    est = (
        sk.alias("a")
        .crossJoin(F.broadcast(sk.alias("b")))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("t_a"),
            F.col("b.event_type").alias("t_b"),
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
            ).alias("est"),
        )
    )
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("x")
        .join(du.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(F.col("x.event_type").alias("t_a"), F.col("y.event_type").alias("t_b"))
        .agg(F.count_distinct("user_id").alias("exact_overlap"))
    )
    return exact.join(F.broadcast(est), ["t_a", "t_b"]).select(
        "t_a",
        "t_b",
        "exact_overlap",
        (F.abs(F.col("est") - F.col("exact_overlap"))
         <= F.greatest(F.lit(1), (0.05 * F.col("exact_overlap")).cast("long"))).alias("theta_ok"),
    )


_STRATUM_FRAC = 0.2  # keep 20% of each language, deterministically


@register(
    "stratified_sample_by_lang",
    tags=("mlprep", "sample"),
    oracle=f"""
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_total
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n_total) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE rn <= CEIL(n_total * {_STRATUM_FRAC})) AS BIGINT) AS n_sampled,
           CAST(SUM(doc_id) FILTER (WHERE rn <= CEIL(n_total * {_STRATUM_FRAC})) AS BIGINT) AS sample_checksum
    FROM ranked GROUP BY lang
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for mixture construction: keep an
    exact per-stratum fraction, selecting members by md5(doc_id) order so
    every engine/run draws the SAME sample (no rand()), with the selected-id
    checksum in-frame so the oracle verifies membership, not just counts.

    Scale shape: one shuffle on the stratum key; per-stratum selection is a
    WindowGroupLimit-style rank filter.  At 100 TB with per-stratum counts
    known (or sketched) up front, the same selection runs as a pure filter
    ``md5(id) < threshold`` with no window at all — the hash-order trick is
    what makes the sample reproducible AND embarrassingly parallel."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select(
        "lang",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("lang")).alias("n_total"),
    )
    keep = F.col("rn") <= F.ceil(F.col("n_total") * _STRATUM_FRAC)
    return ranked.groupBy("lang").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.count(F.when(keep, 1)).cast("bigint").alias("n_sampled"),
        F.sum(F.when(keep, F.col("doc_id"))).cast("bigint").alias("sample_checksum"),
    )


@register(
    "url_host_normalize",
    tags=("text", "scalar"),
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' ||
             CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
             source ||
             CASE WHEN doc_id % 2 = 0 THEN '.example.com' ELSE '.example.org' END ||
             '/p/' || CAST(doc_id AS VARCHAR) || '?utm=x' AS url
      FROM documents
    )
    SELECT regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1), '^www\\.', '') AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN url LIKE '%www.%' THEN 1 ELSE 0 END) AS BIGINT) AS n_www
    FROM urls GROUP BY 1
    """,
)
def url_host_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL host extraction + normalization (strip scheme and leading www),
    the per-domain keying step every crawl pipeline runs before domain
    caps/stats.  URLs are planted deterministically from (source, doc_id)
    — the corpus has no native URL column — mirroring pii_redact_stats'
    planted-pattern approach.  All regexp, all JVM, no shuffle until the
    final per-host count."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".example.com")).otherwise(F.lit(".example.org")),
        F.lit("/p/"), F.col("doc_id").cast("string"), F.lit("?utm=x"),
    )
    urls = d.select("doc_id", url.alias("url"))
    host = F.regexp_replace(F.regexp_extract("url", r"^https?://([^/]+)", 1), r"^www\.", "")
    return urls.groupBy(host.alias("host")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("url").contains("www.").cast("int")).cast("bigint").alias("n_www"),
    )


@register(
    "source_mixture_diversity",
    tags=("mlprep", "stats"),
    oracle="""
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT SUM(n) AS total FROM per),
    shares AS (
      SELECT source, lang, n,
             CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY source) AS p
      FROM per
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           ROUND(-SUM(p * ln(p)), 6) AS lang_entropy,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(tot.total), 6) AS corpus_share
    FROM shares, tot GROUP BY source
    """,
)
def source_mixture_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture diagnostics for dataset curation: per-source document count,
    language diversity (Shannon entropy over the source's language
    distribution), and corpus share — the numbers a mixing/temperature-
    sampling step consumes.  Two hash-aggs and a broadcast of the one-row
    corpus total; entropy is computed from exact integer counts then
    rounded, so both engines agree bit-for-bit."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    wsrc = W.partitionBy("source")
    share = F.col("n").cast("double") / F.sum("n").over(wsrc)
    ent = per.select(
        "source",
        "lang",
        "n",
        (-share * F.log(share)).alias("ent_term"),
    )
    total = d.count()  # single scalar; scans the (already-cached) table once
    return ent.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(F.sum("ent_term"), 6).alias("lang_entropy"),
        F.round((F.sum("n") / F.lit(float(total))).cast("double"), 6).alias("corpus_share"),
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (exact cross-engine replica + error bound)
# --------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512
CM_TOP_K = 20


@register(
    "sketch_heavy_hitters_cm",
    tags=("sketch", "text", "contract"),
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    total AS (SELECT SUM(c) AS n FROM freq),
    cells AS (
      SELECT d.d AS d,
             ('0x' || substr(md5(d.d || ':' || w), 1, 15))::BIGINT % {CM_WIDTH} AS cell,
             SUM(c) AS cmc
      FROM freq, (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS d) d
      GROUP BY d.d, cell
    ),
    top AS (
      SELECT w, c FROM freq ORDER BY c DESC, w LIMIT {CM_TOP_K}
    ),
    est AS (
      SELECT t.w, t.c, MIN(cells.cmc) AS cm_est
      FROM top t
      JOIN cells
        ON cells.cell = ('0x' || substr(md5(cells.d || ':' || t.w), 1, 15))::BIGINT % {CM_WIDTH}
      GROUP BY t.w, t.c
    )
    SELECT est.w AS token,
           CAST(c AS BIGINT) AS true_cnt,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - c AS BIGINT) AS overcount,
           cm_est >= c AND cm_est - c <= CAST(ceil(2.718281828 * total.n / {CM_WIDTH}) AS BIGINT)
             AS within_eN
    FROM est, total
    """,
)
def sketch_heavy_hitters_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch ({CM_DEPTH}x{CM_WIDTH},
    md5-derived row hashes), replicated EXACTLY in both engines: the top
    tokens by true count carry their CM estimate, the overcount, and a
    boolean asserting the sketch's published guarantee (est >= true and
    est - true <= e*N/width with the min over {CM_DEPTH} rows).

    Unlike KLL/HLL (opaque JVM sketches checked by contract only), this
    sketch is plain integer arithmetic, so the oracle reproduces every
    cell and the estimates hash-match bit-for-bit — the strongest
    verification tier available for a sketch.

    Scale shape: CM is linear, so the sketch is built from the
    token-frequency table (map-side-combined groupBy), not the raw
    stream — the {CM_DEPTH * CM_WIDTH}-cell table is the ONLY state that
    moves, and sketches from disjoint corpus shards merge by cell-wise
    addition (the monoid property the 1000-executor rollup needs).  The
    probe joins the {CM_TOP_K}-row top list against the broadcast cell
    table."""
    d = fan_out(table(spark, sf_dir, "documents").select("text"))
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    total = freq.agg(F.sum("c").alias("n"))
    cell_of = lambda dcol, wcol: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat_ws(":", dcol, wcol)), 1, 15), 16, 10).cast("long")
        % CM_WIDTH
    )
    cells = (
        freq.select(
            F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d"), "w", "c"
        )
        .groupBy("d", cell_of(F.col("d"), F.col("w")).alias("cell"))
        .agg(F.sum("c").alias("cmc"))
    )
    top = freq.orderBy(F.desc("c"), "w").limit(CM_TOP_K)
    probe = (
        top.join(
            F.broadcast(cells.withColumnRenamed("cell", "cm_cell")),
            cell_of(F.col("d"), F.col("w")) == F.col("cm_cell"),
        )
        .groupBy("w", "c")
        .agg(F.min("cmc").alias("cm_est"))
    )
    bound = F.ceil(F.lit(2.718281828) * F.col("n") / CM_WIDTH).cast("long")
    return probe.crossJoin(F.broadcast(total)).select(
        F.col("w").alias("token"),
        F.col("c").cast("bigint").alias("true_cnt"),
        F.col("cm_est").cast("bigint").alias("cm_est"),
        (F.col("cm_est") - F.col("c")).cast("bigint").alias("overcount"),
        ((F.col("cm_est") >= F.col("c")) & ((F.col("cm_est") - F.col("c")) <= bound)).alias(
            "within_eN"
        ),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership (exact cross-engine replica; completes the sketch
# family: KLL quantiles, HLL distinct, theta set-ops, count-min, Bloom)
# --------------------------------------------------------------------------

BLOOM_M = 2048  # bits
BLOOM_K = 3  # hash functions


@register(
    "sketch_bloom_membership",
    tags=("sketch", "contract"),
    oracle=f"""
    WITH members AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(j.j || ':' || k), 1, 15))::BIGINT % {BLOOM_M} AS bit
      FROM members, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
    ),
    probe AS (
      SELECT c.c_custkey AS k, c.c_nationkey AS nationkey,
             c.c_mktsegment = 'BUILDING' AS is_member
      FROM customer c
    ),
    hits AS (
      SELECT p.k, p.nationkey, p.is_member,
             COUNT(b.bit) = {BLOOM_K} AS bloom_hit
      FROM probe p
      CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j) j
      LEFT JOIN bits b
        ON b.bit = ('0x' || substr(md5(j.j || ':' || p.k), 1, 15))::BIGINT % {BLOOM_M}
      GROUP BY p.k, p.nationkey, p.is_member
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           ROUND(CAST(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END), 0), 6)
             AS fp_rate,
           SUM(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) = 0
             AS no_false_neg
    FROM hits
    GROUP BY nationkey
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership test, replicated EXACTLY in both engines
    ({BLOOM_K} md5-derived hashes into {BLOOM_M} bits): build the filter
    over the BUILDING-segment customer keys, probe with EVERY customer,
    and report per-nation probe counts, Bloom hits, false positives, the
    measured FP rate, and the structural no-false-negative guarantee as a
    boolean contract column.  Like the count-min query (and unlike the
    opaque JVM KLL/HLL sketches), the filter is plain integer arithmetic,
    so the oracle reproduces every bit and the counts hash-match
    bit-for-bit — the strongest verification tier for a sketch.

    Scale shape: the bit set is an OR-monoid — per-partition partial
    build, merge by union; only the {BLOOM_M}-bit set ever moves, and it
    broadcasts to the probe side (the plan's BroadcastHashJoin on the bit
    id).  This is exactly the runtime-filter pattern Spark itself uses for
    Bloom join pruning, surfaced as a first-class queryable operator."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nationkey"),
        (F.col("c_mktsegment") == "BUILDING").alias("is_member"),
    )
    bit_of = lambda j, k: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat_ws(":", j, k)), 1, 15), 16, 10).cast("long")
        % BLOOM_M
    )
    bits = (
        cust.filter("is_member")
        .select(F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j"), "k")
        .select(bit_of(F.col("j"), F.col("k")).alias("bit"))
        .distinct()
    )
    hits = (
        cust.select(
            "k", "nationkey", "is_member",
            F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j"),
        )
        .join(F.broadcast(bits), bit_of(F.col("j"), F.col("k")) == F.col("bit"), "left")
        .groupBy("k", "nationkey", "is_member")
        .agg((F.count("bit") == BLOOM_K).alias("bloom_hit"))
    )
    n_members = F.sum(F.col("is_member").cast("int"))
    n_fp = F.sum((F.col("bloom_hit") & ~F.col("is_member")).cast("int"))
    return hits.groupBy("nationkey").agg(
        F.count("*").cast("bigint").alias("n_probes"),
        n_members.cast("bigint").alias("n_members"),
        F.sum(F.col("bloom_hit").cast("int")).cast("bigint").alias("n_bloom_hits"),
        n_fp.cast("bigint").alias("n_false_pos"),
        F.round(
            n_fp.cast("double") / F.nullif(F.count("*") - n_members, F.lit(0)), 6
        ).alias("fp_rate"),
        (F.sum((F.col("is_member") & ~F.col("bloom_hit")).cast("int")) == 0).alias(
            "no_false_neg"
        ),
    )


# --------------------------------------------------------------------------
# Key-skew diagnostic: the pre-flight check before any big shuffle
# --------------------------------------------------------------------------


@register(
    "key_skew_report",
    tags=("pipeline", "stats", "scale"),
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    k AS (SELECT COUNT(*) AS k, SUM(n) AS total, MAX(n) AS mx, AVG(n) AS mean FROM c),
    r AS (SELECT user_id, n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS rn FROM c)
    SELECT CAST(k.k AS BIGINT) AS n_keys,
           CAST(k.total AS BIGINT) AS total_rows,
           ROUND(k.mean, 6) AS mean_per_key,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.50 * k.k) AS BIGINT) THEN n END) AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.90 * k.k) AS BIGINT) THEN n END) AS BIGINT) AS p90,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * k.k) AS BIGINT) THEN n END) AS BIGINT) AS p99,
           CAST(k.mx AS BIGINT) AS max_cnt,
           ROUND(k.mx / k.mean, 6) AS skew_ratio,
           (SELECT array_to_string(list_transform((list(user_id ORDER BY n DESC, user_id))[1:5],
                                                  x -> CAST(x AS VARCHAR)), ',') FROM c) AS top5_keys
    FROM r, k
    GROUP BY k.k, k.total, k.mx, k.mean
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic over events.user_id: key count,
    total rows, mean rows per key, rank-based exact p50/p90/p99 of the
    per-key count distribution, the max, the max/mean skew ratio, and
    the 5 heaviest keys — the report that decides whether a downstream
    join needs salting or AQE skew handling (see skew_join_salted for
    the remediation this report gates).

    Scale shape: the per-key count table is |keys| rows — orders of
    magnitude smaller than the corpus — so the rank window over it is
    cheap even at 100 TB of events; the corpus itself is touched once by
    a map-side-combined count. (For key spaces too large to rank
    exactly, sketch_doclen_quantiles shows the KLL path.) Rank-based
    percentiles (value at row ceil(q*k) in (count, key) order) are
    integer-exact and engine-identical, unlike interpolating
    percentile functions whose formulas differ across engines."""
    ev = table(spark, sf_dir, "events").select("user_id")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    k = c.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("total"),
        F.max("n").alias("mx"),
        F.avg("n").alias("mean"),
    )
    r = c.withColumn("rn", F.row_number().over(W.orderBy("n", "user_id")))
    at = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("k")), F.col("n"))
    ).cast("bigint")
    return (
        r.crossJoin(F.broadcast(k))
        .agg(
            F.max("k").cast("bigint").alias("n_keys"),
            F.max("total").cast("bigint").alias("total_rows"),
            F.round(F.max("mean"), 6).alias("mean_per_key"),
            at(0.50).alias("p50"),
            at(0.90).alias("p90"),
            at(0.99).alias("p99"),
            F.max("mx").cast("bigint").alias("max_cnt"),
            F.round(F.max("mx") / F.max("mean"), 6).alias("skew_ratio"),
            # STRING, not ARRAY: the driver canonicalizes result rows with a
            # pandas sort, which cannot sort list columns — no registered
            # query may emit a top-level complex type (tests/test_oracle_types.py)
            F.expr(
                "concat_ws(',', slice(transform(array_sort(collect_list(struct(-n AS negn, user_id AS user_id))),"
                " s -> cast(s.user_id as string)), 1, 5))"
            ).alias("top5_keys"),
        )
        # a global no-groupBy agg yields one all-NULL row on empty input,
        # but the oracle's GROUP BY yields zero rows — drop it for parity
        .filter(F.col("n_keys").isNotNull())
    )


# --------------------------------------------------------------------------
# Classifier evaluation: decile lift + threshold metrics over the score
# --------------------------------------------------------------------------

# same stand-in linear score as classifier_linear_score (_W_SPARK/_N_SPARK
# above are the single source of the Spark-side expression); the "label" is
# the same ">= 2 distinct required stopwords" proxy gopher_rules_filter's
# pass_stop rule uses — imported from text.STOPWORDS so they cannot diverge
from spark_bam_spark.queries.text import STOPWORDS as _LABEL_STOPWORDS  # noqa: E402

_SW_LIST = ", ".join(f"'{w}'" for w in _LABEL_STOPWORDS)

_SCORE_SQL = f"""
      SELECT doc_id,
             CAST(COALESCE(list_aggregate(list_transform(
                      list_filter(string_split(text, ' '), x -> length(x) > 0),
                      x -> (ascii(x)*31 + length(x)*7) % 101), 'sum'), 0) AS DOUBLE)
               / (101.0 * greatest(len(list_filter(string_split(text, ' '),
                                                   x -> length(x) > 0)), 1)) AS score,
             len(list_distinct(list_filter(string_split(lower(text), ' '),
                 x -> x IN ({_SW_LIST})))) >= 2 AS label
      FROM documents
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, label) — the one Spark-side construction both
    score-eval queries share; mirrors _SCORE_SQL exactly."""
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select(
        "doc_id",
        (
            F.expr(_W_SPARK).cast("double")
            / (101.0 * F.greatest(F.expr(_N_SPARK), F.lit(1)))
        ).alias("score"),
        (
            F.expr(
                f"size(array_distinct(filter(split(lower(text), ' '), x -> x IN ({_SW_LIST}))))"
            )
            >= 2
        ).alias("label"),
    )


@register(
    "score_decile_lift",
    tags=("mlprep", "classifier", "eval"),
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    ranked AS (
      SELECT score, label,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn,
             COUNT(*) OVER () AS n,
             CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) OVER () AS DOUBLE)
               / COUNT(*) OVER () AS base_rate
      FROM scored
    )
    SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS pos_rate,
           ROUND(CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                 / base_rate, 6) AS lift
    FROM ranked
    GROUP BY CAST(((rn - 1) * 10) // n AS BIGINT), base_rate
    """,
)
def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table for the classifier score — the standard
    calibration artifact for a quality filter: rank all docs by score,
    cut into 10 equal buckets with the EXPLICIT integer formula
    floor((rn-1)*10/n) (never NTILE, whose remainder distribution is an
    engine implementation detail), and report each decile's positive
    rate against the base rate. Label = the deterministic stopword
    quality proxy, so both engines derive identical (score, label)
    pairs and the table is integer-exact up to the final rounded
    ratios.

    Scale shape: one global rank window over (score, doc_id) — at 100 TB
    the rank would come from a two-pass range-partitioned sort (or the
    KLL sketch for approximate deciles); the per-decile agg is 10
    groups. Everything else is a narrow JVM map."""
    scored = _scored_docs(spark, sf_dir)
    ranked = scored.select(
        "score",
        "label",
        F.row_number().over(W.orderBy(F.desc("score"), "doc_id")).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("n"),
        (
            F.sum(F.col("label").cast("int")).over(W.partitionBy()).cast("double")
            / F.count("*").over(W.partitionBy())
        ).alias("base_rate"),
    )
    pos = F.sum(F.col("label").cast("int"))
    rate = pos.cast("double") / F.count("*")
    return ranked.groupBy(
        F.expr("((rn - 1) * 10) div n").cast("bigint").alias("decile"), "base_rate"
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        pos.cast("bigint").alias("n_pos"),
        F.round(rate, 6).alias("pos_rate"),
        F.round(rate / F.col("base_rate"), 6).alias("lift"),
    ).drop("base_rate")


@register(
    "score_threshold_metrics",
    tags=("mlprep", "classifier", "eval"),
    oracle=f"""
    WITH scored AS ({_SCORE_SQL}),
    th AS (SELECT unnest([0.46, 0.50, 0.54]) AS threshold)
    SELECT threshold,
           CAST(SUM(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN score >= threshold AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN score < threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN score < threshold AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           ROUND(CAST(SUM(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END), 0), 6) AS precision,
           ROUND(CAST(SUM(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN label THEN 1 ELSE 0 END), 0), 6) AS recall
    FROM scored, th
    GROUP BY threshold
    """,
)
def score_threshold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point metrics for the classifier score: TP/FP/FN/TN and
    precision/recall at three fixed thresholds against the deterministic
    stopword quality label — the artifact that picks a quality filter's
    cutoff (companion to score_decile_lift's ranking view).

    Scale shape: the per-doc (score, label) map crossJoins a 3-row
    broadcast threshold list and aggregates to 3 groups — map-side
    combined, integer-exact counts, one tiny shuffle."""
    scored = _scored_docs(spark, sf_dir).drop("doc_id")
    th = F.explode(F.array(F.lit(0.46), F.lit(0.50), F.lit(0.54))).alias("threshold")
    cnt = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    pred = F.col("score") >= F.col("threshold")
    tp = cnt(pred & F.col("label"))
    return (
        scored.select("score", "label", th)
        .groupBy("threshold")
        .agg(
            tp.alias("tp"),
            cnt(pred & ~F.col("label")).alias("fp"),
            cnt(~pred & F.col("label")).alias("fn"),
            cnt(~pred & ~F.col("label")).alias("tn"),
            F.round(
                tp.cast("double") / F.nullif(cnt(pred), F.lit(0)), 6
            ).alias("precision"),
            F.round(
                tp.cast("double") / F.nullif(cnt(F.col("label")), F.lit(0)), 6
            ).alias("recall"),
        )
    )
