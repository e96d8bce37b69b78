"""Batch-checkable equivalents of the streaming pipelines (SURVEY §2.9).

The live Structured Streaming versions (readStream → watermark → windowed
agg) live in ``spark_bam_spark.streaming`` and are exercised by tests; the
queries here compute the identical results in batch so the DuckDB oracle
can verify the window semantics (tumbling buckets are epoch-aligned in
both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.tables import table

SESSION_GAP_MIN = 30


@register(
    "window_tumbling_hourly",
    headline=True,
    tags=("streaming", "window"),
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window agg — identical grouping to the
    streaming pipeline's `F.window(ts, '1 hour')` (epoch-aligned)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "window_sliding_6h_1h",
    tags=("streaming", "window"),
    oracle="""
    SELECT strftime(s.start, '%Y-%m-%d %H:%M:%S') AS window_start, COUNT(*) AS n
    FROM (SELECT UNNEST(generate_series(TIMESTAMP '2023-12-31 19:00:00',
                                        TIMESTAMP '2024-01-31 00:00:00',
                                        INTERVAL 1 HOUR)) AS start) s
    JOIN events e ON e.ts >= s.start AND e.ts < s.start + INTERVAL 6 HOUR
    GROUP BY 1
    """,
)
def window_sliding_6h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 6h-window/1h-slide counts — `F.window(ts, '6 hours', '1 hour')`.

    Spark assigns each event to its 6 covering windows (an explode, not a
    join) — the streaming-native formulation; the oracle states the same
    result as an interval join."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "n")
    )


@register(
    "sessionization_gap30m",
    tags=("streaming", "session"),
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionization_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap>30min starts a session (lag + cumsum) — the
    batch equivalent of `session_window(ts, '30 minutes')`; one shuffle
    on user_id, windows computed per key.  Gap arithmetic runs on µs
    epochs (unix_micros over an explicit LTZ cast) so it works whether
    the parquet ts surfaces as TIMESTAMP, TIMESTAMP_NTZ, or — via
    tables.py's nanos branch — an already-converted timestamp."""
    ev = table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = ts_us - F.lag(ts_us).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        ts_us.alias("ts_us"),
        "event_id",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0).alias("is_new"),
    )
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    sess = flagged.withColumn("session_id", F.sum("is_new").over(cum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000)).cast("bigint").alias("duration_sec"),
    )


@register(
    "session_window_native",
    tags=("streaming", "session"),
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window in BATCH (same operator the streaming twin
    uses) — sessions merge while events arrive within the 30-minute gap.
    The oracle derives identical sessions with the gaps-and-islands
    construction, proving the built-in's semantics against first
    principles."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"), F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("session_last"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "stateful_topk_purchases",
    tags=("streaming", "state", "O3"),
    oracle="""
    SELECT user_id, CAST(rn AS INT) AS rank, value, event_id FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events WHERE event_type = 'purchase')
    WHERE rn <= 3
    """,
)
def stateful_topk_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stateful_topk_purchases (per-user top-3
    purchases, the transformWithStateInPandas ListState operator): a
    grouped top-k window with deterministic tie-break. row_number() <= k
    compiles to WindowGroupLimit — partitions pre-prune to local top-k
    before the exchange, so per-key work is O(k) exactly like the
    streaming state bound."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("user_id", F.col("rn").cast("int").alias("rank"), "value", "event_id")
    )


@register(
    "stream_static_enrich",
    tags=("streaming", "join"),
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.static_enrich: events enriched against the
    static customer dimension (broadcast hash join — the dim is tiny next
    to the fact stream) and aggregated per market segment. DECIMAL
    accumulation keeps the sum exact and order-independent across both
    engines and both execution modes (micro-batch vs batch)."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    from spark_bam_spark.streaming import static_enrich

    return static_enrich(ev, cust)


@register(
    "stream_stream_click_purchase",
    tags=("streaming", "join", "interval"),
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_stream_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.click_purchase_join (stream-stream interval
    join, SURVEY §2.9 engine extension): each click matched to purchases by
    the same user within 1 hour after it.  The plan is an equi-join on
    user_id with the time bounds as residual predicates — one shuffle per
    side on the join key, exactly the state layout the streaming version
    keeps per watermark; no range-explosion, no cartesian."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "purchase_value",
        )
    )


@register(
    "streaming_dedup_recovery",
    tags=("streaming", "dedup"),
    oracle="""
    WITH delivered AS (
      SELECT * FROM events
      UNION ALL
      SELECT * FROM events WHERE event_id % 10 = 0
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM (SELECT DISTINCT * FROM delivered)
    GROUP BY event_type
    """,
)
def streaming_dedup_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.dedup_within_watermark
    (dropDuplicatesWithinWatermark): at-least-once delivery is simulated by
    re-delivering every 10th event, then exact-once output is recovered by
    full-row dedup — duplicate deliveries are bit-identical, so the result
    is deterministic on both engines.  The aggregate proves the recovered
    multiset equals the original.  Scale shape: one hash-distinct shuffle
    (map-side partial dedup), same state bound the streaming operator keeps
    per watermark window."""
    ev = table(spark, sf_dir, "events")
    delivered = ev.unionAll(ev.filter(F.col("event_id") % 10 == 0))
    return (
        delivered.distinct()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


@register(
    "session_path_analysis",
    tags=("streaming", "session", "analytics"),
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def session_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the top-20 session-opening event-type
    sequences (first 5 steps of each gap-30m session) by session count —
    the "what do users do after arriving" report built on the same
    lag+cumsum sessionization as sessionization_gap30m.

    Scale shape: one shuffle on user_id; the session window and the
    per-session path assembly (in-row array_sort over <= first-5 structs
    after collect_list) reuse that partitioning; path counting is a
    map-side-combined agg on the path string; top-20 is
    TakeOrderedAndProject."""
    ev = table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = ts_us - F.lag(ts_us).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        ts_us.alias("ts_us"),
        "event_id",
        "event_type",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = flagged.withColumn("session_id", F.sum("is_new").over(cum))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.expr(
            "array_join(slice(transform(array_sort(collect_list("
            "struct(ts_us AS ts_us, event_id AS event_id, event_type AS event_type))),"
            " s -> s.event_type), 1, 5), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )
