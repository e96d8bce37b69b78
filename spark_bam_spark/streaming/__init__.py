"""Structured Streaming pipelines over the events table (SURVEY §2.9 —
new surface; the reference is RDD-era and has none).

Batch-equivalence contract: each pipeline here has a batch twin in
``queries/streaming_batch.py`` checked against the DuckDB oracle; tests
assert stream results == batch results on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.

    The stream schema is inferred from a batch read of the same file, so
    the ts column is handled identically to ``tables.table``: nanosecond
    BIGINT layouts (legacy nanosAsLong) are converted ns→µs, while native
    TIMESTAMP / TIMESTAMP_NTZ parquet columns get an explicit LTZ cast
    (exact under the pinned UTC session timezone)."""
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling window agg — the streaming twin of
    window_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows (session_window) — streaming twin of
    sessionization_gap30m (same sessions; schema differs by design)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "w.start", "w.end", "n_events")
    )


def daily_distinct_users(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-day approximate distinct users via HLL sketch aggregation.

    Exact COUNT(DISTINCT) is unsupported in Structured Streaming (state
    would grow with cardinality); the HLL sketch is the scale path — a
    fixed-size mergeable state per window.  The batch twin
    (queries/datapipe.py::sketch_distinct_users_daily) carries the DuckDB
    oracle; tests assert the streaming estimate lands within the sketch's
    tolerance of the batch exact count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "approx_users")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id bounded by the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (schema from a batch
    read, same device as stream_events)."""
    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def chunk_dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming chunk-level dedup: each arriving document is chunked
    into the token-window contract (queries/text.py chunk_windows_frame —
    a pure narrow map, so it runs unchanged inside the stream), then
    only FIRST-SEEN chunk fingerprints pass (dropDuplicatesWithinWatermark
    keyed on chunk_hash, state bounded by the watermark) — the streaming
    ingest shape of an embedding store that computes each unique chunk's
    vector exactly once.  Batch twin with the DuckDB oracle:
    queries/text.py::chunk_dedup_first_occurrence (which pins first
    occurrence to the lowest (doc_id, chunk_idx); the stream's keep is
    arrival-order-dependent, so the shared contract is the survivor
    fingerprint set/count, not per-doc attribution).  Event time is
    synthesized from
    doc_id (documents carry no timestamp): one doc per second, offset a
    day past the epoch — Spark's initial watermark IS the epoch and the
    state store expires rows at-or-below it, so an exactly-epoch event
    time would be silently dropped as late."""
    from spark_bam_spark.queries.text import chunk_windows_frame

    chunks = chunk_windows_frame(docs.select("doc_id", "text")).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") + F.lit(86_400))
    )
    return chunks.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["chunk_hash"]
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a bounded file-source stream to completion into an in-memory
    sink; returns the materialized result (local test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def stateful_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals kept in explicit state across micro-batches (SURVEY
    §2.9 engine extension; the reference's per-partition Checker-state
    pattern, check/.../Checker.scala:22-24, lifted to streaming state).

    State schema = (n_events, total_value); each batch folds its rows
    into state and emits the updated row — update-mode output."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def fold(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_join(events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each click joined to purchases by the
    same user within ``horizon`` after the click (SURVEY §2.9 engine
    extension). Watermarks on BOTH sides bound the join state — without
    them the runtime would buffer streams forever; with them state older
    than watermark+horizon is evicted."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


def static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + keyed aggregation: each streaming
    event is joined to a STATIC dimension (broadcast — the dim is read
    once per micro-batch, never stateful) and aggregated per segment.

    Versus the stream-stream join (click_purchase_join), no watermark is
    required for the join itself: the static side is complete by
    definition, so the engine holds no join state. The downstream keyed
    agg is the only stateful operator (update-mode totals per segment) —
    exactly how a 100 TB ingest enriches events against slowly-changing
    dims without unbounded state."""
    d = F.broadcast(dim.select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")))
    return (
        events.join(d, "user_id")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


def run_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Checkpointed parquet sink: exactly-once via the sink's commit log —
    re-running over already-committed input produces no duplicates (the
    engine's fault-tolerance surface; SURVEY §2.9 extension)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _topk_fold(state_rows, pdfs, k: int) -> list[tuple[float, int]]:
    """Merge retained (value, event_id) state with a batch of pandas
    frames; return the new top-k (value desc, event_id asc tie-break).
    Shared by the streaming processor and unit tests."""
    cur = [(float(r[0]), int(r[1])) for r in state_rows]
    for pdf in pdfs:
        cur.extend(zip(pdf["value"].astype(float), pdf["event_id"].astype(int)))
    cur.sort(key=lambda t: (-t[0], t[1]))
    return cur[:k]


def stateful_topk_purchases(events: DataFrame, k: int = 3) -> DataFrame:
    """Custom stateful operator via transformWithStateInPandas (the Spark 4
    arbitrary-state v2 API): per-user top-k purchase values held in a
    typed ListState across micro-batches.

    Versus applyInPandasWithState (stateful_user_totals above), the v2
    processor gets named, individually-evictable state primitives
    (ListState here; ValueState/MapState/timers available) instead of one
    opaque tuple — the state the engine would need for any bounded-memory
    per-key structure (top-k, reservoir, HyperLogLog) at 100 TB, where
    per-key state must stay O(k) no matter how many events stream by.

    Requires the RocksDB state store (set by the caller/test via
    spark.sql.streaming.stateStore.providerClass)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id bigint, rank int, value double, event_id bigint"

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getListState("topk", "value double, event_id bigint")

        def handleInputRows(self, key, rows, timer_values):
            cur = _topk_fold(self._state.get(), rows, k)
            self._state.put(cur)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    "value": [v for v, _ in cur],
                    "event_id": [e for _, e in cur],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopK(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def cm_user_cells(events: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch cells over an unbounded stream: per-row hashing
    into depth x width integer cells, aggregated in complete mode.

    The streaming twin of queries/datapipe.py::sketch_heavy_hitters_cm —
    the point is STATE SIZE: exact per-key counting grows state with
    cardinality, while the CM table is a fixed depth*width integers no
    matter how many distinct keys the stream carries, and cells from
    restarts/shards merge by addition.  Heavy-hitter queries probe the
    materialized cell table with min-over-rows."""
    cells = events.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), "user_id"
    )
    cell = (
        F.conv(F.substring(F.md5(F.concat_ws(":", "d", "user_id")), 1, 15), 16, 10).cast(
            "long"
        )
        % width
    )
    return cells.groupBy("d", cell.alias("cell")).agg(F.count("*").alias("cmc"))


def scd2_intervals_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming SCD-2 / CDC build via applyInPandasWithState: per-user
    ValueState holds the OPEN interval (latest purchase ts/value); each
    arriving event closes it, emitting an immutable
    (user_id, value, valid_from, valid_to) row in APPEND mode while the
    new open interval replaces the state.

    The streaming twin of queries/curation.py::scd2_value_intervals
    (whose batch window computes the same intervals): at warehouse scale
    this replaces the nightly MERGE "close old rows, open new" with
    per-key O(1) state and append-only output — closed intervals are
    facts, never updated.  Event times travel as int64 micros so state
    stays timezone-free; within a batch rows are ordered by
    (ts, event_id), matching the batch twin's tie-break.  Cross-batch
    ordering relies on the watermark as usual for CDC-over-streams."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, value double, valid_from bigint, valid_to bigint"
    state_schema = "ts bigint, event_id bigint, value double"

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(
                    pdf["ts_us"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["value"].astype(float),
                )
            )
        if not rows:
            return
        rows.sort()
        seq = ([tuple(state.get)] if state.exists else []) + rows
        state.update((int(seq[-1][0]), int(seq[-1][1]), float(seq[-1][2])))
        if len(seq) < 2:
            return
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * (len(seq) - 1),
                "value": [v for _, _, v in seq[:-1]],
                "valid_from": [t for t, _, _ in seq[:-1]],
                "valid_to": [t for t, _, _ in seq[1:]],
            }
        )

    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "ts",
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
            "value",
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cdc_merge_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming CDC latest-wins MERGE via applyInPandasWithState: per-key
    ValueState holds the newest change seen so far ((ts, event_id) total
    order); every batch folds its rows against the state and emits the
    key's CURRENT merged row in UPDATE mode — the streaming twin of
    queries/curation.py::cdc_merge_latest (the type-1 snapshot), exactly
    as scd2_intervals_stream twins the SCD-2 interval builder.

    At warehouse scale this is the continuous MERGE INTO: per-key O(1)
    state (one row), update-mode output feeding an upsert sink. Delete
    ops ('error' here) stay IN state — a later change may supersede
    them — and consumers drop keys whose current op is the delete, same
    as the batch filter. Event times travel as int64 micros so state is
    timezone-free."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, last_op string, last_value double,"
        " last_ts_us bigint, last_event_id bigint"
    )
    state_schema = "ts bigint, event_id bigint, op string, value double"

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(
                    pdf["ts_us"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["event_type"],
                    pdf["value"].astype(float),
                )
            )
        if not rows:
            return
        cand = max(rows, key=lambda r: (r[0], r[1]))
        if state.exists:
            ts, eid, op, val = state.get
            if (ts, eid) > (cand[0], cand[1]):
                cand = (ts, eid, op, val)
        state.update((int(cand[0]), int(cand[1]), str(cand[2]), float(cand[3])))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_op": [str(cand[2])],
                "last_value": [float(cand[3])],
                "last_ts_us": [int(cand[0])],
                "last_event_id": [int(cand[1])],
            }
        )

    return (
        events.select(
            "ts",
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def value_quantiles_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-event-type streaming value quantiles via KLL sketch
    aggregation — the quantile member of the streaming sketch family
    (HLL distinct in daily_distinct_users, count-min in cm_user_cells).
    Exact percentiles are unsupported over unbounded streams (state
    would hold every value); the KLL sketch is the scale path — a
    fixed-size mergeable state per group whose published rank error
    bounds the drift monitor's tolerance.

    Tests assert the streamed estimates honor the sketch's rank
    contract against the exact batch distribution, the same in-frame
    bound the batch twin (queries/datapipe.py::sketch_doclen_quantiles)
    carries in its oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50_est"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90_est"),
        )
    )


_LSH_STATE_SCHEMA = "band int, sig bigint, owner_tag bigint, owner_id bigint"


def _lsh_pointer_read_full(state_root: str) -> tuple[int, int, int]:
    """(cur, base, max_okey): the last COMMITTED batch id (-1 before the
    first commit), the generation id of the compacted base (-1 = none),
    and the largest admitted lex key (-1 = none; the arrival-order
    tripwire's watermark — see lsh_dedup_process_batch).  The pointer
    file is the state's single source of truth: delta/base dirs it
    doesn't cover are uncommitted leftovers of a torn batch or torn
    compaction and are ignored by readers (the retry overwrites them).
    Pointers written before the third field existed read as
    max_okey = -1, which disables the tripwire for exactly one batch —
    the conservative upgrade path."""
    import os

    try:
        with open(os.path.join(state_root, "CURRENT")) as f:
            parts = f.read().split()
        return (
            int(parts[0]),
            (int(parts[1]) if len(parts) > 1 else -1),
            (int(parts[2]) if len(parts) > 2 else -1),
        )
    except (FileNotFoundError, ValueError, IndexError):
        return -1, -1, -1


def _lsh_pointer_read(state_root: str) -> tuple[int, int]:
    """(cur, base) — see _lsh_pointer_read_full."""
    return _lsh_pointer_read_full(state_root)[:2]


def lsh_state_pointer(state_root: str) -> int:
    """Last committed batch id (-1 before the first commit)."""
    return _lsh_pointer_read(state_root)[0]


def _lsh_commit_pointer(
    state_root: str,
    batch_id: int,
    base: int | None = None,
    max_okey: int | None = None,
) -> None:
    """Atomically advance the committed-batch pointer (write-aside +
    ``os.replace``, the POSIX atomic-rename commit).  A crash before the
    replace leaves the previous pointer — and therefore the previous
    consistent state — in force; there is no window in which the state
    root is empty or half-swapped (the r14 rmtree+rename swap had
    exactly that window, and a restart silently reset state to empty).
    ``base`` and ``max_okey`` are preserved from the current pointer
    unless given (a compaction commit sets base; a batch commit advances
    max_okey).

    Durability envelope: PROCESS-crash safe (the tests simulate every
    torn window), and the pointer itself is fsynced (file, then the
    containing dir after the rename) so a committed pointer survives
    power loss — but the parquet delta/base writes it publishes are NOT
    fsynced (Spark/Arrow writers don't expose it), so a power loss can
    preserve a pointer whose newest delta lost bytes.  A deployment
    needing full power-loss durability must fsync or replicate the
    storage layer underneath (HDFS/object stores already do)."""
    import os

    cur_base, cur_max = _lsh_pointer_read_full(state_root)[1:]
    if base is None:
        base = cur_base
    if max_okey is None:
        max_okey = cur_max
    tmp = os.path.join(state_root, f"CURRENT.tmp-{batch_id}")
    with open(tmp, "w") as f:
        f.write(f"{batch_id} {base} {max_okey}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_root, "CURRENT"))
    dir_fd = os.open(state_root, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _lsh_delta_dirs(state_root: str) -> list[str]:
    import os
    import re

    cur, base = _lsh_pointer_read(state_root)
    out = []
    if cur < 0 or not os.path.isdir(state_root):
        return out
    if base >= 0:
        base_dir = os.path.join(state_root, f"base-{base:05d}")
        if not os.path.isdir(base_dir):
            # the pointer promises this generation exists; silently
            # skipping it would drop every pre-base bucket from the
            # resolved state and emit wrong (missing) prune decisions
            raise FileNotFoundError(
                f"LSH state corrupt: pointer names base generation {base} "
                f"but {base_dir} is missing"
            )
        out.append(base_dir)
    for name in sorted(os.listdir(state_root)):
        m = re.fullmatch(r"delta-(\d+)", name)
        if m and base < int(m.group(1)) <= cur:
            out.append(os.path.join(state_root, name))
    return out


def lsh_state_compact(ss: SparkSession, state_root: str) -> int:
    """Fold every committed delta (and the previous base) into ONE base
    generation — the background job that bounds the reader's
    min-merge amplification at steady state (lsh_state reads base + the
    deltas after it).  Returns the number of superseded dirs GC'd
    (0 = already compact / nothing committed).

    Crash-safe by the same pointer protocol as the batch commits: the
    new base is written BESIDE the live state as ``base-<cur>``, a
    single atomic pointer replace publishes it (cur unchanged, base ->
    cur), and only then are superseded dirs deleted.  A crash before the
    pointer leaves the new base ignored (the rerun overwrites it); a
    crash during GC leaves dirs the read rule already excludes (delta-k
    with k <= base; older bases), and a rerun finishes the GC — min over
    duplicated rows would be idempotent even if they weren't excluded."""
    import os
    import re
    import shutil

    cur, base = _lsh_pointer_read(state_root)
    if cur < 0 or base == cur:
        return 0
    resolved = lsh_state(ss, state_root)
    resolved.write.mode("overwrite").parquet(
        os.path.join(state_root, f"base-{cur:05d}")
    )
    _lsh_commit_pointer(state_root, cur, base=cur)
    gc = 0
    for name in os.listdir(state_root):
        m = re.fullmatch(r"(delta|base)-(\d+)", name)
        if not m:
            continue
        k = int(m.group(2))
        if (m.group(1) == "delta" and k <= cur) or (m.group(1) == "base" and k < cur):
            shutil.rmtree(os.path.join(state_root, name))
            gc += 1
    return gc


def lsh_state(ss: SparkSession, state_root: str) -> DataFrame:
    """Resolve the bucket-owner state from the committed deltas: owner of
    a bucket = lex-MIN over every delta row for it.  Sound because each
    delta carries a batch-local per-bucket MIN and min is idempotent and
    mergeable — the state is a log-structured min-merge table.  Read
    amplification grows with delta count; ``lsh_state_compact`` is the
    background job that folds committed deltas into one base generation
    under the same crash-safe pointer protocol, bounding reads at
    steady state."""
    paths = _lsh_delta_dirs(state_root)
    if not paths:
        return ss.createDataFrame([], _LSH_STATE_SCHEMA)
    deltas = ss.read.schema(_LSH_STATE_SCHEMA).parquet(*paths)
    return (
        deltas.groupBy("band", "sig")
        .agg(F.min(F.struct("owner_tag", "owner_id")).alias("o"))
        .select(
            "band",
            "sig",
            F.col("o.owner_tag").alias("owner_tag"),
            F.col("o.owner_id").alias("owner_id"),
        )
    )


def lsh_dedup_batch_step(
    batch_docs: DataFrame,
    state: DataFrame,
    hub_h0: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the incremental LSH dedup, as a pure frame
    transform (unit- and plan-testable outside the stream): given the
    batch's documents (doc_id, text, ...) and the current bucket-owner
    state (band, sig, owner_tag, owner_id), return
    ``(decisions, changed)`` — the prune decisions for batch docs that
    share a bucket with a lex-earlier doc, and ONLY the state rows this
    batch changes (buckets that are new, or whose batch-local lex-MIN
    beats the current owner).  The changed set is what makes the
    per-batch state write O(batch buckets) instead of O(all buckets
    ever) — at 100 TB a nightly increment appends a small delta instead
    of rewriting the corpus-wide bucket table (r14 rewrote it
    wholesale).  ``hub_h0`` is the offline-refreshed hub blocklist
    (band-0 shingle hashes) broadcast-anti-joined before min-hashing —
    the production form of the batch query's df-cap, which a bounded
    per-batch state cannot compute online (see band_signatures; pinned
    on the degenerate hub corpus in tests/test_lsh_df_cap.py).  Plan
    shape: band-signature aggregation, one (band, sig) LEFT equi-join
    probing the state (never a union + full re-agg of it), one per-doc
    min-aggregation — no cartesian, no Python eval (pinned in
    test_plan_quality.py)."""
    from spark_bam_spark.queries.dedup import _stream_tag_col, band_signatures

    s = band_signatures(batch_docs.select("doc_id", "text"), hub_h0=hub_h0).withColumn(
        "tag", _stream_tag_col()
    )
    batch_owners = s.groupBy("band", "sig").agg(
        F.min(
            F.struct(F.col("tag").alias("owner_tag"), F.col("doc_id").alias("owner_id"))
        ).alias("bo")
    )
    merged = batch_owners.join(
        state.select(
            "band", "sig", F.struct("owner_tag", "owner_id").alias("so")
        ),
        ["band", "sig"],
        "left",
    ).select(
        "band",
        "sig",
        "bo",
        "so",
        F.when(F.col("so").isNull() | (F.col("bo") < F.col("so")), F.col("bo"))
        .otherwise(F.col("so"))
        .alias("o"),
    )
    decisions = (
        s.join(
            merged.select(
                "band",
                "sig",
                F.col("o.owner_tag").alias("owner_tag"),
                F.col("o.owner_id").alias("owner_id"),
            ),
            ["band", "sig"],
        )
        .filter(
            (F.col("owner_tag") < F.col("tag"))
            | (
                (F.col("owner_tag") == F.col("tag"))
                & (F.col("owner_id") < F.col("doc_id"))
            )
        )
        .groupBy("doc_id")
        .agg(F.min(F.struct("owner_tag", "owner_id")).alias("o"))
        .select(
            F.col("doc_id").alias("doc_pruned"),
            F.col("o.owner_id").alias("dup_of"),
        )
    )
    changed = merged.filter(
        F.col("so").isNull() | (F.col("bo") < F.col("so"))
    ).select(
        "band",
        "sig",
        F.col("bo.owner_tag").alias("owner_tag"),
        F.col("bo.owner_id").alias("owner_id"),
    )
    return decisions, changed


def lsh_dedup_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    out_dir: str,
    hub_h0: DataFrame | None = None,
    enforce_lex_order: bool = True,
) -> bool:
    """The idempotent per-batch transaction (foreachBatch body, callable
    directly for tests and backfills).  foreachBatch is AT-LEAST-ONCE: a
    driver crash after the sink writes but before the epoch commits
    re-delivers the same (batch_df, batch_id), so every effect here must
    tolerate replay:

    - decisions go to a per-``batch_id`` subdir in OVERWRITE mode — a
      replay rewrites the same rows instead of double-appending (the r14
      keyless ``append`` duplicated decision rows on retry);
    - the state delta goes to ``delta-<batch_id>`` in OVERWRITE mode and
      only the pointer commit (atomic rename) publishes it;
    - a batch whose id is <= the committed pointer already finished both
      writes and is skipped outright (returns False).

    Crash windows: before the decisions write — replay recomputes from
    the unchanged committed state; between the two writes — the delta is
    unpublished, replay overwrites both; after the pointer commit — the
    replay hits the skip guard.  Every window therefore converges to the
    uninterrupted run's bytes.

    ``hub_h0`` is the offline hub blocklist
    (queries.dedup.lsh_hub_blocklist), broadcast-anti-joined before
    min-hashing — the production df-cap valve, threaded through from
    lsh_dedup_stream.

    Arrival-order tripwire (``enforce_lex_order``): the decision stream
    is only correct when batches arrive in lex-key order (decisions are
    append-only — a lex-later batch admitted early would be emitted
    not-pruned and never revisited), so the pointer carries the largest
    admitted lex key and a batch whose MIN key does not exceed it raises
    loudly instead of silently diverging from the oracle.  The check is
    one tiny min/max aggregate over the batch.  Pass False only for
    state-only backfills whose decision output will be discarded — the
    STATE min-merges to the same owners under any arrival order.

    NOTE (r16 ADVICE #2): the lex key comes from ``_stream_okey_col``,
    which encodes THIS fixture's landing partitioning (tag = doc_id % 3,
    key = (tag, doc_id)).  A production landing zone partitioned by any
    other scheme must adapt that helper (or disable the tripwire) or
    in-order arrivals will raise spuriously."""
    import os

    from spark_bam_spark.queries.dedup import _stream_okey_col

    if batch_id <= lsh_state_pointer(state_root):
        return False
    os.makedirs(state_root, exist_ok=True)
    okey = _stream_okey_col()
    bounds = batch_df.select(F.min(okey).alias("lo"), F.max(okey).alias("hi")).first()
    committed_max = _lsh_pointer_read_full(state_root)[2]
    if (
        enforce_lex_order
        and bounds["lo"] is not None
        and bounds["lo"] <= committed_max
    ):
        raise ValueError(
            f"LSH dedup batch {batch_id} arrived out of lex order: its min "
            f"key {bounds['lo']} does not exceed the max admitted key "
            f"{committed_max} — the landing zone must deliver batches in "
            f"lex order or the append-only decision stream diverges "
            f"(state-only backfills may pass enforce_lex_order=False)"
        )
    ss = batch_df.sparkSession
    decisions, changed = lsh_dedup_batch_step(
        batch_df, lsh_state(ss, state_root), hub_h0=hub_h0
    )
    decisions.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch-{batch_id:05d}")
    )
    changed.write.mode("overwrite").parquet(
        os.path.join(state_root, f"delta-{batch_id:05d}")
    )
    _lsh_commit_pointer(
        state_root,
        batch_id,
        max_okey=committed_max if bounds["hi"] is None else max(committed_max, bounds["hi"]),
    )
    return True


def lsh_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    state_root: str,
    out_dir: str,
    compact_after: int | None = None,
    hub_h0: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming incremental MinHash-LSH near-dedup with cross-batch
    state: each micro-batch of landing documents is shingled and
    band-min-hashed (the dedup_minhash_lsh signature contract, minus the
    hub valve — see the registered query's docstring for the tradeoff),
    joined against the persisted bucket-owner state, and every batch doc
    that shares a band bucket with a lex-earlier doc is emitted as a
    prune decision; then the state absorbs the batch's changed buckets
    as an O(batch) delta (lsh_dedup_process_batch).

    Determinism contract that makes this oracle-checkable: precedence is
    the INTRINSIC lex key (batch_tag = doc_id % 3, doc_id), never
    arrival wall-time, and the state resolves to the per-bucket lex-MIN
    owner — a pure function of the set of docs seen so far.  Any split
    of the LEX-ORDERED landing files into consecutive micro-batches
    therefore yields byte-identical decisions (a doc is pruned iff SOME
    lex-earlier doc shares a bucket, regardless of which batch carried
    it), and the contract extends across RESTARTS: replays of committed
    batches are skipped, torn batches are rewritten in place, and the
    pointer commit means no crash leaves the state empty or half-swapped.
    Batch ARRIVAL order is load-bearing for the decision stream (not for
    the state): decisions are append-only, so a lex-later batch admitted
    early would emit its docs as not-pruned and never revisit them — the
    landing zone must deliver batches in lex order (the registered
    query's staggered mtimes + lexical filenames guarantee it; the state
    itself min-merges to the same owners under ANY arrival order), and a
    violation FAILS LOUDLY: the pointer carries the max admitted lex key
    and lsh_dedup_process_batch raises when a batch's min key does not
    exceed it, instead of silently diverging from the oracle.

    Scale shape (the production nightly-crawl loop): state is
    (band, sig) -> owner — O(distinct buckets), ~24 bytes each, NOT
    O(corpus); it is min-mergeable and log-structured (committed delta
    dirs + an atomic pointer), so at 100 TB it lives as a hash-bucketed
    table the batch equi-joins against with no skew (band hashes are
    uniform), each nightly batch appends only its changed buckets, and a
    background compaction folds deltas with the same min-merge the
    reader runs (lsh_state).  foreachBatch is the right Spark primitive
    because the per-batch logic is a multi-stage batch plan (agg + join
    + agg) over a SMALL increment — stateful-operator state stores hold
    row-level state, not a relational table you join against.

    ``compact_after``: run ``lsh_state_compact`` inside the stream right
    after that batch id commits — the steady-state maintenance loop
    (ingest, ingest, compact, ingest, ...) as one streaming run.
    Compaction is decision-invariant (the resolved owners are identical
    before and after the fold) and replay-safe (already-compact is a
    no-op), so the registered compacted twin carries the SAME oracle.

    ``hub_h0``: the offline-refreshed hub blocklist
    (queries.dedup.lsh_hub_blocklist) applied in every micro-batch's
    batch step — the production df-cap valve, end-to-end
    (tests/test_lsh_df_cap.py pins the full stream on the degenerate hub
    corpus).  It is MATERIALIZED here once, to ``<state_root>/_hub``,
    before the stream starts: a caller handing in the lazy derivation
    plan must not pay the full-corpus df pass inside every micro-batch —
    the broadcast side has to be a small materialized table, which is
    also the production shape (the refresh job writes a table the
    batches read).  ``checkpoint_dir`` defaults to ``<state_root>/_ckpt``
    so the stream's offset log shares the state's lifetime — wiping the
    state cannot leave a stale checkpoint that silently skips batches
    (and vice versa).  Pass it explicitly to manage the two separately.
    """
    import os

    os.makedirs(state_root, exist_ok=True)
    if hub_h0 is not None:
        # "_hub" never matches the delta-/base- generation regexes, so
        # state readers and compaction GC ignore it
        hub_path = os.path.join(state_root, "_hub")
        hub_h0.select("h0").write.mode("overwrite").parquet(hub_path)
        hub_h0 = spark.read.schema("h0 bigint").parquet(hub_path)
    # schema from the landing dir as a whole, not a hardcoded first file —
    # any landing layout with a consistent schema works (r14 ADVICE)
    batch_schema = spark.read.parquet(landing_dir).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(landing_dir)
    )

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        lsh_dedup_process_batch(batch_df, batch_id, state_root, out_dir, hub_h0=hub_h0)
        if compact_after is not None and batch_id == compact_after:
            lsh_state_compact(batch_df.sparkSession, state_root)

    q = (
        stream.writeStream.foreachBatch(_body)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(state_root, "_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
