"""Hub-shingle df-cap (dedup.LSH_DF_CAP): the release valve that keeps
banded MinHash-LSH linear on corpora with boilerplate.

A shingle shared by m documents tends to become the band minimum for all
of them, producing one O(m²) candidate bucket no banding parameter can
split.  The cap drops shingles with document frequency > LSH_DF_CAP
before min-hashing, on BOTH engine sides.

Two pins:
1. The fixtures (max df 25 at sf0.1) sit below the cap, so the capped
   pipeline is bit-identical to the uncapped one there — recall of
   lsh_quality_eval is unchanged by construction, asserted directly.
2. A degenerate corpus (one boilerplate trigram in every doc, otherwise
   pairwise-disjoint vocabulary) explodes quadratically uncapped and
   yields ZERO candidate pairs capped — and the capped result still
   hash-matches the DuckDB oracle on that corpus.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_bam_spark.queries import load_all
from spark_bam_spark.queries.dedup import LSH_DF_CAP
from tests.oracle import compare

REGISTRY = load_all()

SF_SRC = "/root/testdata/sf0.001"

N_HUB_DOCS = LSH_DF_CAP + 6  # enough docs that the shared trigram is a hub


@pytest.fixture(scope="module")
def hub_corpus_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("hub_corpus")
    for name in os.listdir(SF_SRC):
        if name.endswith(".parquet") and name != "documents.parquet":
            shutil.copy(os.path.join(SF_SRC, name), out / name)
    # every doc: the SAME leading boilerplate trigram, then a private
    # 3-word tail (disjoint vocab) — so the only shared shingles involve
    # the boilerplate prefix, and each appears in all N_HUB_DOCS docs
    rows = [
        (
            i,
            f"common header line u{i}a u{i}b u{i}c",
            "en",
            "src0",
            30,
        )
        for i in range(N_HUB_DOCS)
    ]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(
        [dict(zip([f.name for f in schema], r)) for r in rows], schema=schema
    ), str(out / "documents.parquet"))
    return str(out)


def test_cap_kills_degenerate_bucket_and_stays_oracle_exact(spark, hub_corpus_dir):
    spec = REGISTRY["dedup_minhash_lsh"]
    # capped: every cross-doc shingle is a hub (df = N_HUB_DOCS > cap), so
    # no candidate pairs survive — instead of N*(N-1)/2 ≈ 2.4k pairs
    pairs = spec.fn(spark, hub_corpus_dir).count()
    assert pairs == 0, f"expected hub bucket suppressed, got {pairs} pairs"
    # and the capped pipeline still hash-matches its DuckDB oracle here
    compare(spark, "dedup_minhash_lsh", spec, hub_corpus_dir)


def test_cap_is_inert_on_fixtures(spark, sf_medium):
    """Fixture max df (7 at sf0.01, 25 at sf0.1) < LSH_DF_CAP: the hub
    list must be empty, so capped == uncapped there (recall unchanged)."""
    from pyspark.sql import functions as F

    from spark_bam_spark.queries.dedup import _shingles
    from spark_bam_spark.tables import table

    sh = _shingles(table(spark, sf_medium, "documents"), distinct=False)
    n_hubs = (
        sh.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > LSH_DF_CAP)
        .count()
    )
    assert n_hubs == 0


def test_quality_eval_recall_pinned(spark, sf_medium):
    """Planted-near-dup recall under the deployed production config
    (independent per-band hashes + df-cap; the cap's hub list is empty on
    this corpus).  66/72 at sf0.01 — the value that exposed and retired
    the Kirsch-Mitzenmacher scheme, which scored only 43/72 here."""
    row = REGISTRY["lsh_quality_eval"].fn(spark, sf_medium).collect()[0]
    assert row["n_planted"] == 72 and row["n_planted_found"] == 66, row
    assert abs(row["recall"] - 66 / 72) < 1e-12, row


def test_band_hashes_are_independent_and_engine_identical(spark):
    """Pins the independent-band scheme that replaced KM double hashing:
    (a) the N_BANDS hashes of one shingle are pairwise distinct (they
    come from different md5 preimages, so band minima decorrelate — the
    property KM lacked), and (b) Spark's conv(substring(md5)) pipeline
    produces bit-identical values to DuckDB's '0x'||substr(md5)::BIGINT
    for the same shingle strings."""
    import duckdb
    from pyspark.sql import functions as F

    from spark_bam_spark.queries.dedup import _band_hash_col, N_BANDS

    shingles = ["alpha beta gamma", "the quick fox", "a b c", "x y z"]
    df = spark.createDataFrame([(s,) for s in shingles], "s string").select(
        "s", *[_band_hash_col(b).alias(f"h{b}") for b in range(N_BANDS)]
    )
    rows = {r["s"]: [r[f"h{b}"] for b in range(N_BANDS)] for r in df.collect()}
    for s, hs in rows.items():
        assert len(set(hs)) == N_BANDS, f"band hashes collide for {s!r}: {hs}"

    con = duckdb.connect()
    for s in shingles:
        duck = [
            con.sql(
                f"SELECT ('0x' || substr(md5('{b}:' || '{s}'), 1, 15))::BIGINT"
            ).fetchone()[0]
            for b in range(N_BANDS)
        ]
        assert duck == rows[s], (s, duck, rows[s])
    con.close()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_stream_batch_step_hub_blocklist_anti_join(spark, hub_corpus_dir):
    """The streaming feature's production hub path, as working code
    (stream_dedup_minhash_lsh's docstring promise): derive the blocklist
    OFFLINE with the registered df-cap rule, broadcast-anti-join it in
    the batch step.  On the degenerate hub corpus the unvalved step
    prunes lex-later docs through the hub bucket; with the blocklist
    those decisions disappear (the private tails are pairwise-disjoint)
    — the same suppression the batch query's in-line df-cap produces —
    while the state still registers every private-tail bucket."""
    from spark_bam_spark.queries.dedup import lsh_hub_blocklist
    from spark_bam_spark.streaming import lsh_dedup_batch_step
    from spark_bam_spark.tables import table

    docs = table(spark, hub_corpus_dir, "documents").select("doc_id", "text")
    empty_state = spark.createDataFrame(
        [], "band int, sig bigint, owner_tag bigint, owner_id bigint"
    )

    # unvalved: the shared boilerplate trigram owns band minima for many
    # docs, so hub-bucket collisions prune docs that share NO real content
    dec_unvalved, _ = lsh_dedup_batch_step(docs, empty_state)
    assert dec_unvalved.count() > 0

    # offline blocklist: the package helper encoding the registered
    # df-cap rule over h0 (the same derivation dedup_minhash_lsh inlines)
    hub = lsh_hub_blocklist(docs)
    assert hub.count() == 1  # exactly the boilerplate trigram

    dec_valved, changed = lsh_dedup_batch_step(docs, empty_state, hub_h0=hub)
    assert dec_valved.count() == 0  # disjoint tails => no true near-dups
    assert changed.count() > 0  # private-tail buckets still enter state


def test_stream_hub_blocklist_end_to_end(spark, hub_corpus_dir, tmp_path):
    """The valve through the PRODUCTION entry point (r15 VERDICT order
    #1): lsh_hub_blocklist derives the df-cap blocklist offline, and
    lsh_dedup_stream threads it through every micro-batch's transaction
    — the real Structured Streaming query on the degenerate hub corpus
    emits hub-collision decisions unvalved and ZERO decisions valved,
    while the state still registers the private-tail buckets."""
    import os

    from spark_bam_spark.queries.dedup import _lsh_write_landing, lsh_hub_blocklist
    from spark_bam_spark.streaming import lsh_dedup_stream, lsh_state
    from spark_bam_spark.tables import table

    docs = table(spark, hub_corpus_dir, "documents").select("doc_id", "text")
    hub = lsh_hub_blocklist(docs)
    assert hub.count() == 1  # exactly the boilerplate trigram

    # tag-ordered landing zone via the runner's OWN builder (can't drift)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    _lsh_write_landing(docs, landing)

    def run(root, hub_h0):
        state = os.path.join(root, "state")
        out = os.path.join(root, "decisions")
        os.makedirs(out, exist_ok=True)
        lsh_dedup_stream(spark, landing, state, out, hub_h0=hub_h0)
        dec = (
            spark.read.schema("doc_pruned bigint, dup_of bigint")
            .option("recursiveFileLookup", "true")
            .parquet(out)
        )
        return dec.count(), lsh_state(spark, state).count()

    n_unvalved, _ = run(str(tmp_path / "unvalved"), None)
    assert n_unvalved > 0  # hub-bucket collisions prune disjoint docs

    n_valved, n_state = run(str(tmp_path / "valved"), hub)
    assert n_valved == 0  # tails are pairwise-disjoint: no true near-dups
    assert n_state > 0  # private-tail buckets still enter the state


def test_stream_hub_cap_fires_on_fixtures(spark, sf_medium):
    """STREAM_HUB_CAP sits below the fixtures' max shingle df (5 < 7 at
    sf0.01), so stream_dedup_lsh_hub_valved's blocklist is NON-empty —
    the driver hash is checking a FIRING valve, not a no-op anti-join.
    (This test pins only blocklist non-emptiness; the valved-vs-unvalved
    decision divergence itself — 254 vs 255 decisions at sf0.01 — is
    pinned by the external driver's hashes of both registered twins, not
    here: r16 ADVICE #3.)"""
    from spark_bam_spark.queries.dedup import STREAM_HUB_CAP, lsh_hub_blocklist
    from spark_bam_spark.tables import table

    docs = table(spark, sf_medium, "documents").select("doc_id", "text")
    assert lsh_hub_blocklist(docs, cap=STREAM_HUB_CAP).count() > 0
