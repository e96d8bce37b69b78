"""Format-layer + QA-pipeline queries for the driver's coverage check.

These exercise the BAM DataSource and the §2.11 QA pipelines. They run on
a deterministic fixture generated once under /tmp (the sf tables are
relational; BAM is a file format — the fixture generator IS the engine's
writer, so this is also a write-path test).

DuckDB cannot read BAM, but the scan-shaped queries still carry oracle
SQL: it reads the COMMITTED ground-truth parquet dumps
(tests/fixtures/qa2500_*.parquet, built by tools/gen_bam_truth.py
straight from the record generator, with cigar/end_pos/rname rendering
implemented independently of the decoder) — so the driver hash verifies
the full generator → writer → BGZF → decode path end-to-end. Pipelines
whose output has no truth dump stay rows-only, with exact-value coverage
in tests/test_qa_pipelines.py against the sidecar ground truth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register

# Ground-truth parquet fixtures are committed in-repo; build their paths
# from this module's location so the oracle SQL works from any checkout
# (the driver runs DuckDB from a foreign cwd).
_FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "tests", "fixtures").replace(os.sep, "/")
_TRUTH_PQ = f"{_FIXTURES_DIR}/qa2500_truth.parquet"
_BLOCKS_PQ = f"{_FIXTURES_DIR}/qa2500_blocks.parquet"
_SCAN_AGGS_PQ = f"{_FIXTURES_DIR}/qa_scan_aggs.parquet"
# compare-splits fixture truth (generator-derived; tools/gen_bam_golden.py)
_CMP_RECORDS_PQ = f"{_FIXTURES_DIR}/cmp_records.parquet"
_CMP_BLOCKS_PQ = f"{_FIXTURES_DIR}/cmp_blocks.parquet"
# golden regression pins for the checker diagnostics (reference parity:
# the committed check-bam outputs, cli/src/test/resources/output/check-bam/
# 1.bam:1-16): dumped once from a verified run (tools/gen_bam_golden.py),
# value-level correctness pinned independently by tests/test_checker.py
_G_FULL_CHECK_PQ = f"{_FIXTURES_DIR}/qa2500_golden_full_check.parquet"
_G_FULL_CHECK_CDF_PQ = f"{_FIXTURES_DIR}/qa2500_golden_full_check_cdf.parquet"
_G_CLOSE_CALLS_PQ = f"{_FIXTURES_DIR}/qa2500_golden_close_calls.parquet"
_G_FP_METADATA_PQ = f"{_FIXTURES_DIR}/qa2500_golden_fp_metadata.parquet"
_G_THREE_WAY_PQ = f"{_FIXTURES_DIR}/qa2500_golden_three_way.parquet"

_FIXTURE = "/tmp/spark_bam_spark_fixture/qa2500.bam"
_SAM_FIXTURE = "/tmp/spark_bam_spark_fixture/qa2500.sam"


# Bump when the generator's SIDECAR output changes (the BAM bytes are
# frozen — the committed truth parquet pins them) so cached fixtures
# regenerate: v2 = BAI gains the samtools metadata pseudo-bin + n_no_coor.
_FIXTURE_GEN_VERSION = 2


def _fixture_path() -> str:
    marker = f"{_FIXTURE}.genv{_FIXTURE_GEN_VERSION}"
    if not (os.path.exists(_FIXTURE) and os.path.exists(marker)):
        os.makedirs(os.path.dirname(_FIXTURE), exist_ok=True)
        from spark_bam_spark.bam.writer import make_fixture

        make_fixture(_FIXTURE, n=2500, block_payload=4096)
        with open(marker, "w"):
            pass
    return _FIXTURE


def _sam_fixture_path() -> str:
    # genv marker like _fixture_path/_flagstat_fixture_path (r12 ADVICE
    # pattern): existence alone would silently reuse a stale /tmp SAM
    # after a generator change while the truth parquet regenerates
    marker = f"{_SAM_FIXTURE}.genv{_FIXTURE_GEN_VERSION}"
    if not (os.path.exists(_SAM_FIXTURE) and os.path.exists(marker)):
        _fixture_path()
        from spark_bam_spark.bam.sam import write_sam
        from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES, synth_records

        write_sam(_SAM_FIXTURE, CONTIG_NAMES, CONTIG_LENGTHS, synth_records(2500))
        with open(marker, "w"):
            pass
    return _SAM_FIXTURE


# planned-DataFrame cache: planning a fresh Python DataSource read costs
# ~1s of driver-side python round-trips (schema/reader/partitions), while
# executing the cached immutable plan costs ~35ms. Same session + same
# options => identical plan, so reuse is sound.
_PLAN_CACHE: dict[tuple, DataFrame] = {}


def _reads(
    spark: SparkSession,
    split_size: int = 65536,
    columns: str | None = None,
    reader: str | None = None,
) -> DataFrame:
    """Fixture reads through the engine's DEFAULT read path (JVM DSv2
    when buildable, Python source otherwise — bam/reader.py dispatch;
    SPARK_GRAFT_BAM_READER overrides).  ``reader`` pins a path for the
    queries that keep per-path driver evidence alive."""
    from spark_bam_spark.bam.reader import read_bam, reader_choice

    path = _fixture_path()
    choice = reader or reader_choice()
    key = (id(spark), path, split_size, columns, choice)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = read_bam(spark, path, split_size=split_size, columns=columns, reader=choice)
    _PLAN_CACHE[key] = df
    return df


@register(
    "bam_scan_reads",
    doc="S3 loadBam: splittable parallel BAM scan",
    headline=True,
    oracle=f"""
    SELECT qname, flag, rname, pos, mapq, cigar, block_pos, "offset" AS offset
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_scan_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _reads(spark, columns="qname,flag,rname,pos,mapq,cigar,block_pos,offset")


@register(
    "bam_byte_range_scan",
    doc="P3 byte-range split filter: the ranges grammar prunes byte windows before planning",
    oracle=f"""
    SELECT qname, rname, pos, block_pos
    FROM read_parquet('{_TRUTH_PQ}')
    WHERE block_pos < 32768 OR (block_pos >= 98304 AND block_pos < 131072)
    """,
)
def bam_byte_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 under driver-hash evidence (previously pytest-only): the CLI
    ByteRanges grammar (``0-32k,96k-128k`` — k/m/g suffixes, open ends)
    restricts the scan to byte windows BEFORE planning, so only splits
    intersecting a range are ever created.  With split_size 16384 the
    split boundaries align with the range bounds, the kept splits tile
    the ranges exactly, and the split-ownership rule (a record belongs
    to the split containing its start) makes the emitted set precisely
    the records whose containing-block start (block_pos) falls inside a
    range — which is the derived oracle over the generator's truth
    parquet.  (Reference: ByteRanges argument threaded through
    compute-splits/check-bam, cli/.../ByteRanges.scala behavior.)"""
    from spark_bam_spark.bam.reader import read_bam

    return read_bam(
        spark,
        _fixture_path(),
        split_size=16384,
        columns="qname,rname,pos,block_pos",
        ranges="0-32k,96k-128k",
    )


# P8/P9 probe grid: a coarse stride across the whole fixture plus a
# prime-step fine grid over the first 50 KiB so probes land mid-block,
# mid-record, and exactly on block starts.  Static constants (the fixture
# bytes are frozen — the committed truth parquet pins them), baked into
# both the engine call and the oracle SQL below.
_PROBE_GRID: tuple[int, ...] = tuple(
    sorted(set(range(0, 360001, 1500)) | set(range(1, 50000, 257)))
)
_PROBES_SQL = ", ".join(f"({p})" for p in _PROBE_GRID)


@register(
    "bam_find_starts",
    doc="P8 FindBlockStart + P9 FindRecordStart: sync from arbitrary byte offsets",
    oracle=f"""
    WITH probes(probe) AS (VALUES {_PROBES_SQL}),
    nb AS (
      SELECT p.probe,
             (SELECT min(b.start) FROM read_parquet('{_BLOCKS_PQ}') b
              WHERE b.start >= p.probe) AS block_start
      FROM probes p
    )
    SELECT CAST(nb.probe AS BIGINT) AS probe,
           nb.block_start,
           r.block_pos AS rec_block_pos,
           r."offset" AS rec_offset
    FROM nb, LATERAL (
      SELECT t.block_pos, t."offset"
      FROM read_parquet('{_TRUTH_PQ}') t
      WHERE t.block_pos >= nb.block_start
      ORDER BY t.block_pos, t."offset"
      LIMIT 1
    ) r
    """,
)
def bam_find_starts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P9 under driver-hash evidence (previously pytest-only): for
    each probe byte offset, the engine scans forward for the next offset
    where consecutive BGZF headers chain (FindBlockStart.scala:8-37) and
    then for the first uncompressed offset where the eager record
    checker passes (FindRecordStart.scala:30-63) — the exact composition
    every split boundary resolution runs.  The derived oracle recomputes
    both answers relationally from the generator sidecars: the next
    block start is MIN(start ≥ probe) over the blocks table, and the
    record start is the (block_pos, offset)-minimal truth record at or
    after that block (since r14 the engine's candidate walk recomputes
    its horizon from the live window length, so the window's own growth
    under ``ensure`` carries the search to ``max_search``/EOF and both
    sides answer the same question up to that 100 MB bound — r13 ADVICE;
    previously the walk stopped at the pre-ensured 256 KiB window, a
    divergence unreachable on this fixture).  A hash match pins that the
    byte-level sync primitives agree with set-level relational semantics
    at ~440 adversarial offsets (mid-block, mid-record, exact block
    starts)."""
    from spark_bam_spark.operators.qa import find_starts

    return find_starts(spark, _fixture_path(), list(_PROBE_GRID))


@register(
    "bam_index_blocks_sink",
    doc="S16 index-blocks sink: distributed block-metadata sidecar, written then read back",
    oracle=f"""
    SELECT start, compressed_size, uncompressed_size
    FROM read_parquet('{_BLOCKS_PQ}')
    """,
)
def bam_index_blocks_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 under driver-hash evidence (previously pytest-only): run the
    distributed index-blocks sink (IndexBlocks.scala:10-50 — one CSV
    part per partition, not the reference's single-node loop), then read
    the sidecar back and hash it against the generator's own blocks
    parquet.  Pins the whole write→read round trip, not just the scan.
    Per-call scratch dir (never a fixed /tmp path): concurrent sessions
    sharing one dir would race on overwrite/rescan."""
    from spark_bam_spark.operators.qa import index_blocks

    out = _fresh_rewrite_dir()
    index_blocks(spark, _fixture_path(), out)
    return spark.read.csv(
        out, schema="start long, compressed_size long, uncompressed_size long"
    )


@register(
    "bam_index_records_sink",
    doc="S17 index-records sink: record virtual-position sidecar, written then read back",
    oracle=f"""
    SELECT block_pos, "offset" AS offset
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_index_records_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17 under driver-hash evidence (previously pytest-only): write
    every record's virtual position (block_pos, offset) through the
    distributed index-records sink (IndexRecords.scala:13-178), read the
    sidecar back, and hash against the truth parquet's positions.
    Per-call scratch dir, same rationale as bam_index_blocks_sink."""
    from spark_bam_spark.operators.qa import index_records

    out = _fresh_rewrite_dir()
    index_records(_reads(spark, columns="block_pos,offset"), out)
    return spark.read.csv(out, schema="block_pos long, offset int")


# S8/S11 probe intervals: (ref_idx, rname, beg, end) — ref_idx for the
# engine's query_chunks, rname for the oracle's truth join (header order
# '1','2','3').  Chosen to cross 16 KiB linear windows, hit single bases,
# whole contigs, sparse gaps, and the region past the last placed record.
#
# CONSTRAINT (r13 ADVICE): the oracle derives each record's chunk-end
# voffset as lead(v0) over file order, which is NULL for the file's LAST
# record — the truth parquet stores only record-start voffsets, and the
# writer's true final chunk end (the last record's own end voffset inside
# the final data block) is not derivable from the sidecars.  An interval
# whose candidate island consists of ONLY the last record would therefore
# get a NULL cend oracle-side and be dropped by the `c.cend > i.min_off`
# guard while the engine emits it.  Every interval below selects islands
# that include at least one non-final record; keep that property when
# adding intervals (or extend the truth sidecar with record-end voffsets
# first).
_BAI_INTERVALS: tuple[tuple[int, str, int, int], ...] = (
    (0, "1", 0, 16384),
    (0, "1", 3511, 3608),
    (0, "1", 500000, 540000),
    (0, "1", 0, 249_250_621),
    (0, "1", 2_000_000, 2_100_000),
    (1, "2", 2060, 2061),
    (1, "2", 1_000_000, 1_016_384),
    (2, "3", 0, 8192),
    (2, "3", 150_000, 150_001),
    (2, "3", 1_999_581, 1_999_659),
)
_BAI_INTERVALS_SQL = ", ".join(
    f"({iid}, '{rname}', {beg}, {end})"
    for iid, (_, rname, beg, end) in enumerate(_BAI_INTERVALS, 1)
)


@register(
    "bai_query_chunks",
    doc="S8 getIntervalChunks + S11 BAI reader: interval → merged chunk list from the index",
    oracle=f"""
    WITH file_order AS (
      SELECT rname, pos, end_pos,
             (block_pos << 16) + "offset" AS v0,
             row_number() OVER (ORDER BY block_pos, "offset") AS rn
      FROM read_parquet('{_TRUTH_PQ}')
    ),
    seq AS (
      SELECT *, lead(v0) OVER (ORDER BY rn) AS v1 FROM file_order
    ),
    binned AS (
      SELECT rname, pos, greatest(end_pos, pos + 1) AS gend, v0, v1, rn,
             CASE
               WHEN (pos >> 14) = ((greatest(end_pos, pos + 1) - 1) >> 14)
                 THEN 4681 + (pos >> 14)
               WHEN (pos >> 17) = ((greatest(end_pos, pos + 1) - 1) >> 17)
                 THEN 585 + (pos >> 17)
               WHEN (pos >> 20) = ((greatest(end_pos, pos + 1) - 1) >> 20)
                 THEN 73 + (pos >> 20)
               WHEN (pos >> 23) = ((greatest(end_pos, pos + 1) - 1) >> 23)
                 THEN 9 + (pos >> 23)
               WHEN (pos >> 26) = ((greatest(end_pos, pos + 1) - 1) >> 26)
                 THEN 1 + (pos >> 26)
               ELSE 0
             END AS bin
      FROM seq
      WHERE pos >= 0
    ),
    chunks AS (
      SELECT rname, bin, min(v0) AS cstart, max(v1) AS cend
      FROM (
        SELECT *, rn - row_number() OVER (PARTITION BY rname, bin ORDER BY rn) AS isl
        FROM binned
      )
      GROUP BY rname, bin, isl
    ),
    intervals(iid, rname, beg, iend) AS (VALUES {_BAI_INTERVALS_SQL}),
    ivl AS (
      SELECT i.*,
             COALESCE((SELECT min(p.v0) FROM binned p
                       WHERE p.rname = i.rname
                         AND (p.pos >> 14) <= (i.beg >> 14)
                         AND ((p.gend - 1) >> 14) >= (i.beg >> 14)), 0) AS min_off
      FROM intervals i
    ),
    cand AS (
      SELECT i.iid, c.cstart, c.cend
      FROM ivl i JOIN chunks c ON c.rname = i.rname
      WHERE (c.bin = 0
        OR c.bin BETWEEN 1 + (i.beg >> 26) AND 1 + ((i.iend - 1) >> 26)
        OR c.bin BETWEEN 9 + (i.beg >> 23) AND 9 + ((i.iend - 1) >> 23)
        OR c.bin BETWEEN 73 + (i.beg >> 20) AND 73 + ((i.iend - 1) >> 20)
        OR c.bin BETWEEN 585 + (i.beg >> 17) AND 585 + ((i.iend - 1) >> 17)
        OR c.bin BETWEEN 4681 + (i.beg >> 14) AND 4681 + ((i.iend - 1) >> 14))
      AND (c.cend > i.min_off OR i.min_off = 0)
    ),
    ord AS (
      SELECT iid, cstart, cend,
             max(cend) OVER (PARTITION BY iid ORDER BY cstart, cend
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM cand
    ),
    isl AS (
      SELECT iid, cstart, cend,
             sum(CASE WHEN pmax IS NULL OR cstart > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY iid ORDER BY cstart, cend) AS island
      FROM ord
    )
    SELECT CAST(iid AS INTEGER) AS iid,
           min(cstart) AS chunk_start,
           max(cend) AS chunk_end
    FROM isl
    GROUP BY iid, island
    """,
)
def bai_query_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+S11 under driver-hash evidence (previously pytest-only): parse
    the fixture's spec §5.2 BAI sidecar (Read.scala:14-114) and plan
    chunk lists for 10 probe intervals (getIntevalChunks,
    Intervals.scala:171-207) — overlapping bins' chunks, floored by the
    16 KiB linear index, sorted and merged.  The derived oracle rebuilds
    the ENTIRE pipeline relationally from the truth parquet alone: spec
    §5.3 reg2bin as a CASE over coordinate shifts, chunk construction as
    gaps-and-islands over file order (adjacent-merge ⟺ consecutive
    global row numbers, because each record's end voffset is the next
    record's start), reg2bins membership as per-level BETWEEN windows,
    the linear-index floor as MIN(v0) over records covering the
    interval's first window, and cross-bin merging as a running-max
    island scan.  A hash match pins writer → binary index → parser →
    query planner end-to-end against pure relational semantics."""
    from spark_bam_spark.bam.bai import parse_bai, query_chunks

    idx = parse_bai(_fixture_path() + ".bai")
    rows = []
    for iid, (ref_idx, _rname, beg, end) in enumerate(_BAI_INTERVALS, 1):
        for c in query_chunks(idx, ref_idx, beg, end):
            rows.append((iid, c.start, c.end))
    return spark.createDataFrame(rows, "iid int, chunk_start long, chunk_end long")


@register(
    "bam_metadata_stream",
    doc="S13 MetadataStream: header-only block walk, payloads never inflated",
    oracle=f"""
    SELECT start, compressed_size, uncompressed_size
    FROM read_parquet('{_BLOCKS_PQ}')
    """,
)
def bam_metadata_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 under driver-hash evidence (previously pytest-only): the
    header-only block walk (MetadataStream.scala:16-57 — seek to each
    BSIZE, read the ISIZE footer, never inflate) run as a distributed
    task per file, hashed against the generator's blocks parquet.  The
    blocks DataSource (S9) re-implements this walk split-parallel; this
    query pins the sequential primitive itself."""
    import pandas as pd

    paths = spark.createDataFrame([(_fixture_path(),)], "path string")

    def gen(batches):
        from spark_bam_spark.bam import bgzf

        for pdf in batches:
            for p in pdf["path"]:
                with open(p, "rb") as f:
                    ms = list(bgzf.metadata_stream(f))
                yield pd.DataFrame(
                    {
                        "start": pd.Series([m.start for m in ms], dtype="int64"),
                        "compressed_size": pd.Series(
                            [m.compressed_size for m in ms], dtype="int64"
                        ),
                        "uncompressed_size": pd.Series(
                            [m.uncompressed_size for m in ms], dtype="int64"
                        ),
                    }
                )

    return paths.mapInPandas(
        gen, schema="start long, compressed_size long, uncompressed_size long"
    )


_PACK_CAP = 16384  # split_size 49152 / EstimatedCompressionRatio 3.0


@register(
    "bam_pack_ranges",
    doc="O4 cappedCostGroups: cost-capped bin-packing incl. merge + oversize-cut branches",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT start AS lo, start + compressed_size AS hi,
             compressed_size AS cs,
             row_number() OVER (ORDER BY start) - 1 AS brn
      FROM read_parquet('{_BLOCKS_PQ}')
    ),
    input AS (
      SELECT lo, hi FROM b WHERE brn % 3 = 0
      UNION ALL
      SELECT a.lo + a.cs // 2 AS lo, n.hi AS hi
      FROM b a JOIN b n ON n.brn = a.brn + 1
      WHERE a.brn % 21 = 0
      UNION ALL
      SELECT a.lo, n.hi FROM b a JOIN b n ON a.brn = 60 AND n.brn = 79
    ),
    seq AS (
      SELECT lo, hi,
             max(hi) OVER (ORDER BY lo, hi
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM input
    ),
    tagged AS (
      SELECT lo, hi,
             sum(CASE WHEN pmax IS NULL OR lo > pmax THEN 1 ELSE 0 END)
               OVER (ORDER BY lo, hi ROWS UNBOUNDED PRECEDING) AS iid
      FROM seq
    ),
    islands AS (SELECT iid, min(lo) AS lo, max(hi) AS hi FROM tagged GROUP BY iid),
    cuts AS (
      SELECT lo + k * {_PACK_CAP} AS lo,
             lo + (k + 1) * {_PACK_CAP} AS hi,
             1 AS solo
      FROM (SELECT lo, hi, unnest(range((hi - lo - 1) // {_PACK_CAP})) AS k
            FROM islands)
    ),
    rem AS (
      SELECT i.lo + ((i.hi - i.lo - 1) // {_PACK_CAP}) * {_PACK_CAP} AS lo,
             i.hi AS hi, 0 AS solo
      FROM islands i
      WHERE i.lo + ((i.hi - i.lo - 1) // {_PACK_CAP}) * {_PACK_CAP} < i.hi
    ),
    items AS (
      SELECT lo, hi, solo, row_number() OVER (ORDER BY lo, hi) AS rn
      FROM (SELECT * FROM cuts UNION ALL SELECT * FROM rem)
    ),
    packed AS (
      SELECT rn, lo, hi, solo, 1 AS gid,
             CASE WHEN solo = 1 THEN 0 ELSE hi - lo END AS open_cost
      FROM items WHERE rn = 1
      UNION ALL
      SELECT u.rn, u.lo, u.hi, u.solo,
             CASE
               WHEN u.solo = 1 THEN p.gid + 1
               WHEN p.open_cost > 0
                    AND p.open_cost + (u.hi - u.lo) <= {_PACK_CAP} THEN p.gid
               ELSE p.gid + 1
             END AS gid,
             CASE
               WHEN u.solo = 1 THEN 0
               WHEN p.open_cost > 0
                    AND p.open_cost + (u.hi - u.lo) <= {_PACK_CAP}
                 THEN p.open_cost + (u.hi - u.lo)
               ELSE u.hi - u.lo
             END AS open_cost
      FROM packed p JOIN items u ON u.rn = p.rn + 1
    )
    SELECT gid,
           CAST(count(*) AS BIGINT) AS n_ranges,
           CAST(sum(hi - lo) AS BIGINT) AS total_bytes,
           min(lo) AS min_lo,
           max(hi) AS max_hi,
           CAST((SELECT count(*) FROM input) - (SELECT count(*) FROM islands)
                AS BIGINT) AS n_merges,
           CAST((SELECT count(*) FROM cuts) AS BIGINT) AS n_cuts
    FROM packed
    GROUP BY gid
    """,
)
def bam_pack_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 under driver-hash evidence, ALL branches (r13 VERDICT order
    #4): the greedy cost-capped grouping the indexed scan uses to pack
    candidate byte ranges into volume-balanced partitions
    (cappedCostGroups, Intervals.scala:110-117; overlap pre-merge and
    oversize cap-cutting included).  Input, derived identically on both
    sides from the frozen blocks sidecar: every 3rd block's compressed
    span (the pack path), PLUS an overlapping extender starting mid-block
    at every 21st block (reaches into the next block's span — forces the
    merge branch 13 times), PLUS one 20-block oversize range over blocks
    60-79 (~58 KB against the 16384-byte compressed cap — forces the cut
    branch 3 times, leaving an ~8.9 KB remainder that re-enters packing).
    The derived oracle re-implements merge (running-max island
    detection), cut (cap-strided piece expansion), and the greedy pack
    walk (recursive CTE with flush-before-solo semantics) independently
    in DuckDB SQL, so group boundaries, per-group range counts, byte
    totals, extents, and the global merge/cut event counts must all
    agree.  The n_merges/n_cuts columns ride on every row so the driver
    hash itself proves both branches executed (>=1 each); the query also
    asserts engine-side that pack_ranges emitted exactly n_cuts solo
    cap-sized groups."""
    from spark_bam_spark.bam import bgzf
    from spark_bam_spark.bam.datasource import pack_ranges

    with open(_fixture_path(), "rb") as f:
        metas = list(bgzf.metadata_stream(f))
    lo = [m.start for m in metas]
    hi = [m.start + m.compressed_size for m in metas]
    cs = [m.compressed_size for m in metas]
    ranges = [(lo[i], hi[i]) for i in range(len(metas)) if i % 3 == 0]
    ranges += [
        (lo[i] + cs[i] // 2, hi[i + 1]) for i in range(0, len(metas) - 1, 21)
    ]
    ranges.append((lo[60], hi[79]))
    groups = pack_ranges(ranges, split_size=49152, compression_ratio=3.0)
    # Branch-coverage accounting (hashed as constant columns): replay the
    # documented merge spec to count islands, derive the cut count from
    # island spans, and REQUIRE that pack_ranges' own output contains
    # exactly that many solo cap-sized groups — if either branch were
    # skipped, the assert (and the driver hash) fails.  Frozen-fixture
    # constraint: `cut_groups == n_cuts` assumes no merged island's span
    # is an EXACT multiple of _PACK_CAP — such an island's remainder
    # piece would itself be cap-sized and pack as one more solo cap group
    # than the cut count.  Unreachable on the frozen blocks sidecar (and
    # the genv marker pins that); if the fixture ever regenerates onto
    # that edge, this assert fires loudly rather than hashing wrong.
    merged: list[list[int]] = []
    for l, h in sorted(ranges):
        if merged and l <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], h)
        elif h > l:
            merged.append([l, h])
    n_merges = len(ranges) - len(merged)
    n_cuts = sum((h - l - 1) // _PACK_CAP for l, h in merged)
    cut_groups = sum(
        1 for g in groups if len(g) == 1 and g[0][1] - g[0][0] == _PACK_CAP
    )
    if not (n_merges >= 1 and n_cuts >= 1 and cut_groups == n_cuts):
        raise AssertionError(
            f"pack_ranges branch coverage broken: merges={n_merges}, "
            f"cuts={n_cuts}, solo cap groups={cut_groups}"
        )
    rows = [(gid, lo_, hi_) for gid, grp in enumerate(groups, 1) for lo_, hi_ in grp]
    return (
        spark.createDataFrame(rows, "gid int, lo long, hi long")
        .groupBy("gid")
        .agg(
            F.count("*").alias("n_ranges"),
            F.sum(F.col("hi") - F.col("lo")).alias("total_bytes"),
            F.min("lo").alias("min_lo"),
            F.max("hi").alias("max_hi"),
        )
        .withColumn("n_merges", F.lit(n_merges).cast("long"))
        .withColumn("n_cuts", F.lit(n_cuts).cast("long"))
    )


@register(
    "bam_reads_dispatch",
    doc="S1 loadReads dispatch: same records through the .sam and .bam paths, unioned",
    oracle=f"""
    SELECT rname,
           CAST(2 * count(*) AS BIGINT) AS n_reads,
           CAST(2 * sum(flag) AS BIGINT) AS sum_flag,
           CAST(2 * sum(pos) AS BIGINT) AS sum_pos
    FROM read_parquet('{_TRUTH_PQ}')
    GROUP BY rname
    """,
)
def bam_reads_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 under driver-hash evidence (previously pytest-only): the
    extension dispatcher (CanLoadBam.scala:249-283) routes the SAME 2500
    logical records through BOTH decode paths — the text SAM scan and
    the binary BAM scan — and the union is hashed against exactly 2× the
    truth parquet per contig.  A dispatch bug (wrong path, dropped or
    double-routed extension) or any cross-format decode divergence in
    flag/pos/rname breaks the hash."""
    from spark_bam_spark.bam.sam import load_reads

    cols = ["qname", "flag", "rname", "pos"]
    bam = load_reads(spark, _fixture_path()).select(*cols)
    sam = load_reads(spark, _sam_fixture_path()).select(*cols)
    return (
        bam.unionByName(sam)
        .groupBy("rname")
        .agg(
            F.count("*").alias("n_reads"),
            F.sum("flag").cast("long").alias("sum_flag"),
            F.sum("pos").cast("long").alias("sum_pos"),
        )
    )


@register(
    "bam_sorted_layout",
    doc="W3+O5 sortedRepartition: disjoint ordered per-partition key ranges, verified",
    oracle="""
    SELECT CAST(2500 AS BIGINT) AS total_rows,
           CAST(0 AS BIGINT) AS range_overlaps,
           CAST(0 AS BIGINT) AS sort_violations
    """,
    oracle_kind="invariant",
)
def bam_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+O5 under driver evidence (previously pytest-only): range-
    repartition the fixture reads by Pos (IndexedRecordPositions.scala:
    27-31) and VERIFY the layout contract the indexed checker's
    per-partition sorted structure relies on — every partition holds a
    disjoint key range (range_overlaps = 0 across partition [min,max]
    extents) and rows arrive sorted within each partition
    (sort_violations = 0), with no row lost (total_rows = 2500).
    Invariant-grade oracle: the partition BOUNDS come from Spark's range
    sampler and are not derivable relationally, but the contract is
    deterministic and fully checked engine-side.  The final unpartitioned
    window/agg runs over AT MOST 8 rows (one per partition, after the
    mapInPandas reduction) — the data itself is never single-partitioned."""
    import pandas as pd

    from spark_bam_spark.operators.qa import sorted_range_repartition

    df = sorted_range_repartition(_reads(spark, columns="block_pos,offset"), n=8)

    def per_partition(batches):
        import numpy as np

        n = 0
        viol = 0
        mn = None
        mx = None
        prev = None
        for pdf in batches:
            if not len(pdf):
                continue
            k = (pdf["block_pos"].to_numpy(np.int64) << 16) | pdf[
                "offset"
            ].to_numpy(np.int64)
            n += len(k)
            viol += int((np.diff(k) < 0).sum())
            if prev is not None and k[0] < prev:
                viol += 1
            prev = int(k[-1])
            lo, hi = int(k.min()), int(k.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        yield pd.DataFrame(
            {
                "n": pd.Series([n], dtype="int64"),
                "min_key": pd.Series([-1 if mn is None else mn], dtype="int64"),
                "max_key": pd.Series([-1 if mx is None else mx], dtype="int64"),
                "viol": pd.Series([viol], dtype="int64"),
            }
        )

    from pyspark.sql import Window

    per = df.mapInPandas(
        per_partition, schema="n long, min_key long, max_key long, viol long"
    ).filter(F.col("n") > 0)
    w = Window.orderBy("min_key")
    return (
        per.withColumn("prev_max", F.lag("max_key").over(w))
        .agg(
            F.sum("n").alias("total_rows"),
            F.sum(
                F.when(F.col("prev_max") >= F.col("min_key"), 1).otherwise(0)
            ).cast("long").alias("range_overlaps"),
            F.sum("viol").alias("sort_violations"),
        )
    )


@register(
    "bam_scan_reads_jvm",
    doc="S3 loadBam via the JVM DataSourceV2 twin: split-parallel scan, no Python boundary",
    oracle=f"""
    SELECT qname, flag, rname, pos, end_pos, mapq, cigar, tlen, block_pos, "offset" AS offset
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_scan_reads_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same scan contract as bam_scan_reads, executed by the
    JVM-native DataSourceV2 reader (bam/jvmsrc/bamjvm/) instead of the
    Python Data Source: identical schema, split-ownership rule, and
    record-boundary checker, but the BGZF inflate + record decode run
    compiled inside the executor JVM — the execution shape the reference
    uses (load/.../CanLoadBam.scala runs its codec JVM-side).  Measured
    at 20M records on local[32]: 9.1M reads/s full-width vs 3.4M for the
    Python source (tools/run_jvm_ab.py).  The 16 KiB split size forces
    ~23 cross-block re-syncs on the 2500-record fixture, so the checker
    path is part of what the oracle hash pins; the projection covers the
    cigar-derived end_pos and both virtual-position columns."""
    from spark_bam_spark.bam.jvmreader import read_bam_jvm

    return read_bam_jvm(spark, _fixture_path(), split_size=16384).select(
        "qname", "flag", "rname", "pos", "end_pos", "mapq", "cigar", "tlen",
        "block_pos", "offset",
    )


@register(
    "bam_scan_reads_py",
    doc="S3 loadBam via the Python Data Source (pinned): the fallback/differential-oracle path",
    oracle=f"""
    SELECT qname, flag, rname, pos, mapq, cigar, block_pos, "offset" AS offset
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_scan_reads_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as bam_scan_reads, with the reader PINNED to the
    Python Data Source.  Since r9 the default read path is the JVM DSv2
    reader (bam/reader.py), so bam_scan_reads now exercises the JVM path
    on machines with a JDK; this twin keeps the Python source — the
    no-JDK fallback and the differential oracle for the JVM decoder —
    under driver-grade hash evidence every round."""
    return _reads(
        spark, columns="qname,flag,rname,pos,mapq,cigar,block_pos,offset", reader="py"
    )


@register(
    "bam_interval_pushdown",
    doc="S7 loadBamIntervals: indexed interval scan via zone-map pushdown",
    oracle=f"""
    SELECT qname, rname, pos, end_pos FROM read_parquet('{_TRUTH_PQ}')
    WHERE rname = '1' AND pos >= 13000 AND pos < 1000000
    """,
)
def bam_interval_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _reads(spark, split_size=16384, columns="qname,rname,pos,end_pos")
        .filter((F.col("rname") == "1") & (F.col("pos") >= 13000) & (F.col("pos") < 1_000_000))
    )


@register(
    "bam_interval_pushdown_jvm",
    doc="S7 loadBamIntervals on the JVM twin: BAI-pruned indexed scan",
    oracle=f"""
    SELECT qname, rname, pos, end_pos FROM read_parquet('{_TRUTH_PQ}')
    WHERE rname = '1' AND pos >= 13000 AND pos < 1000000
    """,
)
def bam_interval_pushdown_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same indexed-interval contract as bam_interval_pushdown,
    planned by the JVM reader: SupportsPushDownFilters absorbs the
    rname/pos predicate, the BAI chunk lookup (Bai.java, preferred over
    the .zones fallback) prunes candidate blocks, and surviving ranges
    are cost-packed into multi-range splits.  The driver hash pins the
    whole JVM indexed path — pushdown, BAI parse, chunk query, range
    walk — against the committed truth parquet; with this plus
    bam_scan_reads_jvm, both read paths of the r9 default flip carry
    driver-grade evidence."""
    from spark_bam_spark.bam.jvmreader import read_bam_jvm

    df = read_bam_jvm(spark, _fixture_path(), split_size=16384)
    return df.filter(
        (F.col("rname") == "1") & (F.col("pos") >= 13000) & (F.col("pos") < 1_000_000)
    ).select("qname", "rname", "pos", "end_pos")


@register(
    "bam_interval_pushdown_py",
    doc="S7 loadBamIntervals on the pinned Python source: zone-map/BAI pushdown fallback path",
    oracle=f"""
    SELECT qname, rname, pos, end_pos FROM read_parquet('{_TRUTH_PQ}')
    WHERE rname = '1' AND pos >= 13000 AND pos < 1000000
    """,
)
def bam_interval_pushdown_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bam_interval_pushdown with the reader PINNED to the Python Data
    Source (see bam_scan_reads_py): keeps the Python pushdown → BAI/zone
    pruning → packed-range walk under driver hash evidence now that the
    default path is the JVM reader."""
    return (
        _reads(spark, split_size=16384, columns="qname,rname,pos,end_pos", reader="py")
        .filter((F.col("rname") == "1") & (F.col("pos") >= 13000) & (F.col("pos") < 1_000_000))
    )


@register(
    "bam_blocks_metadata",
    doc="S9 Blocks(): parallel BGZF block discovery",
    oracle=f"SELECT start, compressed_size, uncompressed_size FROM read_parquet('{_BLOCKS_PQ}')",
)
def bam_blocks_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned to the PYTHON blocks source: since r9 the QA pipelines'
    default block discovery is the JVM BlocksSource (bam_blocks_metadata_jvm
    pins that path), so this query keeps the fallback implementation
    under driver hash evidence — same pattern as bam_scan_reads_py."""
    from spark_bam_spark.operators.qa import _blocks_df

    return _blocks_df(spark, _fixture_path(), reader="py").select(
        "start", "compressed_size", "uncompressed_size"
    )


@register(
    "bam_blocks_metadata_jvm",
    doc="S9 Blocks() on the JVM BlocksSource: header-only parallel block discovery",
    oracle=f"SELECT start, compressed_size, uncompressed_size FROM read_parquet('{_BLOCKS_PQ}')",
)
def bam_blocks_metadata_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 via bamjvm.BlocksSource (Blocks.scala:47-208 as behavior):
    positioned header reads only — 18-byte BGZF header + 4-byte ISIZE
    footer per block, no inflater, no Python worker boundary — with the
    record reader's planning conventions (adaptive splits, byte-ranges,
    locality hints, session Hadoop conf).  Since r9 this is the DEFAULT
    block-discovery path for every QA pipeline via operators/qa._blocks_df;
    the sidecar oracle hash pins it block-for-block."""
    from spark_bam_spark.operators.qa import _blocks_df

    return _blocks_df(spark, _fixture_path(), reader="jvm").select(
        "start", "compressed_size", "uncompressed_size"
    )


@register(
    "bam_check_confusion",
    doc="check-bam: per-position differential confusion matrix",
    oracle=f"""
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rec FROM read_parquet('{_TRUTH_PQ}')),
    b AS (SELECT CAST(SUM(uncompressed_size) AS BIGINT) AS total FROM read_parquet('{_BLOCKS_PQ}'))
    SELECT FALSE AS eager_call, FALSE AS oracle_call, b.total - t.n_rec AS n FROM t, b
    UNION ALL
    SELECT TRUE, TRUE, t.n_rec FROM t
    """,
)
def bam_check_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is DERIVED from the generator sidecars, not dumped: the
    swept position count is SUM(block uncompressed sizes) and the true
    record starts are the truth parquet's COUNT, so the two expected
    cells are (TT, n_records) and (FF, total - n_records) — any checker
    false positive/negative surfaces as an extra (TF)/(FT) row and fails
    the driver's row-count/hash compare."""
    from spark_bam_spark.operators import qa

    # stride=1: EVERY uncompressed position, the reference's core
    # differential claim — affordable since the sweep is vectorized
    return qa.confusion_matrix(qa.calls(spark, _fixture_path(), stride=1))


@register(
    "bam_compute_splits",
    doc="compute-splits: partition-first positions + lead() ranges",
    oracle=f"""
    WITH ks AS (SELECT unnest(generate_series(0,
                  CAST((SELECT MAX(start) FROM read_parquet('{_BLOCKS_PQ}')) / 16384 AS BIGINT))) AS k),
    b0 AS (SELECT DISTINCT (SELECT MIN(start) FROM read_parquet('{_BLOCKS_PQ}') b
                            WHERE b.start >= ks.k * 16384) AS b0
           FROM ks),
    sp AS (SELECT DISTINCT (SELECT MIN(struct_pack(bp := block_pos, o := "offset"))
                            FROM read_parquet('{_TRUTH_PQ}') r
                            WHERE r.block_pos >= b0.b0) AS s
           FROM b0 WHERE b0 IS NOT NULL)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY s.bp, s.o) - 1 AS INT) AS pid,
           s.bp AS block_pos, s.o AS offset,
           LEAD(s.bp) OVER (ORDER BY s.bp, s.o) AS end_block_pos,
           LEAD(s.o) OVER (ORDER BY s.bp, s.o) AS end_offset
    FROM sp WHERE s IS NOT NULL
    """,
)
def bam_compute_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle re-derives the planner's split choice from the
    generator sidecars alone: for each split_size (16384) boundary, the
    first block at-or-after it, then the first record starting at-or-
    after that block — the same arithmetic the datasource planner and
    FindRecordStart implement over the actual BGZF bytes."""
    from spark_bam_spark.operators import qa

    return qa.splits_from_partitions(_reads(spark, split_size=16384))


@register(
    "bam_check_blocks",
    doc="check-blocks: first-read offset per block + prev-size attribution",
    oracle=f"""
    WITH firsts AS (
      SELECT block_pos, MIN("offset") AS first_read_offset
      FROM read_parquet('{_TRUTH_PQ}') GROUP BY block_pos
    ),
    bp AS (
      SELECT start, compressed_size, uncompressed_size,
             LAG(compressed_size) OVER (ORDER BY start) AS prev_compressed_size
      FROM read_parquet('{_BLOCKS_PQ}')
    )
    SELECT bp.start, bp.compressed_size, bp.uncompressed_size,
           bp.prev_compressed_size, f.first_read_offset
    FROM bp LEFT JOIN firsts f ON f.block_pos = bp.start
    """,
)
def bam_check_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators import qa

    return qa.block_first_reads(spark, _fixture_path())


@register(
    "sam_scan_reads",
    doc="S2 loadSam: declarative SAM text parse (no Python UDF)",
    oracle=f"""
    SELECT qname, flag, rname, pos, end_pos, mapq, cigar, tlen
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def sam_scan_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.bam.sam import load_sam

    return load_sam(spark, _sam_fixture_path()).select(
        "qname", "flag", "rname", "pos", "end_pos", "mapq", "cigar", "tlen"
    )


@register(
    "bam_full_check",
    doc="full-check: 19-flag diagnostic histogram keyed by #failing flags",
    oracle=f"SELECT num_flags, n_positions FROM read_parquet('{_G_FULL_CHECK_PQ}')",
)
def bam_full_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle = INDEPENDENT derivation (r7 upgrade from golden-pin):
    tools/gen_checker_truth.py re-implements the 19-flag evaluation from
    the reference's documented semantics — pure Python over the fixture
    generator's block geometry, importing nothing from bam/checker.py or
    bam/vectorcheck.py — sweeps every uncompressed position, and writes
    the committed parquet the oracle reads.  The engine path (numpy
    prescreen + checker.py confirm over bgzf windows) must agree on all
    ~380k positions for the driver hash to match."""
    from spark_bam_spark.operators import qa

    # unbounded: the vectorized 19-flag sweep covers the whole fixture
    return qa.flags_histogram(spark, _fixture_path())


@register(
    "bam_count_reads",
    doc="count-reads: scan count vs sidecar ground-truth count",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS engine_reads,
           CAST(COUNT(*) AS BIGINT) AS truth_reads,
           TRUE AS match
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_count_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _fixture_path()
    engine = _reads(spark, columns="block_pos,offset").agg(F.count("*").alias("engine_reads"))
    truth = (
        spark.read.csv(path + ".records", schema="block_pos long, offset int")
        .agg(F.count("*").alias("truth_reads"))
    )
    return engine.crossJoin(truth).select(
        "engine_reads", "truth_reads", (F.col("engine_reads") == F.col("truth_reads")).alias("match")
    )


# Per-call scratch dirs for the rewrite round-trip (NOT one fixed path:
# two concurrent sessions — e.g. the driver plus a test run — sharing
# /tmp would race on rmtree/write/rescan and corrupt each other's scan).
# Each call gets a fresh mkdtemp; the previous call's dir is removed so
# repeated sweeps (tests/test_oracle_types.py calls every registry fn)
# don't accumulate, and whatever remains is deleted at interpreter exit.
_REWRITE_DIRS: list[str] = []


def _fresh_rewrite_dir() -> str:
    import atexit
    import shutil
    import tempfile

    if not _REWRITE_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True) for d in _REWRITE_DIRS]
        )
    while _REWRITE_DIRS:
        shutil.rmtree(_REWRITE_DIRS.pop(), ignore_errors=True)
    path = tempfile.mkdtemp(prefix="spark_bam_spark_rewrite_")
    _REWRITE_DIRS.append(path)
    # Spark's DataSource writer wants to create the target dir itself
    return os.path.join(path, "out")


@register(
    "bam_rewrite_roundtrip",
    doc="S18 BAM writer sink: write → rescan → field-level match vs source (HTSJDKRewrite.scala:21-93)",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
           CAST(COUNT(*) AS BIGINT) AS n_rewritten,
           CAST(0 AS BIGINT) AS n_mismatch,
           TRUE AS all_match
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_rewrite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible round-trip for the S18 writer sink: scan the 2500-
    record fixture, write it back through the default (JVM-first) write
    path (different block_payload so the BGZF framing genuinely changes),
    rescan the part-BAMs, and full-outer-join on qname comparing every
    logical field (flag/rname/pos/mapq/cigar/tlen/seq/qual).  The oracle
    derives the expected single row from the generator truth sidecar:
    both counts equal the truth count, zero mismatches.  Any writer or
    reader regression shows up as a mismatch/missing row and breaks the
    hash.  (HTSJDKRewrite.scala:21-93 parity: rewrite-then-compare.)"""
    return _rewrite_roundtrip(spark, sf_dir, writer=None)


def _rewrite_roundtrip(spark: SparkSession, sf_dir: str, writer: str | None) -> DataFrame:
    from spark_bam_spark.bam.reader import read_bam, write_bam_df
    from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES

    src = _reads(spark, split_size=65536)
    rewrite_dir = _fresh_rewrite_dir()
    contigs = ",".join(f"{n}:{ln}" for n, ln in zip(CONTIG_NAMES, CONTIG_LENGTHS))
    write_bam_df(
        src.repartition(4), rewrite_dir, contigs=contigs, block_payload=4096, writer=writer
    )
    # fresh plan on purpose (no _PLAN_CACHE): each call writes to a fresh
    # scratch dir, so the reader must re-list and re-scan it.  The write
    # is necessarily eager (the rescan needs the part-BAMs on disk) —
    # this is the one registry fn that runs a job at build time, which is
    # safe now that the target is per-call unique.
    back = read_bam(spark, rewrite_dir, split_size=16384)
    fields = ["flag", "rname", "pos", "mapq", "cigar", "tlen", "seq", "qual"]
    a = src.select("qname", *fields).alias("a")
    b = back.select("qname", *fields).alias("b")
    joined = a.join(b, on="qname", how="full_outer")
    mismatch = ~(F.col("a.flag").isNotNull() & F.col("b.flag").isNotNull())
    for f in fields:
        mismatch = mismatch | ~F.col(f"a.{f}").eqNullSafe(F.col(f"b.{f}"))
    return joined.agg(
        F.sum(F.col("a.flag").isNotNull().cast("int")).cast("bigint").alias("n_source"),
        F.sum(F.col("b.flag").isNotNull().cast("int")).cast("bigint").alias("n_rewritten"),
        F.sum(mismatch.cast("int")).cast("bigint").alias("n_mismatch"),
        (F.sum(mismatch.cast("int")) == 0).alias("all_match"),
    )


@register(
    "bam_rewrite_roundtrip_jvm",
    doc="S18 writer sink, JVM DSv2 implementation pinned (BamWriteSupport.java)",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
           CAST(COUNT(*) AS BIGINT) AS n_rewritten,
           CAST(0 AS BIGINT) AS n_mismatch,
           TRUE AS all_match
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_rewrite_roundtrip_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip with the JVM DSv2 writer PINNED (errors surface instead
    of being masked by fallback) — keeps the executor-JVM write path under
    driver-grade evidence every round, independent of the default
    dispatch.  Same comparison and oracle as ``bam_rewrite_roundtrip``."""
    return _rewrite_roundtrip(spark, sf_dir, writer="jvm")


@register(
    "bam_rewrite_indexed_pushdown",
    doc="S18+S7 composed: JVM writer emits per-part BAI; rewritten output serves indexed interval scans",
    oracle=f"""
    SELECT qname, rname, pos, end_pos FROM read_parquet('{_TRUTH_PQ}')
    WHERE rname = '1' AND pos >= 13000 AND pos < 1000000
    """,
)
def bam_rewrite_indexed_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side indexing, end to end: rewrite the fixture through the
    JVM sink with ``bai=True`` (the writer owns every record's exact
    virtual offset, so the spec §5.2 index is a running side effect of
    the write — no second pass), then serve an interval query over the
    REWRITTEN directory through BAI-chunk pushdown.  The driver hash pins
    the whole composition — write, per-part index emission, BAI parse,
    chunk pruning, range walk — against the committed truth parquet.  At
    100 TB this is what makes rewritten output immediately queryable by
    interval without a separate indexing job (the reference reads
    BAIs but never emits them from its rewrite sink;
    cli/.../rewrite/HTSJDKRewrite.scala:21-93).  Partitions are
    coordinate-sorted before the write — the spec's contract for BAI,
    enforced loudly by the writer."""
    from spark_bam_spark.bam.reader import read_bam, write_bam_df
    from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES

    src = _reads(spark, split_size=65536)
    rewrite_dir = _fresh_rewrite_dir()
    contigs = ",".join(f"{n}:{ln}" for n, ln in zip(CONTIG_NAMES, CONTIG_LENGTHS))
    write_bam_df(
        src.repartition(4).sortWithinPartitions("ref_idx", "pos"),
        rewrite_dir,
        contigs=contigs,
        block_payload=4096,
        bai=True,
    )
    back = read_bam(spark, rewrite_dir, split_size=16384)
    return back.filter(
        (F.col("rname") == "1") & (F.col("pos") >= 13000) & (F.col("pos") < 1_000_000)
    ).select("qname", "rname", "pos", "end_pos")


@register(
    "bam_sort_rewrite",
    doc="Distributed coordinate sort -> indexed BAM rewrite (the samtools-sort analogue at cluster scale)",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           TRUE AS globally_sorted,
           TRUE AS roundtrip_match
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_sort_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed coordinate sort of a read set into indexed part-BAMs —
    what ``samtools sort`` + ``samtools index`` do on one node, as one
    Spark job: range-partition on (ref_idx, pos) so part files tile the
    genome in order, sort within partitions, write through the JVM sink
    with ``bai=True``.  The input is deliberately de-sorted first
    (repartition by a hash of qname) so the sort genuinely works.  At
    100 TB this is the canonical post-alignment reorganization: the
    range exchange is the single unavoidable shuffle, the per-partition
    sort is spillable, and the output serves indexed interval queries
    immediately (no separate index job).

    The result row re-derives its claims from the REWRITTEN files, not
    the write path: n_records from a fresh scan of the output,
    globally_sorted by checking (ref_idx, pos) monotonicity ACROSS part
    boundaries (max key of part k <= min key of part k+1, and each part
    internally sorted — a window over the scan ordered by file order),
    roundtrip_match as a full-outer anti-join count against the source.
    The oracle derives n_records from the committed truth parquet.
    (Reference scope: spark-bam rewrites via htsjdk but never sorts or
    indexes distributed — HTSJDKRewrite.scala:21-93.)"""
    from pyspark.sql import Window as W

    from spark_bam_spark.bam.reader import read_bam, write_bam_df
    from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES

    src = _reads(spark, split_size=65536)
    rewrite_dir = _fresh_rewrite_dir()
    contigs = ",".join(f"{n}:{ln}" for n, ln in zip(CONTIG_NAMES, CONTIG_LENGTHS))
    # de-sort, then the distributed sort under test: range exchange on the
    # coordinate key + in-partition sort (unplaced reads key as +inf so
    # they land in the last range, the samtools convention)
    shuffled = src.repartition(8, F.crc32(F.col("qname")))
    sort_key = F.when(F.col("ref_idx") < 0, F.lit(1 << 40)).otherwise(
        F.col("ref_idx").cast("long") * (1 << 32) + F.col("pos")
    )
    ordered = shuffled.withColumn("_k", sort_key).repartitionByRange(4, "_k").sortWithinPartitions("_k").drop("_k")
    write_bam_df(ordered, rewrite_dir, contigs=contigs, block_payload=4096, bai=True)

    back = read_bam(spark, rewrite_dir, split_size=1 << 30)  # one split per part: file order
    key = F.when(F.col("ref_idx") < 0, F.lit(1 << 40)).otherwise(
        F.col("ref_idx").cast("long") * (1 << 32) + F.col("pos")
    )
    # one split per part file (huge split_size), so spark_partition_id is
    # the file index in planning (= lexicographic part-NNNNN) order and
    # (block_pos, offset) is the record order within the file
    seq = back.select(
        "qname", key.alias("k"), F.spark_partition_id().alias("f"), "block_pos", "offset"
    )
    w = W.orderBy("f", "block_pos", "offset")
    order_ok = (
        seq.withColumn("prev", F.lag("k").over(w))
        .agg(F.sum(F.when(F.col("prev") > F.col("k"), 1).otherwise(0)).alias("n_bad"))
    )
    both = (
        src.select("qname").alias("a")
        .join(back.select("qname").alias("b"), "qname", "full_outer")
        .agg(
            F.sum(F.col("a.qname").isNull().cast("int")).alias("miss_a"),
            F.sum(F.col("b.qname").isNull().cast("int")).alias("miss_b"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    return both.crossJoin(order_ok).select(
        F.col("n").alias("n_records"),
        (F.col("n_bad") == 0).alias("globally_sorted"),
        ((F.col("miss_a") == 0) & (F.col("miss_b") == 0)).alias("roundtrip_match"),
    )


@register(
    "bam_stream_ingest",
    doc="Structured Streaming BAM landing-directory ingest (availableNow drain), JVM MicroBatchStream",
    oracle=f"""
    SELECT flag, CAST(COUNT(*) * 2 AS BIGINT) AS n_reads
    FROM read_parquet('{_TRUTH_PQ}')
    GROUP BY flag
    """,
)
def bam_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of a BAM landing directory
    (bamjvm.BamMicroBatchStream): two copies of the committed fixture
    land in a scratch dir, ``readStream`` drains them with
    ``trigger(availableNow=True)`` into parquet, and the result is the
    per-flag read histogram over the drained output — hash-matched
    against 2× the truth parquet's histogram, so the oracle pins that
    the stream planned BOTH files through the same splitter/decoder as
    the batch scan with no row lost or duplicated.  Offsets checkpoint
    as a monotonic batch id over a compacted file-metadata log, so a
    restarted query ingests only new files
    (pinned incrementally in tests/test_bam_streaming.py).  The
    reference has no streaming surface; this is the Spark-first
    extension of its batch loadReads (CanLoadBam.scala, behavior
    citation)."""
    import os
    import shutil

    from spark_bam_spark.bam.jvmreader import read_bam_stream

    land = _fresh_rewrite_dir()
    os.makedirs(land, exist_ok=True)  # the rewrite queries let the writer create it
    ckpt = os.path.join(land, "_ckpt")
    out = os.path.join(land, "_out")
    fx = _fixture_path()
    shutil.copy(fx, os.path.join(land, "a.bam"))
    shutil.copy(fx, os.path.join(land, "b.bam"))
    q = (
        read_bam_stream(spark, land, split_size=16384)
        .select("flag")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(out)
        .groupBy("flag")
        .agg(F.count("*").cast("bigint").alias("n_reads"))
    )


@register(
    "bam_stream_ingest_py",
    doc="Streaming landing-dir ingest via the PYTHON stream reader (no-JDK fallback path pinned)",
    oracle=f"""
    SELECT flag, CAST(COUNT(*) * 2 AS BIGINT) AS n_reads
    FROM read_parquet('{_TRUTH_PQ}')
    GROUP BY flag
    """,
)
def bam_stream_ingest_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same landing-dir drain as ``bam_stream_ingest`` with the Python
    streaming source PINNED (datasource.BamStreamReader) — keeps the
    no-JDK fallback's streaming path under driver-grade hash evidence
    every round, the ``bam_scan_reads_py`` / ``bam_rewrite_roundtrip_py``
    pattern applied to §2.9.  Two fixture copies land, the stream drains
    them into parquet, and the per-flag histogram must hash-match 2× the
    truth parquet — pinning that the twin planned both files through the
    same BamReader splitter/decoder with no row lost or duplicated.
    (The Python DS API lacks SupportsTriggerAvailableNow, so the
    availableNow trigger falls back to single-batch execution — same
    drain for a quiescent dir; see BamStreamReader for the documented
    offset-format asymmetry vs the JVM source.)"""
    import os
    import shutil

    from spark_bam_spark.bam.reader import read_bam_stream_py

    land = _fresh_rewrite_dir()
    os.makedirs(land, exist_ok=True)
    ckpt = os.path.join(land, "_ckpt")
    out = os.path.join(land, "_out")
    fx = _fixture_path()
    shutil.copy(fx, os.path.join(land, "a.bam"))
    shutil.copy(fx, os.path.join(land, "b.bam"))
    q = (
        read_bam_stream_py(spark, land, split_size=16384, columns="flag")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(out)
        .groupBy("flag")
        .agg(F.count("*").cast("bigint").alias("n_reads"))
    )


@register(
    "bam_idxstats_from_index",
    doc="samtools idxstats from the BAI metadata pseudo-bin alone — O(index), no data scan",
    oracle=f"""
    SELECT COALESCE(rname, '*') AS rname,
           CAST(SUM(CASE WHEN flag & 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS mapped_reads,
           CAST(SUM(CASE WHEN flag & 4 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS unmapped_reads
    FROM read_parquet('{_TRUTH_PQ}')
    GROUP BY 1
    """,
)
def bam_idxstats_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``samtools idxstats`` economics at cluster scale: per-contig
    mapped/unmapped counts read from the BAI metadata pseudo-bin
    (spec §5.2 bin 37450 — emitted by this engine's writers as of r10)
    plus the trailing no-coordinate count, WITHOUT scanning any data
    bytes.  The pipeline: coordinate-sorted indexed rewrite of the
    fixture into 4 parts (the bam_sort_rewrite shape), then ONE task per
    part .bai parses kilobytes of index and the per-ref counts aggregate
    — at 100 TB this is seconds of index metadata instead of a full
    corpus scan, the exact trade samtools idxstats makes on one node.
    The driver hash pins the whole chain (writer-side stats accumulation,
    binary pseudo-bin encode, parse, aggregation) against the truth
    parquet's per-contig histogram.  (Reference: its check module reads
    BAIs but has no idxstats surface; behavior anchor
    check/.../index/Read.scala:14-114.)"""
    import glob as _glob

    from spark_bam_spark.bam.reader import read_bam, write_bam_df
    from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES

    src = _reads(spark, split_size=65536)
    rewrite_dir = _fresh_rewrite_dir()
    contigs = ",".join(f"{n}:{ln}" for n, ln in zip(CONTIG_NAMES, CONTIG_LENGTHS))
    sort_key = F.when(F.col("ref_idx") < 0, F.lit(1 << 40)).otherwise(
        F.col("ref_idx").cast("long") * (1 << 32) + F.col("pos")
    )
    write_bam_df(
        src.withColumn("_k", sort_key)
        .repartitionByRange(4, "_k")
        .sortWithinPartitions("_k")
        .drop("_k"),
        rewrite_dir,
        contigs=contigs,
        block_payload=4096,
        bai=True,
    )
    bais = sorted(_glob.glob(os.path.join(rewrite_dir, "part-*.bam.bai")))
    names = list(CONTIG_NAMES)

    def parse_parts(batches):
        import pandas as pd

        from spark_bam_spark.bam.bai import idxstats_from_bai, parse_bai

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                per_ref, no_coor = idxstats_from_bai(parse_bai(p))
                for ref_idx, mapped, unmapped in per_ref:
                    rows.append((names[ref_idx], mapped, unmapped))
                rows.append(("*", 0, no_coor))
            yield pd.DataFrame(rows, columns=["rname", "mapped_reads", "unmapped_reads"])

    files_df = spark.createDataFrame([(p,) for p in bais], "path string").repartition(4)
    return (
        files_df.mapInPandas(
            parse_parts, "rname string, mapped_reads long, unmapped_reads long"
        )
        .groupBy("rname")
        .agg(
            F.sum("mapped_reads").cast("bigint").alias("mapped_reads"),
            F.sum("unmapped_reads").cast("bigint").alias("unmapped_reads"),
        )
        .filter((F.col("mapped_reads") + F.col("unmapped_reads")) > 0)
    )


_FLAGSTAT_FIXTURE = "/tmp/spark_bam_spark_fixture/flagstat1k.bam"
_FLAGSTAT_TRUTH_PQ = f"{_FIXTURES_DIR}/flagstat1k_truth.parquet"


# Bump when make_flagstat_fixture / synth_flagstat_records changes so a
# cached /tmp BAM regenerates instead of being silently reused against a
# regenerated truth parquet (same convention as _FIXTURE_GEN_VERSION).
_FLAGSTAT_GEN_VERSION = 1


def _flagstat_fixture_path() -> str:
    marker = f"{_FLAGSTAT_FIXTURE}.genv{_FLAGSTAT_GEN_VERSION}"
    if not (os.path.exists(_FLAGSTAT_FIXTURE) and os.path.exists(marker)):
        os.makedirs(os.path.dirname(_FLAGSTAT_FIXTURE), exist_ok=True)
        from spark_bam_spark.bam.writer import make_flagstat_fixture

        make_flagstat_fixture(_FLAGSTAT_FIXTURE)
        with open(marker, "w"):
            pass
    return _FLAGSTAT_FIXTURE


@register(
    "bam_flagstat",
    doc="A2 flagstat: samtools-flagstat counters in one map-side-combined scan agg",
    oracle=f"""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS total,
      CAST(SUM(CASE WHEN flag & 256 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS secondary,
      CAST(SUM(CASE WHEN flag & 2048 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS supplementary,
      CAST(SUM(CASE WHEN flag & 1024 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS duplicates,
      CAST(SUM(CASE WHEN flag & 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS mapped,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS paired_in_sequencing,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 64 != 0
        THEN 1 ELSE 0 END) AS BIGINT) AS read1,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 128 != 0
        THEN 1 ELSE 0 END) AS BIGINT) AS read2,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 2 != 0
        AND flag & 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS properly_paired,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 4 = 0
        AND flag & 8 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_itself_and_mate_mapped,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 4 = 0
        AND flag & 8 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 4 = 0
        AND flag & 8 = 0 AND mate_ref_idx >= 0 AND mate_ref_idx != ref_idx
        THEN 1 ELSE 0 END) AS BIGINT) AS mate_on_different_chr,
      CAST(SUM(CASE WHEN flag & 2304 = 0 AND flag & 1 != 0 AND flag & 4 = 0
        AND flag & 8 = 0 AND mate_ref_idx >= 0 AND mate_ref_idx != ref_idx
        AND mapq >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS mate_on_different_chr_mapq5
    FROM read_parquet('{_FLAGSTAT_TRUTH_PQ}')
    """,
)
def bam_flagstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/§2.11 ``samtools flagstat`` as a registry-checked aggregate
    (the CLI subcommand melts this same operator,
    operators/qa.flagstat_agg): thirteen flag-derived counters in ONE
    map-side-combined agg over a pruned flag/ref/mapq scan — no shuffle
    of reads at any corpus size.  Runs on the flag-RICH fixture
    (synth_flagstat_records: secondary/supplementary records carrying
    pair bits, cross-contig mates, singletons, duplicates, placed-but-
    unmapped and coordinate-less reads), so samtools' primary-only
    exclusion — which caught a real defect in the r11 self-review — is
    observable in the hashed counters, not just in unit tests.  The
    oracle derives every counter from the generator's own record dump
    (flag & 2304 = secondary|supplementary).  (Reference has flags
    histograms, FullCheck.scala; flagstat itself is samtools parity.)"""
    from spark_bam_spark.bam.reader import read_bam
    from spark_bam_spark.operators.qa import flagstat_agg

    reads = read_bam(
        spark,
        _flagstat_fixture_path(),
        split_size=16384,
        columns="flag,ref_idx,mate_ref_idx,mapq",
    )
    return flagstat_agg(reads)


@register(
    "bam_rewrite_roundtrip_py",
    doc="S18 writer sink, Python Data Source implementation pinned (datasource.py BamWriter)",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
           CAST(COUNT(*) AS BIGINT) AS n_rewritten,
           CAST(0 AS BIGINT) AS n_mismatch,
           TRUE AS all_match
    FROM read_parquet('{_TRUTH_PQ}')
    """,
)
def bam_rewrite_roundtrip_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip with the Python Data Source writer PINNED — keeps the
    no-JDK fallback write path under driver-grade evidence every round now
    that the default routes to the JVM sink (same convention as
    ``bam_scan_reads_py``).  Same comparison and oracle as
    ``bam_rewrite_roundtrip``."""
    return _rewrite_roundtrip(spark, sf_dir, writer="py")


@register(
    "bam_time_load",
    doc="time-load: first read per partition at two split sizes + name anti-joins",
    oracle="SELECT CAST(0 AS BIGINT) AS b_firsts_missing_from_a",
    oracle_kind="invariant",
)
def bam_time_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle = the structural invariant itself: every 64k-partition
    first read must also start a 16k partition (16384 divides 65536, so
    the coarse split boundaries are a subset of the fine ones) — the
    anti-join count is provably 0 whenever split planning is correct,
    and any planner regression makes it positive."""
    from spark_bam_spark.operators import qa

    a = qa.first_reads_per_partition(_reads(spark, split_size=16384, columns="qname,block_pos,offset"))
    b = qa.first_reads_per_partition(_reads(spark, split_size=65536, columns="qname,block_pos,offset"))
    # every 64k-partition first-read must also start a 16k partition
    missing = b.select("qname").join(F.broadcast(a.select("qname")), "qname", "left_anti")
    return missing.agg(F.count("*").alias("b_firsts_missing_from_a"))


@register(
    "bam_check_three_way",
    doc="check-bam -s -u: eager vs upstream-emulating vs ground truth confusion",
    oracle=f"SELECT eager_call, upstream_call, oracle_call, n FROM read_parquet('{_G_THREE_WAY_PQ}')",
)
def bam_check_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle = INDEPENDENT derivation (r7 upgrade from golden-pin):
    tools/gen_checker_truth.py re-implements both the eager and the
    upstream-emulating predicates from the reference's documented
    semantics (no imports from checker.py/vectorcheck.py), sweeps every
    position, and derives this confusion table (61 upstream FPs on this
    fixture) against generator ground truth."""
    from spark_bam_spark.operators import qa

    return qa.three_way_confusion(qa.calls(spark, _fixture_path(), stride=1))


@register(
    "bam_compression_ratio",
    doc="EstimatedCompressionRatio over block metadata (bgzf/.../EstimatedCompressionRatio.scala:13)",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           ROUND(CAST(SUM(uncompressed_size) AS DOUBLE) / SUM(compressed_size), 4)
             AS est_compression_ratio
    FROM read_parquet('{_BLOCKS_PQ}')
    """,
)
def bam_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_bam_spark.operators.qa import _blocks_df

    blocks = _blocks_df(spark, _fixture_path())
    return blocks.agg(
        F.count("*").alias("n_blocks"),
        F.round(
            F.sum("uncompressed_size").cast("double") / F.sum("compressed_size"), 4
        ).alias("est_compression_ratio"),
    )


_BIG_FIXTURE = "/tmp/spark_bam_spark_fixture/scan50k.bam"


def _big_fixture_path() -> str:
    # genv marker like _fixture_path (r12 ADVICE pattern): a stale /tmp
    # fixture after a generator change would hash-fail loudly against the
    # regenerated committed truth — a false red the marker prevents
    marker = f"{_BIG_FIXTURE}.genv{_FIXTURE_GEN_VERSION}"
    if not (os.path.exists(_BIG_FIXTURE) and os.path.exists(marker)):
        os.makedirs(os.path.dirname(_BIG_FIXTURE), exist_ok=True)
        from spark_bam_spark.bam.writer import make_fixture

        make_fixture(_BIG_FIXTURE, n=50000, block_payload=0xFF00)
        with open(marker, "w"):
            pass
    return _BIG_FIXTURE


@register(
    "bam_scan_50k",
    doc="S3 at throughput scale: 50k-record scan with full decode",
    headline=True,
    oracle=f"SELECT n_reads, total_bases, n_contigs FROM read_parquet('{_SCAN_AGGS_PQ}') WHERE fixture = '50k'",
)
def bam_scan_50k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-layer throughput probe: enough records that decode (not
    task overhead) dominates; counts every field decoded."""
    _big_fixture_path()
    from spark_bam_spark.bam.reader import read_bam, reader_choice

    key = (id(spark), _BIG_FIXTURE, 262144, None, reader_choice())
    reads = _PLAN_CACHE.get(key)
    if reads is None:
        reads = read_bam(spark, _BIG_FIXTURE, split_size=262144)
        _PLAN_CACHE[key] = reads
    return reads.agg(
        F.count("*").alias("n_reads"),
        F.sum("seq_len").cast("bigint").alias("total_bases"),
        F.count_distinct("rname").alias("n_contigs"),
    )


_HUGE_FIXTURE = "/tmp/spark_bam_spark_fixture/scan1m.bam"


def _tile_bam(src: str, dst: str, tiles: int) -> None:
    """Build a large BAM by tiling ``src``'s record stream ``tiles``×:
    decompress once, replicate the post-header bytes, re-chunk into BGZF
    blocks. Orders of magnitude faster than re-encoding records, and the
    result exercises the identical decode path (records stay
    block-unaligned)."""
    from spark_bam_spark.bam import bgzf
    from spark_bam_spark.bam.bgzf import EOF_BLOCK, compress_block
    from spark_bam_spark.bam.header import parse_header

    with open(src, "rb") as f:
        hdr = parse_header(f)
    flat = bytearray()
    ustart_of: dict[int, int] = {}
    with open(src, "rb") as f:
        for meta, data in bgzf.block_stream(f):
            ustart_of[meta.start] = len(flat)
            flat.extend(data)
    hlen = ustart_of[hdr.end.block_pos] + hdr.end.offset
    stream = bytes(flat[:hlen]) + bytes(flat[hlen:]) * tiles
    payload = 0xFF00
    with open(dst, "wb") as f:
        for off in range(0, len(stream), payload):
            f.write(compress_block(stream[off : off + payload], level=1))
        f.write(EOF_BLOCK)


@register(
    "bam_scan_1m",
    doc="S3 at decode-bound scale: 1M-record full-width scan (vectorized decoder probe)",
    headline=True,
    oracle=f"SELECT n_reads, total_bases, total_quals, n_contigs FROM read_parquet('{_SCAN_AGGS_PQ}') WHERE fixture = '1m'",
)
def bam_scan_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput probe sized so record decode (not task overhead)
    dominates: ~1M records, full schema incl. seq/qual/tags. The r1
    verdict flagged per-record Python decode as the one 100× scale
    killer; this query is the regression guard for the numpy→Arrow batch
    decoder (vectordecode.py).

    Measured r3 (this machine): decode_batch alone runs 328k records/s
    per core full-width; single-thread BGZF inflate of the 140 MB
    fixture is 1.5 s — so the whole scan is ~4.5 core-seconds of real
    work, and the ~0.9 s wall on local[32] is dominated by fixed Spark
    task/Arrow overhead, not decode. At cluster scale (reused workers,
    bigger files) the per-core decode rate is the binding constant."""
    marker = f"{_HUGE_FIXTURE}.genv{_FIXTURE_GEN_VERSION}"
    if not (os.path.exists(_HUGE_FIXTURE) and os.path.exists(marker)):
        # reuse the 50k fixture as the tile source
        _tile_bam(_big_fixture_path(), _HUGE_FIXTURE, tiles=20)
        with open(marker, "w"):
            pass
    from spark_bam_spark.bam.reader import read_bam, reader_choice

    key = (id(spark), _HUGE_FIXTURE, 1 << 22, None, reader_choice())
    reads = _PLAN_CACHE.get(key)
    if reads is None:
        reads = read_bam(spark, _HUGE_FIXTURE, split_size=1 << 22)
        _PLAN_CACHE[key] = reads
    return reads.agg(
        F.count("*").alias("n_reads"),
        F.sum("seq_len").cast("bigint").alias("total_bases"),
        F.sum(F.length("qual")).cast("bigint").alias("total_quals"),
        F.count_distinct("rname").alias("n_contigs"),
    )


@register(
    "bam_full_check_cdf",
    doc="full-check CDF: per-flag counts cumulative over #failing-flags groups (critical flags at n=1)",
    oracle=f"SELECT num_flags, n_positions, flag, n_flag, n_flag_cum FROM read_parquet('{_G_FULL_CHECK_CDF_PQ}')",
)
def bam_full_check_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FullCheck.scala:150-188 negativesByNumNonzeroFields + CDF.
    Oracle = INDEPENDENT derivation (tools/gen_checker_truth.py; see
    bam_full_check — same independent sweep, long-format aggregation
    re-implemented in plain Python)."""
    from spark_bam_spark.operators import qa

    return qa.flags_cdf(spark, _fixture_path())


@register(
    "bam_close_calls",
    doc="full-check close calls: positions ruled out by <=2 flags, with next-record PosMetadata",
    oracle=f"""SELECT block_pos, "offset" AS offset, num_flags, delta, next_qname, next_rname, next_pos
    FROM read_parquet('{_G_CLOSE_CALLS_PQ}')""",
)
def bam_close_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FullCheck.scala:199-218 closeCalls + PosMetadata annotation.
    Oracle = INDEPENDENT derivation (tools/gen_checker_truth.py): fresh
    19-flag sweep selects the <=2-flag positions, and the next-record
    metadata (delta/qname/rname/pos) is rendered from the GENERATOR's
    record list with a bisect — never from the engine's decode or its
    window-annotation join."""
    from spark_bam_spark.operators import qa

    return qa.close_calls(spark, _fixture_path()).select(
        "block_pos", "offset", "num_flags", "delta", "next_qname", "next_rname", "next_pos"
    )


@register(
    "bam_fp_metadata",
    doc="check-bam FP annotation: upstream-checker false positives with flags + next-record metadata",
    oracle=f"""SELECT block_pos, "offset" AS offset, num_flags, delta, next_qname, next_rname, next_pos
    FROM read_parquet('{_G_FP_METADATA_PQ}')""",
)
def bam_fp_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CheckerApp.scala:103-134 fpsWithMetadata (upstream FPs; eager has none).
    Oracle = INDEPENDENT derivation (tools/gen_checker_truth.py): the
    fresh upstream predicate finds the FP positions against generator
    ground truth; flags + next-record metadata rendered generator-side
    (see bam_close_calls)."""
    from spark_bam_spark.operators import qa

    return qa.fp_metadata(spark, _fixture_path()).select(
        "block_pos", "offset", "num_flags", "delta", "next_qname", "next_rname", "next_pos"
    )


_MULTI_FIXTURES = [
    ("/tmp/spark_bam_spark_fixture/cmp_a.bam", 1200, 11),
    ("/tmp/spark_bam_spark_fixture/cmp_b.bam", 1800, 12),
    ("/tmp/spark_bam_spark_fixture/cmp_c.bam", 2400, 13),
]


def _multi_fixture_paths() -> list[str]:
    from spark_bam_spark.bam.writer import make_fixture

    paths = []
    for path, n, seed in _MULTI_FIXTURES:
        marker = f"{path}.genv{_FIXTURE_GEN_VERSION}"
        if not (os.path.exists(path) and os.path.exists(marker)):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            make_fixture(path, n=n, block_payload=4096, seed=seed)
            with open(marker, "w"):
                pass
        paths.append(path)
    return paths


@register(
    "compare_splits_stats",
    doc="compare-splits over a file list: per-file eager-vs-upstream split diffs + A9/A10 stats reduction",
    oracle=f"""
    WITH mx AS (SELECT file, MAX(start) AS m FROM read_parquet('{_CMP_BLOCKS_PQ}') GROUP BY file),
    ks AS (SELECT mx.file, k FROM mx,
           LATERAL (SELECT unnest(generate_series(0, CAST(mx.m / 16384 AS BIGINT))) AS k)),
    b0 AS (SELECT DISTINCT ks.file,
                  (SELECT MIN(start) FROM read_parquet('{_CMP_BLOCKS_PQ}') b
                   WHERE b.file = ks.file AND b.start >= ks.k * 16384) AS b0
           FROM ks),
    sp AS (SELECT DISTINCT b0.file,
                  (SELECT MIN(struct_pack(bp := block_pos, o := "offset"))
                   FROM read_parquet('{_CMP_RECORDS_PQ}') r
                   WHERE r.file = b0.file AND r.block_pos >= b0.b0) AS s
           FROM b0 WHERE b0.b0 IS NOT NULL),
    cnt AS (SELECT file, COUNT(*) AS n FROM sp WHERE s IS NOT NULL GROUP BY file)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n) AS BIGINT) AS total_eager_splits,
           CAST(SUM(n) AS BIGINT) AS total_upstream_splits,
           CAST(SUM(n) AS BIGINT) AS total_both,
           CAST(0 AS BIGINT) AS total_eager_only,
           CAST(0 AS BIGINT) AS total_upstream_only,
           TRUE AS ratio_positive,
           TRUE AS ratio_ordered
    FROM cnt
    """,
    oracle_kind="invariant",
)
def compare_splits_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompareSplits.scala:40-110: the file list is the parallelism axis;
    per-file Results are monoid-summed and timing ratios reduced to
    Stats.

    The oracle DERIVES the per-file split counts from the generator
    sidecars (cmp_records/cmp_blocks, same boundary arithmetic as
    bam_compute_splits) and expects zero eager/upstream diffs — the
    golden property of these fixtures.  Wall-clock ratio Stats cannot be
    value-hashed across runs, so the registered output replaces the raw
    ratio columns with their deterministic invariants (mean > 0;
    min <= median <= max), computed FROM the live Stats reduction so the
    A9/A10 reduction still executes in-plan; the raw Stats remain on the
    operator surface (operators/qa.compare_splits_stats, CLI
    compare-splits) and are exact-value-tested in
    tests/test_qa_pipelines.py."""
    from spark_bam_spark.operators import qa

    full = qa.compare_splits_stats(spark, _multi_fixture_paths(), split_size=16384)
    return full.select(
        F.col("n_files").cast("bigint").alias("n_files"),
        F.col("total_eager_splits").cast("bigint").alias("total_eager_splits"),
        F.col("total_upstream_splits").cast("bigint").alias("total_upstream_splits"),
        F.col("total_both").cast("bigint").alias("total_both"),
        F.col("total_eager_only").cast("bigint").alias("total_eager_only"),
        F.col("total_upstream_only").cast("bigint").alias("total_upstream_only"),
        (F.col("ratio_mean") > 0).alias("ratio_positive"),
        ((F.col("ratio_min") <= F.col("ratio_median")) & (F.col("ratio_median") <= F.col("ratio_max"))).alias(
            "ratio_ordered"
        ),
    )


@register(
    "bam_idxstats",
    doc="idxstats: per-contig mapped/unmapped counts, BAM binary scan vs SAM text parse differential",
    oracle=f"""
    SELECT COALESCE(rname, '*') AS rname,
           CAST(SUM(CASE WHEN flag & 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bam_mapped,
           CAST(SUM(CASE WHEN flag & 4 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS bam_unmapped,
           CAST(SUM(CASE WHEN flag & 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sam_mapped,
           CAST(SUM(CASE WHEN flag & 4 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS sam_unmapped,
           TRUE AS match
    FROM read_parquet('{_TRUTH_PQ}')
    GROUP BY 1
    """,
)
def bam_idxstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """samtools-idxstats-shaped per-contig summary computed TWICE through
    independent code paths — the binary BAM DataSource scan and the
    declarative SAM text parse (load_sam) — full-outer-joined with a
    per-contig match bit. A mismatch in any count localizes a decode bug
    to one path; the driver's rows-only check still pins the row count
    (contigs + unplaced '*' row) and the match bits ride in the hash.

    Scale shape: two narrow scans (flag+rname only; the BAM reader skips
    seq/qual decode entirely), map-side partial aggs to <=4 rows each,
    then a trivially small join. No wide columns ever cross a shuffle."""
    from spark_bam_spark.bam.sam import load_sam

    def per_contig(df: DataFrame, prefix: str) -> DataFrame:
        unmapped = (F.col("flag").bitwiseAND(0x4) != 0).cast("int")
        return (
            df.select(F.coalesce(F.col("rname"), F.lit("*")).alias("rname"), unmapped.alias("u"))
            .groupBy("rname")
            .agg(
                F.sum(1 - F.col("u")).cast("bigint").alias(f"{prefix}_mapped"),
                F.sum("u").cast("bigint").alias(f"{prefix}_unmapped"),
            )
        )

    bam = per_contig(_reads(spark, columns="rname,flag"), "bam")
    sam = per_contig(load_sam(spark, _sam_fixture_path()), "sam")
    return bam.join(sam, "rname", "full_outer").select(
        "rname",
        "bam_mapped",
        "bam_unmapped",
        "sam_mapped",
        "sam_unmapped",
        (
            F.col("bam_mapped").eqNullSafe(F.col("sam_mapped"))
            & F.col("bam_unmapped").eqNullSafe(F.col("sam_unmapped"))
        ).alias("match"),
    )
