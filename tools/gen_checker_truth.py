"""Derive the checker-diagnostic goldens from an INDEPENDENT checker
implementation (upgrade ordered by the r6 verdict: the three-way
confusion, the full-check flags histogram, and its CDF were previously
dumps of the engine's own output — regression pins, not derivations).

Independence claim, precisely:

- The engine's production sweep (operators/qa.py -> bam/vectorcheck.py)
  prescreens with numpy and CONFIRMS survivors with bam/checker.py, so a
  dump of its output can never catch a bug in bam/checker.py itself.
- This module re-implements the record-boundary semantics from scratch —
  the documented decision procedure of the reference (eager:
  check/.../eager/Checker.scala:26-128; upstream subset:
  docs/motivation.md:36-52; 19-flag struct:
  check/.../full/error/Flags.scala:21-45) — in a different style
  (int.from_bytes field reads, table-free straight-line code), importing
  NOTHING from spark_bam_spark.bam.checker / vectorcheck.
- Block geometry, decompression, and ground-truth record positions come
  from the fixture GENERATOR (make_fixture's return value) and stdlib
  gzip — the tools/gen_bam_truth.py pattern — not from the engine's BGZF
  reader or DataSource.

So: engine sweep (numpy + checker.py over bgzf.py windows) vs this file
(pure Python over generator geometry) agree on every one of ~380k
positions x (eager, upstream, 19 flags), or the diff is a real bug in
one of them.  Run with --check (default) to verify the committed goldens
match this derivation; --write to (re)generate them.

Deterministic; outputs committed under tests/fixtures/.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "fixtures")

READS_TO_CHECK = 10  # check/.../check/package.scala:17
MAX_READ_SIZE = 100_000_000  # check/.../check/package.scala:28
LOOKAHEAD_BLOCKS = 4  # the sweep's window horizon (operators/qa.py)

FLAG_NAMES = (
    "too_few_fixed_block_bytes",
    "negative_read_idx",
    "too_large_read_idx",
    "negative_read_pos",
    "too_large_read_pos",
    "negative_next_read_idx",
    "too_large_next_read_idx",
    "negative_next_read_pos",
    "too_large_next_read_pos",
    "too_few_bytes_for_read_name",
    "non_null_terminated_read_name",
    "non_ascii_read_name",
    "no_read_name",
    "empty_read_name",
    "too_few_bytes_for_cigar_ops",
    "invalid_cigar_op",
    "empty_mapped_cigar",
    "empty_mapped_seq",
    "too_few_remaining_bytes_implied",
)


def _i32(buf: bytes, off: int) -> int:
    return int.from_bytes(buf[off : off + 4], "little", signed=True)


def _u16(buf: bytes, off: int) -> int:
    return int.from_bytes(buf[off : off + 2], "little", signed=False)


def _fields(buf: bytes, o: int) -> dict:
    """All fixed-section fields of the presumptive record at ``o``."""
    return {
        "block_size": _i32(buf, o),
        "ref_idx": _i32(buf, o + 4),
        "pos": _i32(buf, o + 8),
        "l_name": buf[o + 12],
        "n_cigar": _u16(buf, o + 16),
        "flag": _u16(buf, o + 18),
        "l_seq": _i32(buf, o + 20),
        "mate_ref": _i32(buf, o + 24),
        "mate_pos": _i32(buf, o + 28),
    }


def _name_ok(b: int) -> bool:
    """ASCII subset [!-?A-~] (Checker.scala:11-16)."""
    return (0x21 <= b <= 0x3F) or (0x41 <= b <= 0x7E)


def _implied(f: dict) -> int:
    return 32 + f["l_name"] + 4 * f["n_cigar"] + (f["l_seq"] + 1) // 2 + f["l_seq"]


def eager_one(buf: bytes, o: int, clens: list[int]) -> int | None:
    """One-record eager check; next offset on success, None on failure
    (eager/Checker.scala:26-128 semantics, implemented fresh)."""
    n = len(buf)
    if n - o < 36:
        return None
    f = _fields(buf, o)
    if f["block_size"] < 32 or f["block_size"] + 4 > MAX_READ_SIZE:
        return None
    for idx, p in ((f["ref_idx"], f["pos"]), (f["mate_ref"], f["mate_pos"])):
        if idx < -1 or idx >= len(clens):
            return None
        if p < -1:
            return None
        if idx >= 0 and p > clens[idx]:  # strictly > (PosChecker.scala:59)
            return None
    if f["l_name"] <= 1:
        return None
    if f["l_seq"] < 0:
        return None
    if not (f["flag"] & 0x4) and (f["n_cigar"] == 0 or f["l_seq"] == 0):
        return None
    if f["block_size"] < _implied(f):
        return None
    name_start = o + 36
    if name_start + f["l_name"] <= n and f["l_name"] > 0:
        name = buf[name_start : name_start + f["l_name"]]
        if name[-1] != 0:
            return None
        for b in name[:-1]:
            if not _name_ok(b):
                return None
    cig_start = name_start + f["l_name"]
    if f["n_cigar"] > 0 and cig_start + 4 * f["n_cigar"] <= n:
        for i in range(f["n_cigar"]):
            if (buf[cig_start + 4 * i] & 0xF) > 8:
                return None
    return o + 4 + f["block_size"]


def eager_call(buf: bytes, o: int, clens: list[int]) -> bool:
    """reads_to_check consecutive records parse; window end accepts
    (fixed-horizon sweep semantics; clean EOF accepts)."""
    for _ in range(READS_TO_CHECK):
        if o == len(buf):
            return True
        nxt = eager_one(buf, o, clens)
        if nxt is None:
            return False
        if nxt > len(buf):
            return True
        o = nxt
    return True


def upstream_one(buf: bytes, o: int, clens: list[int], anchor: bool) -> int | None:
    """Upstream (hadoop-bam-documented) validation subset
    (docs/motivation.md:36-52): no locus upper bound, no name
    emptiness/charset, no mapped-empty-cigar/seq; cigar-op validity
    skipped for the anchor record; name null-termination kept."""
    n = len(buf)
    if n - o < 36:
        return None
    f = _fields(buf, o)
    if f["block_size"] < 32 or f["block_size"] + 4 > MAX_READ_SIZE:
        return None
    for idx, p in ((f["ref_idx"], f["pos"]), (f["mate_ref"], f["mate_pos"])):
        if idx < -1 or idx >= len(clens):
            return None
        if p < -1:
            return None
    if f["l_name"] < 1:
        return None
    if f["l_seq"] < 0:
        return None
    if f["block_size"] < _implied(f):
        return None
    name_start = o + 36
    if f["l_name"] > 0 and name_start + f["l_name"] <= n:
        if buf[name_start + f["l_name"] - 1] != 0:
            return None
    cig_start = name_start + f["l_name"]
    if not anchor and f["n_cigar"] > 0 and cig_start + 4 * f["n_cigar"] <= n:
        for i in range(f["n_cigar"]):
            if (buf[cig_start + 4 * i] & 0xF) > 8:
                return None
    return o + 4 + f["block_size"]


def upstream_call(buf: bytes, o: int, clens: list[int]) -> bool:
    for i in range(READS_TO_CHECK):
        if o == len(buf):
            return True
        nxt = upstream_one(buf, o, clens, anchor=(i == 0))
        if nxt is None:
            return False
        if nxt > len(buf):
            return True
        o = nxt
    return True


def flags_at(buf: bytes, o: int, clens: list[int]) -> list[str]:
    """The 19-flag diagnostic evaluation of the presumptive record at
    ``o`` (full/Checker.scala:17-186, Flags.scala:21-45), fresh."""
    n = len(buf)
    if n - o < 36:
        return ["too_few_fixed_block_bytes"]
    f = _fields(buf, o)
    out: list[str] = []

    def pos_errs(idx: int, p: int, neg_i: str, big_i: str, neg_p: str, big_p: str) -> None:
        # RefPosError decision tree (full/error/RefPosError.scala:7-33)
        if idx < -1:
            out.append(neg_i)
            if p < -1:
                out.append(neg_p)
        elif idx >= len(clens):
            out.append(big_i)
            if p < -1:
                out.append(neg_p)
        elif p < -1:
            out.append(neg_p)
        elif idx >= 0 and p > clens[idx]:
            out.append(big_p)

    pos_errs(f["ref_idx"], f["pos"],
             "negative_read_idx", "too_large_read_idx",
             "negative_read_pos", "too_large_read_pos")
    pos_errs(f["mate_ref"], f["mate_pos"],
             "negative_next_read_idx", "too_large_next_read_idx",
             "negative_next_read_pos", "too_large_next_read_pos")

    if f["l_name"] == 0:
        out.append("no_read_name")
    elif f["l_name"] == 1:
        out.append("empty_read_name")
    if not (f["flag"] & 0x4):
        if f["n_cigar"] == 0:
            out.append("empty_mapped_cigar")
        if f["l_seq"] == 0:
            out.append("empty_mapped_seq")
    if f["block_size"] < _implied(f):
        out.append("too_few_remaining_bytes_implied")

    name_start = o + 36
    if f["l_name"] > 0:
        if name_start + f["l_name"] > n:
            out.append("too_few_bytes_for_read_name")
        else:
            name = buf[name_start : name_start + f["l_name"]]
            if name[-1] != 0:
                out.append("non_null_terminated_read_name")
            if any(not _name_ok(b) for b in name[:-1]):
                out.append("non_ascii_read_name")

    cig_start = name_start + f["l_name"]
    if f["n_cigar"] > 0:
        if cig_start + 4 * f["n_cigar"] > n:
            out.append("too_few_bytes_for_cigar_ops")
        else:
            for i in range(f["n_cigar"]):
                if (buf[cig_start + 4 * i] & 0xF) > 8:
                    out.append("invalid_cigar_op")
                    break
    return out


def derive(n: int = 2500, block_payload: int = 4096, seed: int = 42):
    """Sweep every uncompressed position of the qa fixture with the
    independent checkers.  Returns a dict keyed exactly like the engine's
    registered queries: three-way confusion, flags histogram + per-group
    flag counts, close-call rows (num_flags <= 2) and upstream-FP rows —
    the latter two annotated with next-record PosMetadata rendered
    straight from the GENERATOR's record list (the gen_bam_truth.py
    independent-rendering pattern), never from the engine's decode."""
    import bisect

    from spark_bam_spark.bam.writer import CONTIG_LENGTHS, CONTIG_NAMES, make_fixture, synth_records

    clens = list(CONTIG_LENGTHS)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "qa.bam")
        res = make_fixture(path, n=n, block_payload=block_payload, seed=seed)
        raw = open(path, "rb").read()

    payloads = []
    ustarts = {}
    u = 0
    for b in res.blocks:
        pl = gzip.decompress(raw[b.start : b.start + b.compressed_size])
        assert len(pl) == b.uncompressed_size, (b.start, len(pl), b.uncompressed_size)
        payloads.append(pl)
        ustarts[b.start] = u
        u += len(pl)

    truth = {(p.block_pos, p.offset) for p in res.record_positions}
    # next-record annotation source: generator positions + generator-side
    # field rendering (independent of the BAM decoder)
    recs = synth_records(n)
    rec_u = [ustarts[p.block_pos] + p.offset for p in res.record_positions]
    assert rec_u == sorted(rec_u) and len(recs) == len(rec_u)

    def annotate(pos_u: int):
        j = bisect.bisect_left(rec_u, pos_u)
        if j == len(rec_u):
            return None, None, None, None
        r = recs[j]
        rname = CONTIG_NAMES[r.ref_idx] if r.ref_idx >= 0 else None
        return rec_u[j] - pos_u, r.qname, rname, r.pos

    three_way: Counter = Counter()  # (eager, upstream, oracle) -> n
    flags_hist: Counter = Counter()  # num_flags -> n_positions
    group_flags: dict[int, Counter] = {}  # num_flags -> flag -> n
    close_rows: list[tuple] = []  # (block_pos, offset, num_flags, delta, qname, rname, pos)
    fp_rows: list[tuple] = []  # same shape, for upstream FPs

    for i, b in enumerate(res.blocks):
        window = b"".join(payloads[i : i + LOOKAHEAD_BLOCKS])
        bu = ustarts[b.start]
        for o in range(b.uncompressed_size):
            e = eager_call(window, o, clens)
            up = upstream_call(window, o, clens)
            t = (b.start, o) in truth
            three_way[(e, up, t)] += 1
            fl = flags_at(window, o, clens)
            k = len(fl)
            if fl:
                flags_hist[k] += 1
                group_flags.setdefault(k, Counter()).update(fl)
            if (fl and k <= 2) or (up and not t):
                delta, qn, rn, rp = annotate(bu + o)
                row = (b.start, o, k, delta, qn, rn, rp)
                if fl and k <= 2:
                    close_rows.append(row)
                if up and not t:
                    fp_rows.append(row)
    return {
        "three_way": three_way,
        "flags_hist": flags_hist,
        "group_flags": group_flags,
        "close_rows": close_rows,
        "fp_rows": fp_rows,
    }


_POS_META_SCHEMA = pa.schema(
    [
        ("block_pos", pa.int64()),
        ("offset", pa.int32()),
        ("num_flags", pa.int32()),
        ("delta", pa.int64()),
        ("next_qname", pa.string()),
        ("next_rname", pa.string()),
        ("next_pos", pa.int64()),
    ]
)


def _pos_meta_table(rows: list[tuple]) -> pa.Table:
    rows = sorted(rows)
    return pa.table(
        {
            "block_pos": pa.array([r[0] for r in rows], pa.int64()),
            "offset": pa.array([r[1] for r in rows], pa.int32()),
            "num_flags": pa.array([r[2] for r in rows], pa.int32()),
            "delta": pa.array([r[3] for r in rows], pa.int64()),
            "next_qname": pa.array([r[4] for r in rows], pa.string()),
            "next_rname": pa.array([r[5] for r in rows], pa.string()),
            "next_pos": pa.array([r[6] for r in rows], pa.int64()),
        },
        schema=_POS_META_SCHEMA,
    )


def to_tables(d: dict):
    three_way, flags_hist, group_flags = d["three_way"], d["flags_hist"], d["group_flags"]
    tw = pa.table(
        {
            "eager_call": [k[0] for k in sorted(three_way)],
            "upstream_call": [k[1] for k in sorted(three_way)],
            "oracle_call": [k[2] for k in sorted(three_way)],
            "n": pa.array([three_way[k] for k in sorted(three_way)], pa.int64()),
        }
    )
    ks = sorted(flags_hist)
    fh = pa.table(
        {
            "num_flags": pa.array(ks, pa.int32()),
            "n_positions": pa.array([flags_hist[k] for k in ks], pa.int64()),
        }
    )
    # long-format CDF: per (num_flags, flag) count + cumulative count over
    # groups <= num_flags, rows with n_flag > 0 only (FullCheck.scala:150-188)
    rows = []
    for flag in FLAG_NAMES:
        cum = 0
        for k in ks:
            cnt = group_flags[k].get(flag, 0)
            cum += cnt
            if cnt > 0:
                rows.append((k, flags_hist[k], flag, cnt, cum))
    rows.sort(key=lambda r: (r[0], r[2]))
    cdf = pa.table(
        {
            "num_flags": pa.array([r[0] for r in rows], pa.int32()),
            "n_positions": pa.array([r[1] for r in rows], pa.int64()),
            "flag": [r[2] for r in rows],
            "n_flag": pa.array([r[3] for r in rows], pa.int64()),
            "n_flag_cum": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    return {
        "qa2500_golden_three_way.parquet": tw,
        "qa2500_golden_full_check.parquet": fh,
        "qa2500_golden_full_check_cdf.parquet": cdf,
        "qa2500_golden_close_calls.parquet": _pos_meta_table(d["close_rows"]),
        "qa2500_golden_fp_metadata.parquet": _pos_meta_table(d["fp_rows"]),
    }


def main() -> int:
    write = "--write" in sys.argv
    tables = to_tables(derive())
    rc = 0
    for fname, tbl in tables.items():
        dest = os.path.join(OUT, fname)
        if write:
            pq.write_table(tbl, dest)
            print(f"wrote {fname}: {tbl.num_rows} rows")
            continue
        committed = pq.read_table(dest)
        same = committed.sort_by([(c, "ascending") for c in committed.column_names]).equals(
            tbl.cast(committed.schema).sort_by([(c, "ascending") for c in tbl.column_names])
        )
        print(("MATCH " if same else "DIFF  ") + f"{fname}: derived {tbl.num_rows} rows, committed {committed.num_rows}")
        if not same:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
