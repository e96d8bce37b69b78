"""BAI index: binary writer + parser + query planning — public SAM spec
§5.2 (binning scheme) and §5.3 (reg2bin/reg2bins pseudo-code).

Parity target (cited, not copied): the reference's BAI reader and
chunk-based interval pushdown — check/.../index/Index.scala:11-92,
Read.scala:14-114; query planning Intervals.scala:171-207 (S8/S11).

Our engine generates its own BAI from the writer's exact record
positions (it owns the ground truth), so the parser/planner can be
differential-tested against a full scan with zero external fixtures.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from spark_bam_spark.bam.bgzf import Pos

BAI_MAGIC = b"BAI\x01"
_LINEAR_SHIFT = 14  # 16 KiB linear-index windows (spec §5.2)
METADATA_BIN = 37450  # pseudo-bin for per-ref stats


@dataclass(frozen=True)
class Chunk:
    start: int  # virtual offset
    end: int

    @property
    def start_pos(self) -> Pos:
        return Pos.from_voffset(self.start)

    @property
    def end_pos(self) -> Pos:
        return Pos.from_voffset(self.end)


@dataclass
class BaiIndex:
    # per reference: bin -> chunks, and the 16 KiB linear index
    bins: list[dict[int, list[Chunk]]]
    linear: list[list[int]]
    # samtools' metadata pseudo-bin 37450 per reference (spec §5.2 note):
    # (off_beg, off_end, n_mapped, n_unmapped) — what `samtools idxstats`
    # reads so per-contig counts cost O(index), not O(data); None when the
    # ref has no placed records (or the .bai predates stats emission)
    stats: list[tuple[int, int, int, int] | None] | None = None
    # trailing count of coordinate-less records (ref_idx/pos < 0)
    n_no_coor: int = 0


def reg2bin(beg: int, end: int) -> int:
    """Spec §5.3 binning pseudo-code."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bins(beg: int, end: int) -> list[int]:
    """All bins that may overlap [beg, end) — spec §5.3."""
    bins = [0]
    end -= 1
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return bins


class BaiAccumulator:
    """Incremental spec §5.2 index builder: feed records in file order
    via :meth:`add`, read the finished :class:`BaiIndex` from
    :meth:`index`.  O(touched bins + linear windows) memory — what a
    STREAMING writer needs (the JVM sink keeps the same running
    structures, BamWriteSupport.java) — while :func:`build_bai` stays
    the one-shot wrapper for callers that already hold the record list.
    Adjacent chunks within a bin merge as they arrive; the metadata
    pseudo-bin (idxstats counts + ref voffset span) and the trailing
    no-coordinate count accumulate alongside."""

    def __init__(self, n_refs: int) -> None:
        self.bins: list[dict[int, list[Chunk]]] = [dict() for _ in range(n_refs)]
        self.linear: list[list[int]] = [[] for _ in range(n_refs)]
        self.stats: list[tuple[int, int, int, int] | None] = [None] * n_refs
        self.n_no_coor = 0

    def add(self, ref_idx: int, pos: int, end_pos: int, flag: int, v0: int, v1: int) -> None:
        """One record: coordinates, flag, and its [start, end) virtual
        offsets in the file being written."""
        if ref_idx < 0 or pos < 0:
            self.n_no_coor += 1
            return
        b = reg2bin(pos, max(end_pos, pos + 1))
        unmapped = 1 if flag & 0x4 else 0
        prev = self.stats[ref_idx]
        if prev is None:
            self.stats[ref_idx] = (v0, v1, 1 - unmapped, unmapped)
        else:
            self.stats[ref_idx] = (
                min(prev[0], v0),
                max(prev[1], v1),
                prev[2] + (1 - unmapped),
                prev[3] + unmapped,
            )
        chunks = self.bins[ref_idx].setdefault(b, [])
        if chunks and chunks[-1].end == v0:
            chunks[-1] = Chunk(chunks[-1].start, v1)  # merge adjacent
        else:
            chunks.append(Chunk(v0, v1))
        lin = self.linear[ref_idx]
        w_end = max(end_pos, pos + 1) - 1 >> _LINEAR_SHIFT
        while len(lin) <= w_end:
            lin.append(0)
        for w in range(pos >> _LINEAR_SHIFT, w_end + 1):
            if lin[w] == 0 or v0 < lin[w]:
                lin[w] = v0

    def index(self) -> BaiIndex:
        return BaiIndex(
            bins=self.bins, linear=self.linear, stats=self.stats, n_no_coor=self.n_no_coor
        )


def build_bai(
    n_refs: int,
    records: list[tuple[int, int, int, int, Pos, Pos]],
) -> BaiIndex:
    """records: (ref_idx, pos, end_pos, flag, start Pos, end Pos) per
    record, in file order — the one-shot wrapper over
    :class:`BaiAccumulator`."""
    acc = BaiAccumulator(n_refs)
    for ref_idx, pos, end_pos, flag, p0, p1 in records:
        acc.add(ref_idx, pos, end_pos, flag, p0.to_voffset(), p1.to_voffset())
    return acc.index()


def write_bai(path: str, idx: BaiIndex) -> None:
    out = bytearray(BAI_MAGIC)
    out += struct.pack("<i", len(idx.bins))
    for ref, (bins, lin) in enumerate(zip(idx.bins, idx.linear)):
        st = idx.stats[ref] if idx.stats else None
        out += struct.pack("<i", len(bins) + (1 if st else 0))
        for b in sorted(bins):
            chunks = bins[b]
            out += struct.pack("<Ii", b, len(chunks))
            for c in chunks:
                out += struct.pack("<QQ", c.start, c.end)
        if st:
            # metadata pseudo-bin, always last (37450 > any real bin):
            # chunk 1 = ref voffset span, chunk 2 = (n_mapped, n_unmapped)
            out += struct.pack("<Ii", METADATA_BIN, 2)
            out += struct.pack("<QQ", st[0], st[1])
            out += struct.pack("<QQ", st[2], st[3])
        out += struct.pack("<i", len(lin))
        for v in lin:
            out += struct.pack("<Q", v)
    out += struct.pack("<Q", idx.n_no_coor)
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_bai(path: str) -> BaiIndex:
    """Binary parse — the engine's S11 (Read.scala:14-114 analogue)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != BAI_MAGIC:
        raise ValueError(f"{path}: not a BAI file")
    o = 4
    (n_ref,) = struct.unpack_from("<i", buf, o)
    o += 4
    bins: list[dict[int, list[Chunk]]] = []
    linear: list[list[int]] = []
    stats: list[tuple[int, int, int, int] | None] = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", buf, o)
        o += 4
        bmap: dict[int, list[Chunk]] = {}
        st: tuple[int, int, int, int] | None = None
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", buf, o)
            o += 8
            chunks = []
            for _ in range(n_chunk):
                s, e = struct.unpack_from("<QQ", buf, o)
                o += 16
                chunks.append(Chunk(s, e))
            if b == METADATA_BIN and len(chunks) == 2:
                # samtools idxstats pseudo-bin: span chunk + counts chunk;
                # kept out of the query bins so chunk planning never sees it
                st = (chunks[0].start, chunks[0].end, chunks[1].start, chunks[1].end)
            else:
                bmap[b] = chunks
        (n_intv,) = struct.unpack_from("<i", buf, o)
        o += 4
        lin = list(struct.unpack_from(f"<{n_intv}Q", buf, o)) if n_intv else []
        o += 8 * n_intv
        bins.append(bmap)
        linear.append(lin)
        stats.append(st)
    n_no_coor = struct.unpack_from("<Q", buf, o)[0] if o + 8 <= len(buf) else 0
    return BaiIndex(bins=bins, linear=linear, stats=stats, n_no_coor=n_no_coor)


def idxstats_from_bai(idx: BaiIndex) -> tuple[list[tuple[int, int, int]], int]:
    """samtools-idxstats from the index alone — O(index bytes), no data
    scan: per-ref (ref_idx, n_mapped, n_unmapped) from the metadata
    pseudo-bin, plus the no-coordinate count.  Refs without stats (no
    placed records, or a pre-stats .bai) report zeros."""
    rows = []
    for ref_idx in range(len(idx.bins)):
        st = idx.stats[ref_idx] if idx.stats else None
        rows.append((ref_idx, st[2] if st else 0, st[3] if st else 0))
    return rows, idx.n_no_coor


def query_chunks(idx: BaiIndex, ref_idx: int, beg: int, end: int) -> list[Chunk]:
    """Interval → candidate chunks (S8, Intervals.scala:171-207):
    overlapping bins' chunks, floored by the linear index, merged/sorted
    (allAddresses dedup, Index.scala:38-40)."""
    if not (0 <= ref_idx < len(idx.bins)):
        return []
    lin = idx.linear[ref_idx]
    min_off = 0
    w = beg >> _LINEAR_SHIFT
    if w < len(lin):
        min_off = lin[w]
    out = []
    for b in reg2bins(beg, end):
        for c in idx.bins[ref_idx].get(b, ()):
            if c.end > min_off or (b != METADATA_BIN and min_off == 0):
                out.append(c)
    out.sort(key=lambda c: (c.start, c.end))
    merged: list[Chunk] = []
    for c in out:
        if merged and c.start <= merged[-1].end:
            if c.end > merged[-1].end:
                merged[-1] = Chunk(merged[-1].start, c.end)
        else:
            merged.append(c)
    return merged
