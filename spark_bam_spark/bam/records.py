"""BAM record binary encode/decode — public SAM/BAM spec §4.2.

Field layout parity with the reference's parse sites
(check/.../eager/Checker.scala:46-107; FIXED_FIELDS_SIZE = 9*4,
check/.../Checker.scala:18): block_size, refID, pos, l_read_name, mapq,
bin, n_cigar_op, flag, l_seq, next_refID, next_pos, tlen, then name /
cigar / 4-bit seq / qual / tags.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

FIXED_FIELDS_SIZE = 36  # block_size + 8 more int32-sized slots
CIGAR_OPS = "MIDNSHP=X"  # 9 valid ops; op nibble > 8 is invalid
SEQ_CODES = "=ACMGRSVTWYHKDBN"
_SEQ_TO_NIBBLE = {c: i for i, c in enumerate(SEQ_CODES)}
FLAG_UNMAPPED = 0x4
# ops that consume reference loci (for end_pos): M/D/N/=/X
_REF_CONSUMING = {0, 2, 3, 7, 8}


@dataclass
class BamRecord:
    qname: str
    flag: int
    ref_idx: int
    pos: int  # 0-based; -1 unplaced
    mapq: int
    cigar: list[tuple[int, int]]  # (op_idx, length)
    mate_ref_idx: int
    mate_pos: int
    tlen: int
    seq: str
    qual: bytes
    tags: dict[str, str] = field(default_factory=dict)

    @property
    def n_cigar_ops(self) -> int:
        return len(self.cigar)

    @property
    def seq_len(self) -> int:
        return len(self.seq)

    @property
    def cigar_str(self) -> str:
        if not self.cigar:
            return "*"
        return "".join(f"{ln}{CIGAR_OPS[op]}" for op, ln in self.cigar)

    @property
    def end_pos(self) -> int:
        """Alignment end: pos + reference-consumed cigar length."""
        if self.pos < 0:
            return -1
        return self.pos + sum(ln for op, ln in self.cigar if op in _REF_CONSUMING)

    def is_mapped(self) -> bool:
        return not (self.flag & FLAG_UNMAPPED)


def encode_record(r: BamRecord) -> bytes:
    name_b = r.qname.encode("ascii") + b"\x00"
    cigar = r.cigar
    n_cigar = len(cigar)
    l_seq = len(r.seq)
    cg_tag = b""
    if n_cigar > 0xFFFF:
        # spec §4.2.2 long-cigar fallback (n_cigar_op is uint16): store the
        # placeholder kSmN in the cigar field (k = l_seq, m = reference
        # consumed — same end_pos as the real cigar by construction) and
        # the real ops in a CG:B,I tag appended AFTER the Z tags (the
        # htslib/samtools convention; keeping it last also keeps the
        # Z-only tag scanners complete).  Both writers emit this
        # identically — byte parity holds for long-read records too.
        if "CG" in r.tags:
            raise ValueError(
                "cigar has >65535 ops and tags already carry a CG key — "
                "ambiguous; drop the CG tag and put the real cigar in 'cigar'"
            )
        ref_len = sum(ln for op, ln in cigar if op in _REF_CONSUMING)
        cg_tag = (
            b"CGBI"
            + struct.pack("<i", n_cigar)
            + b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
        )
        cigar = [(4, l_seq), (3, ref_len)]  # S then N
        n_cigar = 2
    # reg2bin over [pos, end) — spec §5.3; 0 for unplaced
    bin_ = _reg2bin(r.pos, max(r.end_pos, r.pos + 1)) if r.pos >= 0 else 0
    body = bytearray()
    body += struct.pack(
        "<iiBBHHHiiii",
        r.ref_idx,
        r.pos,
        len(name_b),
        r.mapq,
        bin_,
        n_cigar,
        r.flag,
        l_seq,
        r.mate_ref_idx,
        r.mate_pos,
        r.tlen,
    )
    body += name_b
    for op, ln in cigar:
        body += struct.pack("<I", (ln << 4) | op)
    seq_bytes = bytearray((l_seq + 1) // 2)
    for i, base in enumerate(r.seq):
        nib = _SEQ_TO_NIBBLE.get(base, 15)
        seq_bytes[i // 2] |= nib << (4 if i % 2 == 0 else 0)
    body += seq_bytes
    body += r.qual if len(r.qual) == l_seq else bytes([0xFF] * l_seq)
    for tag, val in sorted(r.tags.items()):
        body += tag.encode("ascii")[:2] + b"Z" + val.encode("ascii") + b"\x00"
    body += cg_tag
    return struct.pack("<i", len(body)) + bytes(body)


# vectorized seq decode: packed nibbles → hex string (one hex digit per
# nibble, C-speed) → base letters via str.translate
_HEX_TO_SEQ = str.maketrans("0123456789abcdef", SEQ_CODES)


def decode_record(
    buf: bytes,
    off: int,
    want_seq: bool = True,
    want_qual: bool = True,
    want_tags: bool = True,
) -> tuple[BamRecord, int]:
    """Decode one record at ``off``; returns (record, total bytes consumed).
    Raises on truncation — validity checking is the checker's job.
    ``want_*=False`` skips building the expensive variable-length fields
    (column pruning inside the scan, SURVEY §4 'fast path vs
    metadata-only path')."""
    (block_size,) = struct.unpack_from("<i", buf, off)
    if block_size < FIXED_FIELDS_SIZE - 4 or off + 4 + block_size > len(buf):
        raise ValueError(f"truncated/invalid record at {off}")
    p = off + 4
    ref_idx, pos, l_name, mapq, bin_, n_cigar, flag, l_seq, mate_ref, mate_pos, tlen = struct.unpack_from(
        "<iiBBHHHiiii", buf, p
    )
    p += 32
    qname = buf[p : p + l_name - 1].decode("ascii", errors="replace")
    p += l_name
    cigar = []
    for _ in range(n_cigar):
        (v,) = struct.unpack_from("<I", buf, p)
        cigar.append((v & 0xF, v >> 4))
        p += 4
    n_seq_bytes = (l_seq + 1) // 2
    if want_seq and l_seq:
        seq = buf[p : p + n_seq_bytes].hex().translate(_HEX_TO_SEQ)[:l_seq]
    else:
        seq = ""
    p += n_seq_bytes
    qual = bytes(buf[p : p + l_seq]) if want_qual else b""
    p += l_seq
    end = off + 4 + block_size
    # spec §4.2.2 long-cigar placeholder: kSmN with k == l_seq means the
    # real cigar lives in a CG:B,I tag — scan for it even when the caller
    # pruned tags, so 'cigar' is always the real alignment
    placeholder = n_cigar == 2 and cigar[0] == (4, l_seq) and cigar[1][0] == 3
    tags: dict[str, str] = {}
    cg_ops: list[tuple[int, int]] | None = None
    if want_tags or placeholder:
        tags, cg_ops = _walk_tags(buf, p, end, want_map=want_tags)
    if placeholder and cg_ops:
        cigar = cg_ops
    rec = BamRecord(
        qname=qname,
        flag=flag,
        ref_idx=ref_idx,
        pos=pos,
        mapq=mapq,
        cigar=cigar,
        mate_ref_idx=mate_ref,
        mate_pos=mate_pos,
        tlen=tlen,
        seq=seq,
        qual=qual,
        tags=tags,
    )
    return rec, 4 + block_size


_B_SIZES = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}


def _walk_tags(
    buf: bytes, p: int, end: int, want_map: bool
) -> tuple[dict[str, str], list[tuple[int, int]] | None]:
    """Walk the auxiliary-field region: Z values surfaced in the map,
    fixed-size typed tags and H/B arrays skipped structurally, and a
    CG:B,I array (the §4.2.2 long-cigar carrier) decoded into cigar ops.
    CG never enters the map — it is promoted into 'cigar' by the caller,
    the same transparency samtools applies."""
    tags: dict[str, str] = {}
    cg_ops: list[tuple[int, int]] | None = None
    while p + 3 <= end:
        tag = buf[p : p + 2].decode("ascii", errors="replace")
        typ = chr(buf[p + 2])
        p += 3
        if typ == "Z":
            z = buf.index(b"\x00", p, end)
            if want_map:
                tags[tag] = buf[p:z].decode("ascii", errors="replace")
            p = z + 1
        elif typ == "H":
            z = buf.find(b"\x00", p, end)
            if z < 0:
                break
            p = z + 1
        elif typ == "B":
            if p + 5 > end:  # subtype byte + int32 count must fit
                break
            sub = chr(buf[p])
            size = _B_SIZES.get(sub)
            if size is None:
                break
            (cnt,) = struct.unpack_from("<i", buf, p + 1)
            if cnt < 0 or p + 5 + size * cnt > end:
                break
            if tag == "CG" and sub == "I":
                words = struct.unpack_from(f"<{cnt}I", buf, p + 5)
                cg_ops = [(v & 0xF, v >> 4) for v in words]
            p += 5 + size * cnt
        elif typ in "AcC":
            p += 1
        elif typ in "sS":
            p += 2
        elif typ in "iIf":
            p += 4
        else:
            break  # unknown type: stop politely (fixtures only use Z)
    return tags, cg_ops


def _reg2bin(beg: int, end: int) -> int:
    """SAM spec §5.3 binning (public pseudo-code)."""
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
