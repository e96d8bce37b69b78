"""BAM header parsing (read side) — spec §4.2; parity:
check/.../header/Header.scala:13-60, ContigLengths.scala:18-53."""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO

from spark_bam_spark.bam.bgzf import Pos, block_stream
from spark_bam_spark.bam.checker import HeaderInfo
from spark_bam_spark.bam.writer import BAM_MAGIC


@dataclass(frozen=True)
class BamHeader:
    sam_text: str
    names: tuple[str, ...]
    lengths: tuple[int, ...]
    end: Pos  # virtual position of the first byte after the header

    def info(self) -> HeaderInfo:
        return HeaderInfo(self.lengths)


def parse_header(f: BinaryIO) -> BamHeader:
    """Decompress blocks from offset 0 until the header is consumed;
    returns contig dict + the header-end virtual position (the first
    record's Pos in a freshly-written file)."""
    buf = bytearray()
    block_bounds: list[tuple[int, int]] = []  # (ustart, block_pos)
    it = block_stream(f, 0)

    def ensure(nbytes: int) -> None:
        while len(buf) < nbytes:
            meta, data = next(it)
            block_bounds.append((len(buf), meta.start))
            buf.extend(data)

    ensure(8)
    if bytes(buf[:4]) != BAM_MAGIC:
        raise ValueError("not a BAM file (bad magic)")
    (l_text,) = struct.unpack_from("<i", buf, 4)
    ensure(8 + l_text + 4)
    sam_text = bytes(buf[8 : 8 + l_text]).decode("ascii", errors="replace")
    p = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", buf, p)
    p += 4
    names: list[str] = []
    lengths: list[int] = []
    for _ in range(n_ref):
        ensure(p + 4)
        (l_name,) = struct.unpack_from("<i", buf, p)
        ensure(p + 4 + l_name + 4)
        names.append(bytes(buf[p + 4 : p + 4 + l_name - 1]).decode("ascii"))
        (ln,) = struct.unpack_from("<i", buf, p + 4 + l_name)
        lengths.append(ln)
        p += 8 + l_name
    # map header-end uncompressed offset to a virtual position
    import bisect

    ustarts = [u for u, _ in block_bounds]
    i = bisect.bisect_right(ustarts, p) - 1
    end = Pos(block_bounds[i][1], p - ustarts[i])
    return BamHeader(sam_text, tuple(names), tuple(lengths), end)
