"""Scalar functions (SURVEY §2.8) as Column expressions — all JVM-side
built-ins (bitwise/regexp/format), no Python UDFs.

Parity targets (cited, not copied):
- Pos pack/unpack to HTSJDK 48/16-bit virtual offset: bgzf/.../Pos.scala:24,32-36
- Pos approx distance via compression ratio:          bgzf/.../Pos.scala:17-22,
  default ratio 3.0: bgzf/.../EstimatedCompressionRatio.scala:13
- byte-size formatting ("583K"):                      CheckerApp.scala:157-159
- ASCII read-name alphabet `[!-?A-~]`:                check/.../Checker.scala:11-16
- cigar-op nibble validity `(x & 0xf) <= 8`:          eager/Checker.scala:104
- interval-string parse "1:13000-14000":              load/.../Intervals.scala:53-55
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_COMPRESSION_RATIO = 3.0


def pos_pack(block_pos: Column | str, offset: Column | str) -> Column:
    """(block_pos, offset) → 48/16-bit packed virtual offset (BIGINT)."""
    return (
        F.shiftleft(F.col(block_pos) if isinstance(block_pos, str) else block_pos, 16)
        .bitwiseOR((F.col(offset) if isinstance(offset, str) else offset).cast("bigint"))
        .alias("vpos")
    )


def pos_unpack_block(vpos: Column | str) -> Column:
    """packed virtual offset → compressed block position (top 48 bits)."""
    return F.shiftrightunsigned(F.col(vpos) if isinstance(vpos, str) else vpos, 16)


def pos_unpack_offset(vpos: Column | str) -> Column:
    """packed virtual offset → intra-block offset (low 16 bits)."""
    c = F.col(vpos) if isinstance(vpos, str) else vpos
    return c.bitwiseAND(F.lit(0xFFFF)).cast("int")


def pos_distance(
    block_a: Column, off_a: Column, block_b: Column, off_b: Column,
    ratio: float = DEFAULT_COMPRESSION_RATIO,
) -> Column:
    """Approximate uncompressed distance between two virtual positions:
    compressed delta scaled by the estimated compression ratio plus the
    offset delta (Pos.scala:17-22)."""
    return ((block_b - block_a).cast("double") * F.lit(ratio) + (off_b - off_a)).alias("approx_distance")


def format_bytes(n: Column | str) -> Column:
    """Human byte-size string: 1536 → '1.5K' (display helper)."""
    c = (F.col(n) if isinstance(n, str) else n).cast("double")
    return (
        F.when(c >= 1 << 30, F.concat(F.format_number(c / (1 << 30), 1), F.lit("G")))
        .when(c >= 1 << 20, F.concat(F.format_number(c / (1 << 20), 1), F.lit("M")))
        .when(c >= 1 << 10, F.concat(F.format_number(c / (1 << 10), 1), F.lit("K")))
        .otherwise(F.concat(c.cast("bigint").cast("string"), F.lit("B")))
    )


def is_valid_read_name(name: Column | str) -> Column:
    """Read-name alphabet check `^[!-?A-~]+$` (Checker.scala:11-16)."""
    c = F.col(name) if isinstance(name, str) else name
    return c.rlike(r"^[!-?A-~]+$")


def is_valid_cigar_op_int(packed: Column | str) -> Column:
    """cigar uint32 nibble validity: (v & 0xF) <= 8 (eager/Checker.scala:104)."""
    c = F.col(packed) if isinstance(packed, str) else packed
    return c.bitwiseAND(F.lit(0xF)) <= 8


def parse_interval(s: Column | str) -> Column:
    """'1:13000-14000' → STRUCT<contig STRING, start BIGINT, end BIGINT>
    (open end → NULL, resolved against contig lengths downstream, J3)."""
    c = F.col(s) if isinstance(s, str) else s
    end_str = F.regexp_extract(c, r"^[^:]+:\d+-(\d+)$", 1)
    return F.struct(
        F.regexp_extract(c, r"^([^:]+):", 1).alias("contig"),
        F.regexp_extract(c, r"^[^:]+:(\d+)", 1).cast("bigint").alias("start"),
        F.when(end_str == "", None).otherwise(end_str).cast("bigint").alias("end"),
    )
