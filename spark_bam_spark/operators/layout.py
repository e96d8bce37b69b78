"""Z-order (Morton) data layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet row-group min/max statistics prune a scan only if rows with
similar values are physically adjacent. A single-column sort clusters
one dimension and destroys the other; interleaving the bits of both
quantized dimensions (the Morton/Z curve) bounds the per-file span of
EVERY interleaved dimension, so predicates on any of them skip files.

The reference has no layout machinery (its BAM inputs arrive
pre-sorted by coordinate — effectively a 1-D layout; Pos packing,
bgzf/pos.py parity, is the same bits-into-one-long idea for ordering).
This module generalizes it to N=2 dimensions for the parquet side.

Everything is built-in JVM expressions — the z-key is shifts/ORs, so
the sort runs at scan speed with whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # per-dimension quantization bits; z-key uses 2*BITS


def _interleave_terms(qx: str, qy: str, bits: int = BITS) -> str:
    """SQL expression interleaving the low ``bits`` of qx (even
    positions) and qy (odd positions) — identical text works in Spark
    SQL and DuckDB (both use >> << & | on integers)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def quantize_sql(col: str, lo: str, hi: str, bits: int = BITS) -> str:
    """Map col from [lo, hi] onto 0..2^bits-1 (engine-portable text:
    same double arithmetic, floor before any cast so truncating and
    rounding casts agree)."""
    n = 1 << bits
    return (
        f"least({n - 1}, greatest(0, cast(floor("
        f"({col} - {lo}) * {n}.0 / ({hi} - {lo} + 1)) as int)))"
    )


def zorder_key(qx: str, qy: str, bits: int = BITS) -> Column:
    """Morton key column from two already-quantized int column names."""
    return F.expr(_interleave_terms(qx, qy, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    qx: str,
    qy: str,
    n_files: int = 8,
    bits: int = BITS,
) -> None:
    """Write df z-ordered on two quantized int columns: range-partition
    on the z-key (each output file owns a contiguous z range = a tile
    with bounded span in BOTH dims), sort within partitions so parquet
    row-group stats are tight. One extra shuffle at write time buys
    min/max pruning on either column for every future scan."""
    keyed = df.withColumn("__z", zorder_key(qx, qy, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
