"""Z-order layout: interleave math, bounded tile spans, and the payoff —
parquet file/row-group stats tight enough to skip on EITHER dimension."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spark_bam_spark.operators.layout import (
    BITS,
    _interleave_terms,
    quantize_sql,
    zorder_key,
    zorder_write,
)


def _quantized_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bounds = ev.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return ev.crossJoin(F.broadcast(bounds)).select(
        F.expr(quantize_sql("user_id", "umin", "umax")).alias("qx"),
        F.expr(quantize_sql("value", "vmin", "vmax")).alias("qy"),
    )


def test_interleave_bijective_on_quantized_domain(spark):
    # every (qx, qy) in 0..2^BITS-1 maps to a distinct z-key covering
    # exactly 0..2^(2*BITS)-1: the interleave is a bijection
    n = 1 << BITS
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("int").alias("qx"),
            (F.col("id") / n).cast("int").alias("qy"),
        )
        .select(zorder_key("qx", "qy").alias("z"))
    )
    stats = df.agg(
        F.count_distinct("z").alias("nd"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).first()
    assert (stats["nd"], stats["lo"], stats["hi"]) == (n * n, 0, n * n - 1)


def test_zorder_tiles_bound_both_dims(spark, sf_small):
    # a contiguous z range (bucket of 256 keys) is a 16x16 tile: span of
    # BOTH quantized dims inside any bucket is < 16 of 256 steps
    q = _quantized_events(spark, sf_small)
    z = q.select("qx", "qy", F.expr(_interleave_terms("qx", "qy")).alias("z"))
    spans = (
        z.groupBy((F.col("z") / 256).cast("long").alias("bucket"))
        .agg(
            (F.max("qx") - F.min("qx")).alias("sx"),
            (F.max("qy") - F.min("qy")).alias("sy"),
        )
        .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
        .first()
    )
    assert spans["mx"] <= 15 and spans["my"] <= 15


def test_zorder_write_prunes_both_dims(spark, sf_small, tmp_path):
    """After zorder_write, per-FILE min/max stats are narrow on BOTH
    columns — a filter on either skips most files. After a single-column
    sort, only the sorted column skips."""
    q = _quantized_events(spark, sf_small)
    n_files = 8

    zpath = str(tmp_path / "zordered")
    zorder_write(q, zpath, "qx", "qy", n_files=n_files)

    spath = str(tmp_path / "single_sorted")
    q.repartitionByRange(n_files, "qx").sortWithinPartitions("qx").write.mode(
        "overwrite"
    ).parquet(spath)

    def file_spans(path):
        sx, sy = [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            lo_x = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
            hi_x = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
            lo_y = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
            hi_y = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
            sx.append(hi_x - lo_x)
            sy.append(hi_y - lo_y)
        return sum(sx) / len(sx), sum(sy) / len(sy)

    z_sx, z_sy = file_spans(zpath)
    s_sx, s_sy = file_spans(spath)

    full = (1 << BITS) - 1
    # z-order: both dims clustered — every file covers a small fraction
    assert z_sx < full / 2 and z_sy < full / 2, (z_sx, z_sy)
    # single-column sort: its own column is tighter, the OTHER column is
    # not clustered at all (near-full span per file)
    assert s_sx < full / 4
    assert s_sy > full * 0.6
    # and z-order's off-column clustering beats single-sort's by a lot
    assert z_sy < s_sy / 2


def test_quantize_clamps_and_is_monotonic(spark):
    df = spark.range(1).select(
        F.lit(0.0).alias("lo"), F.lit(9.0).alias("hi"),
        F.lit(-5.0).alias("below"), F.lit(50.0).alias("above"),
        F.lit(3.0).alias("mid"),
    )
    r = df.select(
        F.expr(quantize_sql("below", "lo", "hi")).alias("b"),
        F.expr(quantize_sql("above", "lo", "hi")).alias("a"),
        F.expr(quantize_sql("mid", "lo", "hi")).alias("m"),
    ).first()
    assert r["b"] == 0
    assert r["a"] == 255
    assert 0 < r["m"] < 255


@pytest.mark.parametrize("qx,qy,expect", [(0, 0, 0), (1, 0, 1), (0, 1, 2), (255, 255, 65535)])
def test_interleave_known_values(spark, qx, qy, expect):
    r = (
        spark.range(1)
        .select(F.lit(qx).alias("qx"), F.lit(qy).alias("qy"))
        .select(zorder_key("qx", "qy").alias("z"))
        .first()
    )
    assert r["z"] == expect
