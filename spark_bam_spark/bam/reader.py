"""Default BAM read-path dispatch: JVM DataSourceV2 first, Python fallback.

The engine ships two implementations of the splittable BAM scan with
identical schema, split-ownership rule, and record-boundary checker:

- the JVM-native DataSourceV2 (``bam/jvmsrc/bamjvm/``) decodes inside the
  executor JVM — measured 2.8x the Python source at 20M records on
  local[32], with the gap widening with scale (tools/run_jvm_ab.py) —
  the same execution shape the reference uses (load/.../CanLoadBam.scala
  runs its codec JVM-side; cited as behavior);
- the Python Data Source (``bam/datasource.py``) needs no JDK compiler
  and remains the differential oracle for the JVM twin.

``read_bam`` is the engine's single entry point (queries, CLI, loadReads
dispatch): it routes to the JVM reader whenever one can be built, with

- ``SPARK_GRAFT_BAM_READER=py``  forcing the Python source (A/B runs,
  fallback drills), and
- ``SPARK_GRAFT_BAM_READER=jvm`` forcing the JVM reader (build errors
  surface instead of being masked by fallback).

Both read paths carry driver-grade oracle evidence (CORRECTNESS_r08:
``bam_scan_reads_jvm`` + ``bam_interval_pushdown_jvm`` hash-green next to
the Python-path twins), which was the precondition for making the JVM
reader the default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def reader_choice() -> str:
    """'jvm' | 'py' — the env override wins; otherwise jvm when buildable."""
    env = os.environ.get("SPARK_GRAFT_BAM_READER", "").strip().lower()
    if env in ("py", "python"):
        return "py"
    if env in ("jvm", "java"):
        return "jvm"
    from spark_bam_spark.bam import jvmreader

    return "jvm" if jvmreader.available() else "py"


def read_bam(
    spark: SparkSession,
    path: str,
    split_size: int | None = None,
    columns: str | None = None,
    mode: str | None = None,
    ranges: str | None = None,
    reads_to_check: int | None = None,
    max_read_size: int | None = None,
    compression_ratio: float | None = None,
    reader: str | None = None,
    **py_only_options,
) -> DataFrame:
    """DataFrame of reads over a BAM file/directory via the default
    (JVM-first) read path.  ``columns`` is a comma-separated projection:
    the JVM reader prunes via Catalyst (SupportsPushDownRequiredColumns),
    the Python source via its explicit ``columns`` option.  Options only
    the Python source understands (e.g. ``batch_records``) force the
    Python path."""
    if mode is not None and mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    choice = reader or ("py" if py_only_options else reader_choice())
    if choice == "jvm" and py_only_options:
        raise ValueError(
            f"options {sorted(py_only_options)} are Python-source-only and cannot "
            "be combined with reader='jvm'"
        )
    if choice == "jvm":
        from spark_bam_spark.bam.jvmreader import read_bam_jvm

        df = read_bam_jvm(
            spark,
            path,
            split_size=split_size,
            reads_to_check=reads_to_check,
            max_read_size=max_read_size,
            mode=mode,
            ranges=ranges,
            compression_ratio=compression_ratio,
        )
        if columns:
            df = df.select(*[c.strip() for c in columns.split(",")])
        return df
    from spark_bam_spark.bam.datasource import register

    register(spark)
    rdr = spark.read.format("bam")
    opts = {
        "split_size": split_size,
        "columns": columns,
        "mode": mode,
        "ranges": ranges,
        "reads_to_check": reads_to_check,
        "max_read_size": max_read_size,
        "compression_ratio": compression_ratio,
        **py_only_options,
    }
    for k, v in opts.items():
        if v is not None:
            rdr = rdr.option(k, str(v))
    return rdr.load(path)


def read_bam_stream(
    spark: SparkSession,
    path: str,
    split_size: int | None = None,
    mode: str | None = None,
    reader: str | None = None,
    max_file_age_ms: int | None = None,
    max_files_per_batch: int | None = None,
    max_bytes_per_batch: int | None = None,
    **py_only_options,
) -> DataFrame:
    """Streaming DataFrame over a BAM landing directory via the default
    (JVM-first) path — the streaming mirror of :func:`read_bam`'s
    dispatch.  The JVM source (jvmreader.read_bam_stream) is the scale
    path: O(1) checkpointed offsets over a compacted metadata log plus
    the admission-control surface (``max_file_age_ms``,
    ``max_files_per_batch``, ``max_bytes_per_batch``, Spark ReadLimits).
    The Python twin (:func:`read_bam_stream_py`) is the no-JDK fallback
    with none of those knobs — requesting one under ``reader="py"`` (or
    with no JDK available) raises instead of silently ignoring it."""
    admission = {
        "max_file_age_ms": max_file_age_ms,
        "max_files_per_batch": max_files_per_batch,
        "max_bytes_per_batch": max_bytes_per_batch,
    }
    choice = reader or ("py" if py_only_options else reader_choice())
    wanted = sorted(k for k, v in admission.items() if v is not None)
    if choice == "jvm":
        if py_only_options:
            raise ValueError(
                f"options {sorted(py_only_options)} are Python-source-only and "
                "cannot be combined with reader='jvm'"
            )
        from spark_bam_spark.bam.jvmreader import read_bam_stream as _jvm_stream

        return _jvm_stream(spark, path, split_size=split_size, mode=mode, **admission)
    if wanted:
        raise ValueError(
            f"options {wanted} need the JVM streaming source "
            f"(resolved reader={choice!r}; the Python twin has no admission control)"
        )
    return read_bam_stream_py(spark, path, split_size=split_size, mode=mode, **py_only_options)


def read_bam_stream_py(
    spark: SparkSession,
    path: str,
    split_size: int | None = None,
    columns: str | None = None,
    mode: str | None = None,
    **py_only_options,
) -> DataFrame:
    """Structured Streaming DataFrame over a landing directory via the
    PYTHON source (datasource.BamStreamReader) — the no-JDK fallback and
    the differential oracle the tests run against the JVM streaming
    source (jvmreader.read_bam_stream).  Same rows, same decoder; see
    BamStreamReader's docstring for the deliberate offset-format
    asymmetry (self-describing name-set offsets vs the JVM source's O(1)
    batch id + compacted log).  Note: the Python Data Source API has no
    SupportsTriggerAvailableNow, so ``trigger(availableNow=True)`` falls
    back to single-batch execution (Spark logs a warning) — the drain
    semantics for a quiescent landing dir are the same."""
    if mode is not None and mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    from spark_bam_spark.bam.datasource import register

    register(spark)
    rdr = spark.readStream.format("bam")
    opts = {"split_size": split_size, "columns": columns, "mode": mode, **py_only_options}
    for k, v in opts.items():
        if v is not None:
            rdr = rdr.option(k, str(v))
    return rdr.load(path)


def writer_choice() -> str:
    """'jvm' | 'py' — the env override wins; otherwise jvm when buildable.

    Mirrors :func:`reader_choice` for the WRITE side
    (``SPARK_GRAFT_BAM_WRITER=py|jvm``): the JVM DSv2 sink
    (bamjvm/BamWriteSupport.java) encodes rows in the executor JVM with
    O(block) memory and task-retry-safe rename-on-commit; the Python Data
    Source writer (bam/datasource.py BamWriter) remains the no-JDK
    fallback and the differential oracle (both emit byte-identical
    uncompressed streams for the same options)."""
    env = os.environ.get("SPARK_GRAFT_BAM_WRITER", "").strip().lower()
    if env in ("py", "python"):
        return "py"
    if env in ("jvm", "java"):
        return "jvm"
    from spark_bam_spark.bam import jvmreader

    return "jvm" if jvmreader.available() else "py"


def write_bam_df(
    df: DataFrame,
    path: str,
    contigs: str = "",
    block_payload: int | None = None,
    bai: bool = False,
    mode: str = "append",
    deflate_level: int | None = None,
    writer: str | None = None,
) -> str:
    """Write a reads DataFrame as a directory of part-BAMs via the default
    (JVM-first) write path; returns the implementation used ('jvm'|'py').

    Accepts any subset of the logical read-schema columns; missing columns
    and NULLs take the spec defaults in both implementations.  ``contigs``
    is ``name:length,...`` for the header's @SQ lines (and rname→ref_idx
    resolution when the frame has no ref_idx column).

    ``bai=True`` also emits a spec §5.2 BAI index per part file as a
    running side effect of the write — the writer owns every record's
    exact virtual offset — so interval queries over the rewritten output
    get indexed pushdown with no separate indexing pass (at 100 TB, the
    difference between a pruned scan and a full one).  Both writers
    emit it (byte-identical for identical part bytes); both reject
    partitions that are not coordinate-sorted."""
    choice = writer or writer_choice()
    if choice not in ("jvm", "py"):
        raise ValueError(f"writer must be jvm|py, got {choice!r}")
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    if choice == "jvm":
        from spark_bam_spark.bam import jvmreader

        jvmreader.ensure_session(spark)
        w = df.write.format(jvmreader.FORMAT)
    else:
        from spark_bam_spark.bam.datasource import register

        register(spark)
        w = df.write.format("bam")
    if bai:
        w = w.option("bai", "true")
    if contigs:
        w = w.option("contigs", contigs)
    if block_payload is not None:
        w = w.option("block_payload", str(block_payload))
    if deflate_level is not None:
        # throughput/size knob, identical deflate in both writers (zlib);
        # level 1 trades ~15% larger files for less CPU per block at scale
        w = w.option("deflate_level", str(deflate_level))
    w.mode(mode).save(path)
    return choice


def read_blocks(
    spark: SparkSession,
    path: str,
    split_size: int | None = None,
    ranges: str | None = None,
    reader: str | None = None,
) -> DataFrame:
    """BGZF blocks-metadata DataFrame (S9) via the default (JVM-first)
    path — same dispatch rules as :func:`read_bam`."""
    choice = reader or reader_choice()
    if choice == "jvm":
        from spark_bam_spark.bam.jvmreader import read_blocks_jvm

        return read_blocks_jvm(spark, path, split_size=split_size, ranges=ranges)
    from spark_bam_spark.bam.datasource import register

    register(spark)
    rdr = spark.read.format("bgzf_blocks")
    if split_size is not None:
        rdr = rdr.option("split_size", str(split_size))
    if ranges is not None:
        rdr = rdr.option("ranges", ranges)
    return rdr.load(path)
