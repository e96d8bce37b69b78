"""The format layer: a splittable, parallel BAM scan for Spark.

Re-expresses the reference's product core (spark-bam: parallel split
computation + record-boundary validity checking, docs/motivation.md:3-52)
twice, behind one dispatching entry point (``reader.read_bam``):

- a JVM DataSourceV2 reader (``jvmsrc/bamjvm/``, built on demand by
  ``jvmreader``) — the DEFAULT since r9: decode runs compiled in the
  executor JVM, the reference's own execution shape;
- a PySpark Python DataSource (``datasource``,
  ``spark.read.format("bam")``) — the no-JDK fallback and the
  differential oracle the JVM twin is pinned against row-for-row.

Both return the same plain DataFrame of reads; split computation happens
on executors; the boundary checker is a pure function shared by spec.

Modules:
    bgzf        — BGZF block layer (public BGZF spec, SAM/BAM spec §4.1)
    records     — BAM record binary encode/decode (spec §4.2)
    checker     — record-boundary validity predicates (eager + full)
    writer      — BAM writer + sidecar ground truth + fixture generator
    datasource  — Python DataSource/Reader/Writer classes + registration
    jvmreader   — on-demand javac build + ADD JAR wiring for the JVM twin
    reader      — the default-path dispatch (read_bam / read_blocks)
"""

from spark_bam_spark.bam.bgzf import Pos  # noqa: F401
