"""The format layer: a splittable, parallel BAM scan for Spark.

Re-expresses the reference's product core (spark-bam: parallel split
computation + record-boundary validity checking, docs/motivation.md:3-52)
as a PySpark Python DataSource: ``spark.read.format("bam")`` returns a
plain DataFrame of reads; split computation happens on executors inside
``DataSourceReader.read``; the boundary checker is a pure function.

Modules:
    bgzf        — BGZF block layer (public BGZF spec, SAM/BAM spec §4.1)
    records     — BAM record binary encode/decode (spec §4.2)
    checker     — record-boundary validity predicates (eager + full)
    writer      — BAM writer + sidecar ground truth + fixture generator
    datasource  — DataSource/Reader/Writer classes + registration
"""

from spark_bam_spark.bam.bgzf import Pos  # noqa: F401
