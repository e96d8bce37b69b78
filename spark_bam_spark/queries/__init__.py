"""Operator/query registry.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL string the DuckDB
oracle runs over the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are computed in DECIMAL and cast to DOUBLE at
  the end (exact, order-independent, identical across engines), or rounded;
- timestamps in outputs are cast to DATE or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    headline: bool = False  # included in bench.py timings
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def ensure_session_ready(spark: SparkSession) -> None:
    """Make an externally-provided SparkSession usable by our queries:
    runtime-settable SQL confs + ship the package to Python workers.
    (The driver builds its own session; we cannot rely on our factory.)"""
    if getattr(spark, "_spark_bam_spark_ready", False):
        return
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.python.filterPushdown.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # Pin the unqualified `timestamp` type to LTZ so casts used for
        # epoch arithmetic (unix_micros) resolve the same way regardless
        # of host-session conf; NTZ→LTZ is exact under the UTC timezone.
        ("spark.sql.timestampType", "TIMESTAMP_LTZ"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass  # non-runtime-settable in this deployment; proceed
    try:
        from spark_bam_spark.session import _ship_package

        _ship_package(spark)
    except Exception:
        pass
    spark._spark_bam_spark_ready = True


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_ready(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), headline=headline, tags=tags)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so REGISTRY is fully populated."""
    from spark_bam_spark.queries import (  # noqa: F401
        bam_qa,
        dedup,
        graph,
        mlprep,
        multimodal_q,
        relational,
        scalar_fn,
        similarity,
        streaming_batch,
        text,
        tpch,
        udf_surface,
    )

    return REGISTRY
