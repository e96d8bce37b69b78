"""UDF/UDAF/UDTF surface (SURVEY §2.10): the engine's Python extension
points, used sparingly — built-ins stay the hot path; these exist to
prove the shape (Arrow-batched, per-group/partition init) and are
oracle-checked where the math is portable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.tables import table


def _geo_mean_udf():
    """GROUPED_AGG pandas UDF: geometric mean — whole group arrives as
    one Arrow batch (the reference's per-partition-initialized Checker
    shape, check/.../Checker.scala:22-24, as an aggregate). Built lazily:
    pandas_udf parses its return-type DDL against the active session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(prices: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(prices.to_numpy(dtype="float64")).mean()))

    return geo_mean


@register(
    "pandas_udaf_geomean",
    tags=("udf", "grouped_agg"),
    oracle="""
    SELECT o_orderpriority,
           ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_mean_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF vs DuckDB's exp(avg(ln)) — rounded to 4
    decimals (float64 mean error ~1e-12 at this magnitude)."""
    o = table(spark, sf_dir, "orders")
    geo_mean = _geo_mean_udf()
    return (
        o.groupBy("o_orderpriority")
        .agg(F.round(geo_mean("o_totalprice"), 4).alias("geo_mean_price"))
        .orderBy("o_orderpriority")
    )


def _interval_udtf_cls():
    from pyspark.sql.functions import udtf

    @udtf(returnType="contig: string, start: bigint, end: bigint")
    class ExplodeIntervals:
        """UDTF: interval-list string → one row per parsed interval
        ('1:100-200;2:5-50'), the table-function shape of
        parse_interval (Intervals.scala:44-60)."""

        def eval(self, spec: str):
            for part in (spec or "").split(";"):
                part = part.strip()
                if not part:
                    continue
                contig, _, rng = part.partition(":")
                lo, _, hi = rng.partition("-")
                yield contig, int(lo), int(hi) if hi else None

    return ExplodeIntervals


@register(
    "udtf_explode_intervals",
    tags=("udf", "udtf"),
    oracle="""
    WITH specs AS (
      SELECT DISTINCT CAST(n_nationkey AS VARCHAR) || ':' ||
             CAST(n_nationkey * 100 AS VARCHAR) || '-' ||
             CAST(n_nationkey * 200 AS VARCHAR) || ';X:1-5' AS spec
      FROM nation
    ),
    parts AS (SELECT unnest(string_split(spec, ';')) AS p FROM specs)
    SELECT string_split(p, ':')[1] AS contig,
           CAST(string_split(string_split(p, ':')[2], '-')[1] AS BIGINT) AS start,
           CAST(string_split(string_split(p, ':')[2], '-')[2] AS BIGINT) AS "end"
    FROM parts
    ORDER BY contig, start
    """,
)
def udtf_explode_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over interval-list strings built from nation keys."""
    cls = _interval_udtf_cls()
    spark.udtf.register("explode_intervals", cls)
    n = table(spark, sf_dir, "nation")
    specs = n.select(
        F.concat(
            F.col("n_nationkey").cast("string"),
            F.lit(":"),
            (F.col("n_nationkey") * 100).cast("string"),
            F.lit("-"),
            (F.col("n_nationkey") * 200).cast("string"),
            F.lit(";X:1-5"),
        ).alias("spec")
    ).distinct()
    specs.createOrReplaceTempView("interval_specs")
    return spark.sql(
        "SELECT t.contig, t.start, t.end FROM interval_specs, "
        "LATERAL explode_intervals(spec) t ORDER BY contig, start"
    )


@register(
    "grouped_map_gap_stats",
    tags=("udf", "grouped_map"),
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events
    )
    SELECT user_id,
           COUNT(gap_s) AS n_gaps,
           CAST(FLOOR(MIN(gap_s)) AS BIGINT) AS min_gap_s,
           CAST(FLOOR(MAX(gap_s)) AS BIGINT) AS max_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(gap_s) > 0
    ORDER BY user_id
    """,
)
def grouped_map_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_MAP applyInPandas: each user's full history arrives as one
    pandas frame (the per-group state shape — §2.10). Emits integer gap
    extremes so the oracle (plain window SQL) matches exactly; the pandas
    body is where nontrivial per-entity logic (curve fitting, sequence
    models) would run at scale."""
    import pandas as pd

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        g = pdf["ts"].diff().dt.total_seconds().dropna()
        if g.empty:
            return pd.DataFrame(columns=["user_id", "n_gaps", "min_gap_s", "max_gap_s"])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(g)],
                "min_gap_s": [int(g.min())],
                "max_gap_s": [int(g.max())],
            }
        )

    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return (
        e.groupBy("user_id")
        .applyInPandas(gaps, schema="user_id bigint, n_gaps bigint, min_gap_s bigint, max_gap_s bigint")
        .orderBy("user_id")
    )
