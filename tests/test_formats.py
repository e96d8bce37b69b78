"""Multi-format source/sink parity: the engine's tables round-trip through
Spark's built-in JSONL / CSV / ORC writers and readers without losing rows
or values (parquet is the primary format; these are the interchange paths a
pipeline actually uses for ingest/export at the edges).

Each test writes from the parquet source, reads back with an explicit
schema (CSV/JSON infer types lossily otherwise), and compares the full
row multiset — not just counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_bam_spark.tables import table


def _multiset(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_documents_roundtrip_jsonl(spark, sf_small, tmp_path):
    src = table(spark, sf_small, "documents")
    out = f"{tmp_path}/docs_jsonl"
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    assert _multiset(back, src.columns) == _multiset(src, src.columns)


def test_documents_roundtrip_csv_with_quoting(spark, sf_small, tmp_path):
    src = table(spark, sf_small, "documents")
    out = f"{tmp_path}/docs_csv"
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(src.schema).option("header", True).csv(out)
    assert _multiset(back, src.columns) == _multiset(src, src.columns)


# Spark's text-format writers default to MILLISECOND timestamp patterns
# (yyyy-MM-dd'T'HH:mm:ss[.SSS]); microsecond data silently truncates
# without an explicit format — the classic interchange hazard these tests
# pin (parquet/orc carry micros natively and don't need it).
_TS_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_TS_US_NTZ = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _ts_opts(rw):
    # events.ts can surface as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false),
    # and the text writers consult timestampNTZFormat for NTZ columns while
    # ignoring timestampFormat — set BOTH or micros silently truncate.
    return rw.option("timestampFormat", _TS_US).option("timestampNTZFormat", _TS_US_NTZ)


def test_events_roundtrip_jsonl_preserves_timestamps_and_json(spark, sf_small, tmp_path):
    # props holds embedded JSON (commas, braces, quotes) and ts is a
    # microsecond timestamp — the two classic interchange hazards
    src = table(spark, sf_small, "events")
    out = f"{tmp_path}/events_jsonl"
    _ts_opts(src.write.mode("overwrite")).json(out)
    back = _ts_opts(spark.read.schema(src.schema)).json(out)
    cols = src.columns
    assert _multiset(back, cols) == _multiset(src, cols)


def test_events_roundtrip_csv_escapes_embedded_json(spark, sf_small, tmp_path):
    src = table(spark, sf_small, "events")
    out = f"{tmp_path}/events_csv"
    # explicit escape option: embedded quotes in props must survive
    _ts_opts(src.write.mode("overwrite").option("header", True).option("escape", '"')).csv(out)
    back = _ts_opts(
        spark.read.schema(src.schema).option("header", True).option("escape", '"')
    ).csv(out)
    assert _multiset(back, src.columns) == _multiset(src, src.columns)


def test_embeddings_roundtrip_orc_with_arrays(spark, sf_small, tmp_path):
    # array<float> columns: ORC is the interchange format that supports
    # them natively (CSV cannot)
    src = table(spark, sf_small, "embeddings")
    out = f"{tmp_path}/emb_orc"
    src.write.mode("overwrite").orc(out)
    back = spark.read.schema(src.schema).orc(out)
    a = sorted(
        (r["vec_id"], r["label"], tuple(r["embedding"])) for r in src.collect()
    )
    b = sorted(
        (r["vec_id"], r["label"], tuple(r["embedding"])) for r in back.collect()
    )
    assert a == b


def test_query_results_identical_across_source_formats(spark, sf_small, tmp_path):
    # the engine's own operators must not care which format fed them:
    # run the same agg over parquet-, jsonl- and orc-sourced frames
    src = table(spark, sf_small, "documents")
    j, o = f"{tmp_path}/d_json", f"{tmp_path}/d_orc"
    src.write.mode("overwrite").json(j)
    src.write.mode("overwrite").orc(o)

    def agg(df):
        return sorted(
            map(
                tuple,
                df.groupBy("source")
                .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
                .collect(),
            )
        )

    expected = agg(src)
    assert agg(spark.read.schema(src.schema).json(j)) == expected
    assert agg(spark.read.schema(src.schema).orc(o)) == expected


def test_csv_scan_still_prunes_and_pushes(spark, sf_small, tmp_path):
    # format breadth must not cost plan quality: the CSV scan should keep
    # column pruning (ReadSchema) active
    src = table(spark, sf_small, "documents")
    out = f"{tmp_path}/docs_csv_plan"
    src.write.mode("overwrite").option("header", True).csv(out)
    df = (
        spark.read.schema(src.schema)
        .option("header", True)
        .csv(out)
        .filter(F.col("n_chars") > 100)
        .select("doc_id", "n_chars")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in read_schema and "text" not in read_schema
