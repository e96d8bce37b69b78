"""Zero-norm embedding robustness: every cosine query must survive — and
stay oracle-exact on — an embeddings table containing all-zero vectors.

The bug class this pins: under ANSI mode (this deployment's default),
Spark throws DIVIDE_BY_ZERO even for DOUBLE division, so one zero-norm
vector crashed every unguarded ``dot / (||x||·||y||)`` site; with ANSI
off the engines still diverge, because a NULL cosine sorts NULLS LAST in
Spark's DESC but NULLS FIRST in DuckDB's — phantom top-k rows.  The
contract now: cosine is undefined for a zero vector, so such rows are
excluded on BOTH sides (try_divide + NOT NULL filter / HAVING norm > 0).
The sf fixtures contain no zero vectors, which is why the oracle sweeps
never saw it.  The fixture here is sf0.001 with zero vectors appended —
one sharing the query vector's IVF cell (label 5) so the restricted
paths are stressed too.
"""

from __future__ import annotations

import os
import shutil

import pytest

from spark_bam_spark.queries import load_all
from tests.oracle import compare

REGISTRY = load_all()

SF_SRC = "/root/testdata/sf0.001"
_DIM = 64

# (vec_id, embedding, label): label 5 = query vec 0's cell (restricted
# scans see it); label 2 = SRP query vec 77's cell; label 99 puts a pair
# of zero vectors alone in a fresh cell (zero·zero pair in semdedup /
# pairwise paths).
_ZERO_VECS = [
    (800001, [0.0] * _DIM, 5),
    (800002, [0.0] * _DIM, 2),
    (800003, [0.0] * _DIM, 99),
    (800004, [0.0] * _DIM, 99),
]


@pytest.fixture(scope="module")
def zero_norm_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("zero_norm")
    for name in os.listdir(SF_SRC):
        if name.endswith(".parquet") and name != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SRC, name), out / name)
    emb = spark.read.parquet(f"{SF_SRC}/embeddings.parquet")
    extra = spark.createDataFrame(_ZERO_VECS, emb.schema)
    merged = emb.unionAll(extra).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(merged, preserve_index=False), str(out / "embeddings.parquet")
    )
    return str(out)


# Every embedding-consuming oracle query — cosine sites that were
# unguarded, plus the distance/quantize/index family that must stay
# unaffected by the appended rows.
_PINNED = [
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_ivf_pruned",
    "ann_recall_eval",
    "ann_join_topk_per_query",
    "dedup_embedding_cosine",
    "semdedup_prune",
    "srp_recall_eval",
    "pq_recall_eval",
    "ann_pq_adc_topk",
    "quantize_int8_topk",
    "embedding_norm_stats",
    "kmeans_lloyd",
    "ivf_kmeans_probe",
    "dedup_srp_lsh",
]


@pytest.mark.parametrize("name", [n for n in _PINNED if REGISTRY[n].oracle])
def test_embedding_query_oracle_exact_with_zero_vectors(spark, zero_norm_dir, name):
    compare(spark, name, REGISTRY[name], zero_norm_dir)
