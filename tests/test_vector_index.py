"""Materialized IVF vector index (index/vector.py): build → persist →
partition-pruned probe must equal the in-memory IVF bit-for-bit, the
exhaustive probe must equal the exact top-k, and the probe plan must
actually prune cell partitions."""

import pytest
from pyspark.sql import functions as F

from dragnet_spark.index.vector import (
    build_vector_index,
    load_vector_index_meta,
    query_vector_index,
)
from dragnet_spark.ops.similarity import cosine_topk, ivf_topk
from dragnet_spark.sources.tables import load_table
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def vindex(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vindex"))
    emb = load_table(spark, sf_dir, "embeddings")
    meta = build_vector_index(spark, emb, path, n_centroids=8, seed=42)
    return path, emb, meta


def test_build_writes_meta_and_cells(vindex):
    path, _, meta = vindex
    assert meta["n_centroids"] == 8
    assert load_vector_index_meta(path)["centroids"] == meta["centroids"]


def test_index_matches_inmemory_ivf(spark, vindex):
    path, emb, meta = vindex
    q = emb.filter(F.col("vec_id") < 8)
    got = rows_set(query_vector_index(spark, path, q, k=3, n_probe=2))
    want = rows_set(
        ivf_topk(
            emb, q, k=3, n_centroids=8, n_probe=2,
            centroids=meta["centroids"],
        )
    )
    assert got == want and got


def test_exhaustive_probe_equals_exact_topk(spark, vindex):
    path, emb, _ = vindex
    q = emb.filter(F.col("vec_id") < 8)
    got = rows_set(query_vector_index(spark, path, q, k=3, n_probe=8))
    want = rows_set(cosine_topk(emb, q, k=3))
    assert got == want and got


def test_probe_plan_prunes_cell_partitions(spark, vindex):
    path, emb, _ = vindex
    q = emb.filter(F.col("vec_id") < 2)
    df = query_vector_index(spark, path, q, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1][:200], "cell filter did not reach the parquet partition pruning"


def test_max_queries_contract(spark, vindex):
    path, emb, _ = vindex
    with pytest.raises(ValueError, match="max_queries"):
        query_vector_index(
            spark, path, emb.limit(40), k=1, max_queries=32
        )


def test_empty_query_batch(spark, vindex):
    path, emb, _ = vindex
    out = query_vector_index(
        spark, path, emb.filter(F.col("vec_id") < 0), k=3
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
