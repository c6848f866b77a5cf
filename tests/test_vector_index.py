"""Materialized IVF vector index (index/vector.py): build → persist →
partition-pruned probe must equal the in-memory IVF bit-for-bit, the
exhaustive probe must equal the exact top-k, and the probe plan must
actually prune cell partitions."""

# multi-minute store/ladder/soak tier: deselected from the default
# gate (pytest.ini addopts) so the driver's suite run completes;
# run with `pytest -m slow` (the builder's sessions do).
pytestmark = __import__("pytest").mark.slow

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


@pytest.fixture(scope="module")
def vindex_q(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vindexq"))
    emb = load_table(spark, sf_dir, "embeddings")
    meta = build_vector_index(
        spark, emb, path, n_centroids=8, seed=42, quantize=True
    )
    return path, emb, meta


def test_quantized_store_schema_and_size(spark, vindex, vindex_q):
    """The quantized store persists int8 codes + scale (never float
    arrays) and its on-disk bytes drop ~4x vs the float store."""
    import os

    pathf, _, _ = vindex
    pathq, _, meta = vindex_q
    assert meta["quantized"] is True
    qdf = spark.read.parquet(os.path.join(pathq, "vectors"))
    dt = dict(qdf.dtypes)
    assert dt["qvec"] == "array<tinyint>" and dt["scale"] == "double"
    assert "embedding" not in dt

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(p, "vectors"))
            for f in fs
            if f.endswith(".parquet")
        )
    # ~2.5x at this tiny SF (per-file parquet overhead dilutes it;
    # asymptotically float32->int8 is 4x). Pin the floor, record the
    # measured sf0.1 number in BASELINE.md.
    ratio = du(pathf) / du(pathq)
    assert ratio >= 2.0, f"quantized store only {ratio:.2f}x smaller"


def test_quantized_exhaustive_probe_matches_dequantized_exact(
    spark, vindex_q
):
    """n_probe == n_centroids over the quantized store == exact top-k
    over dequantized vectors (the registry oracle's chain), exactly."""
    from dragnet_spark.ops.similarity import quantize_embeddings

    path, emb, _ = vindex_q
    deq = quantize_embeddings(emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            "qvec", lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    q = deq.filter(F.col("vec_id") < 8)
    got = rows_set(query_vector_index(spark, path, q, k=3, n_probe=8))
    want = rows_set(cosine_topk(deq, q, k=3))
    assert got == want and got


def test_quantized_pruned_probe_recall_pin(spark, vindex, vindex_q):
    """Pruned quantized probe keeps >=0.9 top-5 recall vs the float
    index at the SAME n_probe (mirrors the test_ops int8 pin). Same
    seed + training vectors -> same centroids -> identical candidate
    sets, so the recall delta isolates quantization's ranking effect."""
    pathf, emb, _ = vindex
    pathq, _, _ = vindex_q
    q = emb.filter(F.col("vec_id") < 20)
    f_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in query_vector_index(
            spark, pathf, q, k=5, n_probe=4
        ).collect()
    }
    q_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in query_vector_index(
            spark, pathq, q, k=5, n_probe=4
        ).collect()
    }
    recall = len(f_pairs & q_pairs) / len(f_pairs)
    assert recall >= 0.9, f"quantized pruned recall {recall:.3f}"


@pytest.mark.parametrize("quantize", [False, True])
def test_append_then_probe_equals_rebuild_same_centroids(
    spark, sf_dir, tmp_path_factory, quantize
):
    """VERDICT r5 #3: build from batch 1, append batches 2..K against
    the PERSISTED centroids; probing must equal a fresh rebuild over
    the union with the same centroids, exactly."""
    from dragnet_spark.index.vector import (
        append_vector_index,
        vector_index_cell_stats,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(200)
    )
    n0 = emb.count()
    base = str(tmp_path_factory.mktemp(f"vappend{int(quantize)}"))
    inc_path, re_path = base + "/inc", base + "/rebuild"

    meta = build_vector_index(
        spark, emb, inc_path, n_centroids=8, seed=7, quantize=quantize
    )
    batches = [
        emb.select(
            (F.col("vec_id") + F.lit(1000 * i)).alias("vec_id"),
            "embedding",
        )
        for i in range(1, 4)
    ]
    for b in batches:
        append_vector_index(spark, b, inc_path)

    union = emb
    for b in batches:
        union = union.unionByName(b)
    build_vector_index(
        spark, union, re_path, quantize=quantize,
        centroids=meta["centroids"],
    )

    q = emb.filter(F.col("vec_id") < 10)
    got = rows_set(query_vector_index(spark, inc_path, q, k=5, n_probe=3))
    want = rows_set(query_vector_index(spark, re_path, q, k=5, n_probe=3))
    assert got == want and got

    stats = {
        r["cell"]: r["n_vectors"]
        for r in vector_index_cell_stats(spark, inc_path).collect()
    }
    assert sum(stats.values()) == n0 * 4


def test_compact_and_recenter(spark, sf_dir, tmp_path_factory):
    """compact_vector_index cuts file counts without changing any
    probe answer; recenter_vector_index retrains on current contents
    and the recentered index still answers exactly at full probe."""
    import os

    from dragnet_spark.index.vector import (
        append_vector_index,
        compact_vector_index,
        load_vector_index_meta,
        recenter_vector_index,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(200)
    )
    path = str(tmp_path_factory.mktemp("vmaint"))
    build_vector_index(spark, emb, path, n_centroids=8, seed=3, quantize=True)
    for i in (1, 2):
        append_vector_index(
            spark,
            emb.selectExpr(f"vec_id + {i}000000 AS vec_id", "embedding"),
            path,
        )
    q = emb.filter(F.col("vec_id") < 8)
    before = rows_set(query_vector_index(spark, path, q, k=3, n_probe=8))

    def n_files(p):
        return sum(
            1 for root, _, fs in os.walk(os.path.join(p, "vectors"))
            for f in fs if f.endswith(".parquet")
        )
    files_before = n_files(path)
    compact_vector_index(spark, path)
    assert n_files(path) < files_before
    assert rows_set(query_vector_index(spark, path, q, k=3, n_probe=8)) == before

    # recenter: fresh centroids over 3x contents; exhaustive probe is
    # still exact (cell layout changed, answers must not)
    meta = recenter_vector_index(spark, path, n_centroids=8)
    assert meta["quantized"] is True
    assert load_vector_index_meta(path)["centroids"] == meta["centroids"]
    assert rows_set(query_vector_index(spark, path, q, k=3, n_probe=8)) == before


def test_layout_meta_mismatch_raises(spark, sf_dir, tmp_path_factory):
    """A maintenance crash between the vectors swap and the meta
    replace leaves layout and metadata disagreeing; the probe must
    fail loudly, never score against the wrong centroids."""
    import json
    import os

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(50)
    )
    path = str(tmp_path_factory.mktemp("vtok"))
    build_vector_index(spark, emb, path, n_centroids=4, seed=11)
    meta_path = os.path.join(path, "_vector_index.json")
    meta = json.load(open(meta_path))
    meta["layout_token"] = "deadbeefdeadbeef"  # stale meta, new layout
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="layout/meta mismatch"):
        query_vector_index(
            spark, path, emb.filter(F.col("vec_id") < 2), k=1
        )


def test_midrun_recenter_in_appender(spark, sf_dir, tmp_path_factory):
    """VERDICT r8 #2: the foreachBatch appender's every-N-batches skew
    check recenters MID-RUN — balanced batches leave the layout alone,
    a drift batch past the trigger retrains in-loop, subsequent
    appends land on the new centroids, and the store answers exactly
    at full probe afterwards (no rows lost, no stale-centroid cells)."""
    import numpy as np

    from dragnet_spark.index.vector import (
        load_vector_index_meta,
        vector_index_skew,
    )
    from dragnet_spark.ops.similarity import cosine_topk_blocked
    from dragnet_spark.streaming.pipeline import make_vindex_appender

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(200)
    )
    path = str(tmp_path_factory.mktemp("vmidrun"))
    build_vector_index(spark, emb, path, n_centroids=8, seed=7, quantize=True)
    tok0 = load_vector_index_meta(path)["layout_token"]
    app = make_vindex_appender(path, recenter_trigger=4.0, recenter_every=1)

    # balanced batch: check runs, skew under trigger, no recenter
    app(emb.selectExpr("vec_id + 1000000 AS vec_id", "embedding"), 0)
    assert load_vector_index_meta(path)["layout_token"] == tok0

    # drift batch: one tight cluster ~3x the store in one direction
    base = np.asarray(emb.first()["embedding"], dtype=np.float64)
    hot = base / np.linalg.norm(base)
    rng = np.random.RandomState(11)
    drift = spark.createDataFrame(
        [(2_000_000 + i, (hot * 20 + rng.standard_normal(len(base))).tolist())
         for i in range(1200)],
        "vec_id long, embedding array<double>",
    )
    app(drift, 1)
    tok1 = load_vector_index_meta(path)["layout_token"]
    assert tok1 != tok0, "in-loop skew check did not recenter"
    assert vector_index_skew(spark, path) < 4.0

    # post-recenter append lands on the NEW centroids and probes exact
    app(emb.selectExpr("vec_id + 3000000 AS vec_id", "embedding"), 2)
    store = spark.read.parquet(f"{path}/vectors")
    assert store.count() == 200 + 200 + 1200 + 200
    meta = load_vector_index_meta(path)
    dq = store.select(
        F.col("vec_id"),
        F.transform("qvec", lambda qv: qv.cast("double") * F.col("scale"))
        .alias("embedding"),
    )
    q = emb.filter(F.col("vec_id") < 4)
    got = rows_set(
        query_vector_index(spark, path, q, k=3, n_probe=meta["n_centroids"])
    )
    want = rows_set(cosine_topk_blocked(dq, q, k=3))
    assert got and got == want


def test_auto_cell_count_policy():
    """Growth-only, ceil(rows/target), clamped, deterministic."""
    from dragnet_spark.index.vector import auto_cell_count

    assert auto_cell_count(1000, 4, 100) == 10       # grows to ceil
    assert auto_cell_count(1001, 4, 100) == 11       # ceil, not floor
    assert auto_cell_count(100, 8, 100) == 8         # never shrinks
    assert auto_cell_count(0, 4, 100) == 4           # empty keeps layout
    assert auto_cell_count(10**9, 4, 100) == 4096    # MAX_AUTO_CENTROIDS
    assert auto_cell_count(10**9, 4, 100, max_centroids=64) == 64
    with pytest.raises(ValueError):
        auto_cell_count(100, 4, 0)


def test_recenter_grows_cells_with_store(spark, sf_dir, tmp_path_factory):
    """Remaining half of VERDICT r8 gap #3: an index under continuous
    ingest must GROW its cell count, not just rebalance a fixed one.
    Build small with a target_rows_per_cell policy, append ~8x the
    build size of BALANCED data (skew stays ~1, the old trigger never
    fires), and assert maybe_recenter fires on the growth trigger,
    auto-sizes cells to ceil(rows/target), and still answers exactly
    at full probe."""
    from dragnet_spark.index.vector import (
        append_vector_index,
        maybe_recenter_vector_index,
        vector_index_skew,
    )
    from dragnet_spark.ops.similarity import cosine_topk_blocked

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(800)
    )
    path = str(tmp_path_factory.mktemp("vgrow"))
    build = emb.filter(F.col("vec_id") < 100)
    n0 = build.count()
    build_vector_index(
        spark, build, path, n_centroids=4, seed=3, target_rows_per_cell=50
    )
    assert load_vector_index_meta(path)["target_rows_per_cell"] == 50

    # balanced growth: shifted copies of the SAME distribution, so
    # max/mean skew stays near the build's — only mean rows/cell moves
    for i in range(1, 8):
        append_vector_index(
            spark,
            emb.selectExpr(f"vec_id + {i * 1000000} AS vec_id", "embedding"),
            path,
        )
    total = n0 + 7 * emb.count()  # limit(800) may cap at the table size
    assert vector_index_skew(spark, path) < 4.0, "test premise: balanced"

    assert maybe_recenter_vector_index(spark, path, skew_trigger=4.0)
    meta = load_vector_index_meta(path)
    from dragnet_spark.index.vector import auto_cell_count

    assert meta["n_centroids"] == auto_cell_count(total, 4, 50)
    assert meta["n_centroids"] > 4
    assert meta["target_rows_per_cell"] == 50  # policy survives recenter

    # immediately re-checking does not thrash: mean is back under 2x
    assert not maybe_recenter_vector_index(spark, path, skew_trigger=4.0)

    # exhaustive probe over the grown layout still equals brute force
    store = spark.read.parquet(f"{path}/vectors").select(
        "vec_id", F.col("embedding")
    )
    q = emb.filter(F.col("vec_id") < 3)
    got = rows_set(
        query_vector_index(spark, path, q, k=3, n_probe=meta["n_centroids"])
    )
    want = rows_set(cosine_topk_blocked(store, q, k=3))
    assert got and got == want
