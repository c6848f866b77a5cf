"""Exact fixed-point k-means (ops/kmeans.py): quantization semantics,
Lloyd-round behavior on crafted blobs, empty-cluster retention,
determinism, and Spark↔DuckDB bit-parity of the unrolled SQL twin."""

import duckdb
import pytest

from dragnet_spark.ops.kmeans import (
    kmeans_assign,
    kmeans_seeds,
    kmeans_sql,
    quantize_vectors,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_quantize_floors_negatives(spark):
    df = _emb(spark, [(0, [0.5, -0.5, -0.0000005, 0.0])])
    q = quantize_vectors(df).collect()[0]["q"]
    # floor, not trunc: -0.0000005*1e6 = -0.5 -> -1
    assert q == [500000, -500000, -1, 0]


def test_two_blobs_separate(spark):
    # ids 0-2 near (1,0), ids 3-5 near (0,1): k=2 must split them
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.1, -0.1]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [-0.1, 1.1]),
    ]
    out = kmeans_assign(_emb(spark, rows), k=2, iterations=3).collect()
    by_id = {r["id"]: r["cluster"] for r in out}
    assert by_id[0] == by_id[1] == by_id[2]
    assert by_id[3] == by_id[4] == by_id[5]
    assert by_id[0] != by_id[3]
    assert all(r["dist"] >= 0 for r in out)


def test_empty_cluster_keeps_centroid_and_is_deterministic(spark):
    # 3 seeds over 2 distinct points: one cluster must go empty and
    # the run still completes with clusters in range, identically twice
    rows = [(i, [1.0, 1.0] if i % 2 else [-1.0, -1.0]) for i in range(6)]
    a = sorted(map(tuple, kmeans_assign(_emb(spark, rows), k=3, iterations=2).collect()))
    b = sorted(map(tuple, kmeans_assign(_emb(spark, rows), k=3, iterations=2).collect()))
    assert a == b
    assert {t[1] for t in a} <= {0, 1, 2}
    # the two point-groups never share a cluster
    by_id = {t[0]: t[1] for t in a}
    assert by_id[0] == by_id[2] == by_id[4]
    assert by_id[1] == by_id[3] == by_id[5]
    assert by_id[0] != by_id[1]


def test_seeds_bounded_and_deterministic(spark):
    df = quantize_vectors(_emb(spark, [(i, [float(i), 0.0]) for i in range(10)]))
    s1 = kmeans_seeds(df, 4)
    s2 = kmeans_seeds(df, 4)
    assert s1 == s2 and len(s1) == 4
    # k > n: every row becomes a seed, no error
    assert len(kmeans_seeds(df, 99)) == 10


@pytest.mark.parametrize("iters", [0, 1, 3])
def test_sql_twin_bit_parity(spark, iters):
    rows = [
        (i, [((i * 37 + d * 11) % 19 - 9) / 10.0 for d in range(8)])
        for i in range(40)
    ]
    df = _emb(spark, rows)
    got = sorted(
        (r["id"], r["cluster"], r["dist"])
        for r in kmeans_assign(df, k=4, iterations=iters).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", [(i, v) for i, v in rows]
    )
    want = sorted(
        tuple(r)
        for r in con.execute(kmeans_sql(k=4, iterations=iters)).fetchall()
    )
    assert got == want
