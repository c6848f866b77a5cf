"""Skew regression net for the LSH/join family.

A hot band bucket (many identical documents → every band hashes
equal) is the classic LSH blowup: the bucket self-join emits
O(hot²) candidate pairs. These tests pin two properties:

1. Correctness under skew — the hot clique's pairs all survive with
   jaccard 1.0 and no cross-contamination with the cold tail.
2. Bounded wall-time — the hot bucket must not serialize the stage
   (AQE skew-join splitting is on in session.py); the bound is
   generous enough to never flake but tight enough to catch an
   accidental O(n²)-over-everything or single-task regression.
"""

import time

import pytest
from pyspark.sql import functions as F

from dragnet_spark.ops.dedup import embedding_near_dup_lsh, minhash_lsh_pairs

HOT = 120  # identical docs → one hot bucket, C(HOT,2) = 7140 pairs
COLD = 3000


@pytest.fixture(scope="module")
def skewed_docs(spark):
    hot = spark.range(HOT).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and again").alias(
            "text"
        ),
    )
    # cold tail: unique texts, no shared shingle structure
    cold = spark.range(HOT, HOT + COLD).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique document body "),
            F.md5(F.col("id").cast("string")),
            F.lit(" with number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    return hot.unionByName(cold)


def test_minhash_lsh_hot_bucket_correct_and_bounded(skewed_docs):
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        skewed_docs, "text", "doc_id", num_hashes=16, bands=8, threshold=0.8
    )
    got = pairs.collect()
    dt = time.perf_counter() - t0

    hot_pairs = [r for r in got if r.id_a < HOT and r.id_b < HOT]
    assert len(hot_pairs) == HOT * (HOT - 1) // 2
    assert all(r.jaccard == 1.0 for r in hot_pairs)
    # no pair may straddle the clique boundary (identical text never
    # matches the md5-unique tail at threshold 0.8)
    assert not [r for r in got if (r.id_a < HOT) != (r.id_b < HOT)]
    assert dt < 120, f"hot-bucket LSH took {dt:.1f}s — skew regression"


def test_embedding_lsh_hot_bucket_correct_and_bounded(spark):
    dims = 16
    hot = spark.range(HOT).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0 if i == 0 else 0.25) for i in range(dims)]).alias(
            "embedding"
        ),
    )
    # cold: deterministic pseudo-random unit-ish vectors, pairwise far
    cold = spark.range(HOT, HOT + COLD).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.hash(F.concat(F.col("id").cast("string"), F.lit(f"_{i}")))
                    % 1000
                    / F.lit(1000.0)
                )
                for i in range(dims)
            ]
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    out = embedding_near_dup_lsh(
        hot.unionByName(cold), threshold=0.999
    )
    rows = out.collect()
    dt = time.perf_counter() - t0
    assert rows, "expected the identical-vector clique to dedup"
    assert dt < 120, f"hot-bucket SRP-LSH took {dt:.1f}s — skew regression"