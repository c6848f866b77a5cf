"""Bloom-prefiltered decontamination: exactness vs the broadcast-join
twin, no-false-negative guarantee, and real pruning."""

import pyspark.sql.functions as F
import pytest

from dragnet_spark.ops.decontam import (
    benchmark_overlap_bloom,
    bloom_build,
    _hash_pair,
    _positions_np,
)
from dragnet_spark.ops.text import benchmark_overlap, doc_gram_hashes
from dragnet_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_bloom_matches_exact_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    exact = _rows(benchmark_overlap(docs, n=8, bench_mod=97))
    bloom = _rows(benchmark_overlap_bloom(docs, n=8, bench_mod=97))
    assert bloom == exact
    assert len(exact) > 0


def test_bloom_exact_even_with_tiny_saturated_bitset(spark, sf_dir):
    # m=256 bits for thousands of grams -> bitset saturates, fpp -> 1,
    # everything becomes a candidate: slow path, but still exact
    docs = _docs(spark, sf_dir)
    exact = _rows(benchmark_overlap(docs, n=8, bench_mod=97))
    bloom = _rows(
        benchmark_overlap_bloom(docs, n=8, bench_mod=97, m_bits=256, k=2)
    )
    assert bloom == exact


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pos = doc_gram_hashes(docs, n=8)
    bench = pos.filter(F.col("doc_id") % 97 == 0).select("gh").distinct()
    train = pos.filter(F.col("doc_id") % 97 != 0)

    bits = spark.sparkContext.broadcast(bloom_build(bench, m_bits=1 << 20))
    import numpy as np

    arr = np.frombuffer(bits.value, dtype=np.uint8)

    probed = train.select("gh", *_hash_pair("gh")).join(
        bench.withColumn("truth", F.lit(1)), "gh", "left"
    )
    rows = probed.collect()
    n_might = 0
    for r in rows:
        P = _positions_np(
            np.array([r["h1"]], dtype=np.int64),
            np.array([r["h2"]], dtype=np.int64),
            1 << 20, 5,
        )[0]
        might = bool(np.all((arr[P >> 3] >> (P & 7).astype(np.uint8)) & 1))
        n_might += might
        if r["truth"] == 1:
            assert might  # a true hit is NEVER pruned
    # the prefilter must actually prune: most grams don't touch the
    # eval slice, and at m=2^20 the fpp is well under 1%
    assert n_might < 0.5 * len(rows)


def test_bloom_empty_eval_set_all_clean(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    big = 1 << 40  # no doc_id % big == 0 except doc_id 0 -- exclude it
    out = benchmark_overlap_bloom(
        docs.filter(F.col("doc_id") > 0), n=8, bench_mod=big
    )
    agg = out.agg(
        F.sum("n_hit_grams").alias("h"), F.sum("contaminated").alias("c")
    ).collect()[0]
    assert (agg["h"] or 0) == 0 and (agg["c"] or 0) == 0


def test_bloom_build_is_orderfree(spark, sf_dir):
    # OR is commutative: bitset must be identical under repartition
    docs = _docs(spark, sf_dir)
    bench = (
        doc_gram_hashes(docs, n=8)
        .filter(F.col("doc_id") % 97 == 0)
        .select("gh")
        .distinct()
    )
    a = bloom_build(bench, m_bits=1 << 16, k=3)
    b = bloom_build(bench.repartition(13), m_bits=1 << 16, k=3)
    assert a == b
