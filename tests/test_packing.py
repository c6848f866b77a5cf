"""Sequence-packing invariants (no SQL twin exists — greedy bin
packing is sequential per bucket — so the contract is pinned here)."""

from pyspark.sql import functions as F

from dragnet_spark.ops.packing import pack_sequences, pack_stats


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).alias("n_tokens"),
    )


def test_budget_never_exceeded(spark):
    # few buckets relative to doc count: bucket-tail fragmentation is
    # amortized only when buckets hold many docs
    packed = pack_sequences(_docs(spark), "doc_id", "n_tokens", budget=128,
                            num_buckets=8)
    stats = pack_stats(packed, "n_tokens", 128)
    assert stats.filter(F.col("n_tokens") > 128).count() == 0
    # packing actually packs: near the ~172-pack ideal, far below 400
    assert stats.count() < 200


def test_every_doc_packed_exactly_once(spark):
    df = _docs(spark)
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=128)
    assert packed.count() == df.count()
    assert packed.select("doc_id").distinct().count() == df.count()


def test_oversize_doc_gets_singleton_pack(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 999), (3, 60)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, num_buckets=1)
    by_id = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    assert by_id[2] not in {by_id[1], by_id[3]}


def test_assignment_independent_of_partitioning(spark):
    df = _docs(spark)
    a = pack_sequences(df.repartition(1), "doc_id", "n_tokens", budget=128)
    b = pack_sequences(df.repartition(13), "doc_id", "n_tokens", budget=128)
    am = {r["doc_id"]: r["pack_id"] for r in a.collect()}
    bm = {r["doc_id"]: r["pack_id"] for r in b.collect()}
    assert am == bm
