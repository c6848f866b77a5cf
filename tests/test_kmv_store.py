"""Incremental KMV store (index/kmv.py): stream==batch bit-exactness
of bottom-k folding, estimate parity with the one-shot op, the
known-minima probe, and fleet classification."""

from pyspark.sql import functions as F

from dragnet_spark.index.kmv import (
    build_kmv_store,
    kmv_store_contains,
    kmv_store_estimate,
    load_kmv_meta,
    merge_kmv_batch,
)
from dragnet_spark.ops.sketch import kmv_distinct


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [("s%d" % (i % 2), "tok%d" % (i % 400)) for i in range(lo, hi)],
        "src string, tok string",
    )


def _sketch_rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path + "/sketch").collect())
    )


def test_incremental_folds_equal_one_shot(spark, tmp_path):
    full = _docs(spark, 0, 1000)
    one = str(tmp_path / "one")
    build_kmv_store(spark, full, one, "tok", ["src"], k=64)

    inc = str(tmp_path / "inc")
    build_kmv_store(spark, _docs(spark, 0, 200), inc, "tok", ["src"], k=64)
    for lo in range(200, 1000, 200):
        merge_kmv_batch(spark, _docs(spark, lo, lo + 200), inc)

    # bottom-k merge is exact: N folds == one build, bit for bit
    assert _sketch_rows(spark, inc) == _sketch_rows(spark, one)
    est_store = {
        (r["src"], r["est_distinct"])
        for r in kmv_store_estimate(spark, inc).collect()
    }
    est_direct = {
        (r["src"], r["est_distinct"])
        for r in kmv_distinct(full, "tok", ["src"], k=64).collect()
    }
    assert est_store == est_direct
    assert load_kmv_meta(inc)["k"] == 64


def test_exact_below_k_and_meta(spark, tmp_path):
    path = str(tmp_path / "small")
    build_kmv_store(spark, _docs(spark, 0, 50), path, "tok", ["src"], k=256)
    got = {
        (r["src"], r["est_distinct"])
        for r in kmv_store_estimate(spark, path).collect()
    }
    assert got == {("s0", 25), ("s1", 25)}


def test_contains_flags_recrawl_vs_fresh(spark, tmp_path):
    path = str(tmp_path / "c")
    build_kmv_store(spark, _docs(spark, 0, 400), path, "tok", ["src"], k=64)
    # the same batch again: every distinct value that ranks in the
    # bottom-k is already a stored minimum
    seen = kmv_store_contains(spark, path, _docs(spark, 0, 400)).collect()
    for r in seen:
        assert r["n_known_minima"] == 64  # all stored minima re-probed
    fresh = spark.createDataFrame(
        [("s0", "brand-new-%d" % i) for i in range(500)],
        "src string, tok string",
    )
    novel = kmv_store_contains(spark, path, fresh).collect()[0]
    # fresh material overlaps the stored minima only by hash luck
    assert novel["n_known_minima"] < 16


def test_maintain_classifies_kmv_no_actions(spark, tmp_path):
    from dragnet_spark.index.maintain import run_maintenance

    path = str(tmp_path / "fleet" / "vocab")
    build_kmv_store(spark, _docs(spark, 0, 100), path, "tok", ["src"], k=16)
    plan = run_maintenance(spark, str(tmp_path / "fleet"), dry_run=True)
    (rec,) = plan
    assert rec["kind"] == "kmv" and rec["actions"] == []
