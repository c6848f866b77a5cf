"""Materialized fingerprint store (index/fingerprints.py): probe
correctness, append semantics, and the never-read-text contract."""

import pytest
from pyspark.sql import functions as F

from dragnet_spark.index.fingerprints import (
    append_fingerprints,
    build_fingerprint_store,
    probe_new_documents,
)


@pytest.fixture()
def store(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "Hello   WORLD"),  # same fingerprint as 1
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "fp")
    build_fingerprint_store(spark, corpus, path)
    return path


def test_probe_flags_known_and_fresh(spark, store):
    batch = spark.createDataFrame(
        [
            (10, "  hello  world "),  # dup of min(1,2) = 1
            (11, "brand new document"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in probe_new_documents(spark, store, batch).collect()}
    assert out[10]["is_duplicate"] and out[10]["dup_of"] == 1
    assert not out[11]["is_duplicate"] and out[11]["dup_of"] is None


def test_append_extends_the_store(spark, store):
    newdocs = spark.createDataFrame(
        [(20, "fresh content here")], "doc_id long, text string"
    )
    append_fingerprints(spark, newdocs, store)
    probe = spark.createDataFrame(
        [(30, "FRESH  content here")], "doc_id long, text string"
    )
    (row,) = probe_new_documents(spark, store, probe).collect()
    assert row["is_duplicate"] and row["dup_of"] == 20


def test_probe_reads_only_fingerprint_columns(spark, store):
    """The probe plan must scan the store's (fp, doc_id) — never any
    text column — and keep the store side a broadcast-joinable shape."""
    batch = spark.createDataFrame(
        [(40, "hello world")], "doc_id long, text string"
    )
    plan = (
        probe_new_documents(spark, store, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the parquet scan of the store reads fp/doc_id only
    assert "text" not in plan.split("Location")[-1][:400]


def test_probe_against_registry_oracle(spark, sf_dir, oracle):
    from dragnet_spark.registry import REGISTRY

    got = {
        tuple(r)
        for r in REGISTRY["dedup_incremental_probe"].spark(spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in oracle.execute(
            REGISTRY["dedup_incremental_probe"].oracle
        ).fetchall()
    }
    assert got == want and got


def test_probe_plan_uses_dpp_and_broadcast(spark, tmp_path):
    """The probe must broadcast the batch side and dynamic-partition-
    prune the store's fp_bucket directories — the two plan properties
    that keep per-batch cost proportional to the batch, not the
    corpus. (A corpus-sized store: the optimizer skips DPP when the
    store is a handful of rows.)"""
    from pyspark.sql import functions as F

    corpus = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "bigfp")
    build_fingerprint_store(spark, corpus, path)
    batch = corpus.filter(F.col("doc_id") < 5)
    plan = (
        probe_new_documents(spark, path, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "dynamicpruningexpression" in plan.lower(), (
        "store scan lost dynamic partition pruning on fp_bucket"
    )
