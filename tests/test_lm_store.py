"""Frozen reference-LM store (index/lm.py): freeze counts on trusted
text, score/gate later batches and streams without the judged data
shifting the judge."""

import math

from pyspark.sql import functions as F

from dragnet_spark.index.lm import (
    build_lm_store,
    lm_gate,
    load_lm_meta,
    score_against_lm_store,
)

FLUENT = "the cat sat on the mat and the dog sat on the rug"


def _ref(spark, n=8):
    return spark.createDataFrame(
        [(i, FLUENT) for i in range(n)], "doc_id long, text string"
    )


def test_build_meta_and_floor_score(spark, tmp_path):
    lm = str(tmp_path / "lm")
    meta = build_lm_store(spark, _ref(spark), lm)
    assert load_lm_meta(lm) == meta
    toks = FLUENT.split()
    assert meta["total_tokens"] == 8 * len(toks)
    assert meta["vocab_size"] == len(set(toks))

    # a fully-OOV document hits the add-one floor exactly:
    # every bigram scores ln(0.2 * 1/(T+V+1))
    oov = spark.createDataFrame(
        [(99, "zz qq ww ee rr")], "doc_id long, text string"
    )
    got = score_against_lm_store(spark, lm, oov).collect()[0]
    t, v = meta["total_tokens"], meta["vocab_size"]
    expect = math.floor(
        -round(math.log(0.2 * (1.0 / (t + v + 1.0))) * 1e9)
    )
    assert got.n_bigrams == 4
    assert got.mean_logp == -expect / 1e9


def test_gate_passes_fluent_drops_salad_and_oov(spark, tmp_path):
    lm = str(tmp_path / "lm")
    build_lm_store(spark, _ref(spark), lm)
    salad = "on the the sat rug cat mat dog the and on sat the"
    batch = spark.createDataFrame(
        [(1, FLUENT), (2, salad), (3, "zz qq ww ee rr"), (4, "hi")],
        "doc_id long, text string",
    )
    scores = {
        r.doc_id: r.mean_logp
        for r in score_against_lm_store(spark, lm, batch).collect()
    }
    assert 4 not in scores  # < 2 tokens: no bigram evidence
    assert scores[1] > scores[2] > scores[3]
    thresh = (scores[1] + scores[2]) / 2
    kept = sorted(
        r.doc_id for r in lm_gate(spark, lm, batch, thresh).collect()
    )
    assert kept == [1]


def test_frozen_judge_is_spam_immune(spark, tmp_path):
    """The store point: scoring N spam batches never improves spam's
    score — unlike self-scored corpus LMs, where repeated spam
    becomes 'fluent'."""
    lm = str(tmp_path / "lm")
    build_lm_store(spark, _ref(spark), lm)
    spam = spark.createDataFrame(
        [(i, "buy buy buy pills pills now") for i in range(50)],
        "doc_id long, text string",
    )
    first = score_against_lm_store(spark, lm, spam.limit(1)).collect()[0]
    again = score_against_lm_store(spark, lm, spam).collect()
    assert all(r.mean_logp == first.mean_logp for r in again)


def test_lm_gate_composes_with_live_ingester(spark, tmp_path):
    """Streaming shape: the gate runs inside foreachBatch ahead of the
    live-store ingester — gated docs never reach the sink or store."""
    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.ops.text import fingerprint
    from dragnet_spark.streaming.pipeline import make_live_store_ingester

    lm = str(tmp_path / "lm")
    build_lm_store(spark, _ref(spark), lm)
    store = str(tmp_path / "store")
    build_fingerprint_store(
        spark,
        spark.createDataFrame(
            [(1, "previously stored text here ok")], "doc_id long, text string"
        ),
        store,
    )
    sink = str(tmp_path / "sink")
    ingest = make_live_store_ingester(
        store, sink, "id", checkpoint=str(tmp_path / "ck")
    )

    def gated_ingest(batch_df, batch_id):
        # fluent ≈ -2.5; the fully-OOV floor here is ln(0.2/(T+V+1))
        # ≈ -6.4 — gate between them
        keep = lm_gate(
            spark, lm, batch_df, -5.0, id_col="id"
        )
        ingest(keep, batch_id)

    for i in range(2):
        b = spark.createDataFrame(
            [
                (str(100 * i), FLUENT + f" batch {i}"),
                (str(100 * i + 1), "zz qq ww ee rr oov junk here"),
            ],
            "id string, text string",
        )
        gated_ingest(
            b.select("id", "text", fingerprint("text").alias("__dn_fp")), i
        )
    sunk = {r.id for r in spark.read.parquet(sink).select("id").collect()}
    assert sunk == {"0", "100"}  # OOV junk gated before the sink
    n_store = spark.read.parquet(f"{store}/fingerprints").count()
    assert n_store == 1 + 2  # seed + the two fluent survivors


def test_lm_store_in_fleet_view_never_compacts(spark, tmp_path):
    from dragnet_spark.index.maintain import plan_maintenance

    lm = str(tmp_path / "fleet" / "lm")
    build_lm_store(spark, _ref(spark), lm)
    plan = {r["path"]: r for r in plan_maintenance(
        spark, str(tmp_path / "fleet"), max_files=0
    )}
    assert plan[lm]["kind"] == "lm"
    assert plan[lm]["actions"] == []  # immutable: even max_files=0
