"""Streaming variant tests: the same query semantics over
Structured Streaming, verified against the batch scan on identical
data (the reference's scan-vs-index equivalence idea applied to
batch-vs-streaming)."""

import os
import shutil
import time
import glob

import pytest
from pyspark.sql import functions as F

from dragnet_spark.index.build import Metric
from dragnet_spark.index.query import query_index
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan_ndjson
from dragnet_spark.streaming import read_ndjson_stream, stream_build, stream_scan

REF_DATA = "/root/reference/tests/data"

# multi-minute store/streaming tier: deselected from the default gate
# (pytest.ini addopts) so the driver's suite run completes; run with
# `pytest -m slow` (the builder's sessions do).
pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(REF_DATA),
        reason="reference fixture data not present",
    ),
    pytest.mark.slow,
]


@pytest.fixture
def watched_dir(tmp_path):
    """Reference log files copied flat with chronological mtimes, so
    the file stream source processes them in event-time order."""
    d = tmp_path / "incoming"
    d.mkdir()
    t0 = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{REF_DATA}/2014/*/*.log"))):
        day = os.path.basename(os.path.dirname(f))
        dst = d / f"{day}-{os.path.basename(f)}"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i, t0 + i))
    return str(d)


def _run_to_memory(spark, result, name, mode, trigger_files=None):
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stream_scan_global_counts_match_batch(spark, watched_dir):
    query = QueryConfig.load("operation")
    sdf = read_ndjson_stream(spark, watched_dir)
    res = stream_scan(sdf, query)
    got = _run_to_memory(spark, res, "s_ops", "complete")
    batch = scan_ndjson(spark, watched_dir, query)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_scan_windowed_append_finalizes_past_windows(spark, watched_dir):
    """Daily tumbling windows with a 1h watermark: with files arriving
    in order over several micro-batches, every day except the last
    finalizes and is emitted in append mode."""
    query = QueryConfig.load(
        "timestamp[date,field=time,aggr=lquantize,step=86400],operation"
    )
    sdf = read_ndjson_stream(spark, watched_dir, max_files_per_trigger=2)
    res = stream_scan(sdf, query, watermark="1 hour")
    got = _run_to_memory(spark, res, "s_win", "append")

    batch = scan_ndjson(spark, watched_dir, query)
    batch_rows = {tuple(r) for r in batch.collect()}
    got_rows = {tuple(r) for r in got.collect()}

    # emitted rows must be a subset of the batch result with identical
    # counts, covering every finalized (non-final) day
    assert got_rows <= batch_rows
    days = sorted({r[0] for r in batch_rows})
    finalized = {r[0] for r in got_rows}
    assert set(days[:-1]) <= finalized


def test_stream_build_incremental_index_matches_batch(spark, watched_dir, tmp_path):
    """Continuous build: micro-batch partial aggregates appended to the
    partitioned view re-aggregate to the same answer as a one-shot
    batch build (closure property, reference
    tests/dn/local/tst.format_skinner.sh)."""
    idx = str(tmp_path / "stream_index")
    metrics = [
        Metric.load(
            "ops",
            "operation,timestamp[date,field=time,aggr=lquantize,step=86400]",
        )
    ]
    sdf = read_ndjson_stream(spark, watched_dir, max_files_per_trigger=3)
    q = stream_build(
        sdf,
        metrics,
        idx,
        interval="day",
        time_field="time",
        checkpoint=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(180)

    res = query_index(spark, idx, QueryConfig.load("operation"))
    got = {tuple(r) for r in res.collect()}
    want = {
        tuple(r)
        for r in scan_ndjson(
            spark,
            watched_dir,
            QueryConfig.load(
                "operation,timestamp[date,field=time,aggr=lquantize,step=86400]"
            ),
        )
        .groupBy("operation")
        .sum("value")
        .collect()
    }
    assert got == want
    # multiple micro-batches actually appended partials (the view has
    # more rows than unique groups, proving re-aggregation did work)
    import pyspark.sql.functions as F

    raw = spark.read.parquet(f"{idx}/ops")
    assert raw.count() >= raw.select("operation", "timestamp").distinct().count()


def test_sessionize_batch_semantics(spark):
    """Gap-based sessions: events within the gap merge, a larger gap
    splits. Batch mode doubles as the oracle for the streaming path."""
    from dragnet_spark.streaming.stateful import sessionize

    rows = [
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 10:10:00"),   # within 30m gap → same session
        ("u1", "2024-01-01 11:30:00"),   # > 30m after previous → new session
        ("u2", "2024-01-01 10:05:00"),
    ]
    df = spark.createDataFrame(rows, "user string, ts string").select(
        "user", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (r["user"], r["session_start"], r["value"])
        for r in sessionize(df, "ts", ["user"], gap="30 minutes").collect()
    }
    import datetime as dt

    def ep(s):
        return int(
            dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
        )

    assert got == {
        ("u1", ep("2024-01-01T10:00:00"), 2),
        ("u1", ep("2024-01-01T11:30:00"), 1),
        ("u2", ep("2024-01-01T10:05:00"), 1),
    }


def test_stream_running_counts_converge_to_batch(spark, watched_dir):
    """applyInPandasWithState running totals: after all micro-batches,
    the latest emission per key equals the batch group count."""
    from dragnet_spark.streaming import read_ndjson_stream
    from dragnet_spark.streaming.stateful import stream_running_counts
    from dragnet_spark.scan import VariantResolver

    sdf = read_ndjson_stream(spark, watched_dir, max_files_per_trigger=3)
    r = VariantResolver()
    keyed = sdf.select(r.raw("operation").alias("operation"))
    res = stream_running_counts(keyed, ["operation"])
    q = (
        res.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # keep only each key's final (maximal) emission
    final = {
        r["operation"]: r["n_events"]
        for r in spark.sql(
            "select operation, max(n_events) as n_events from running group by operation"
        ).collect()
    }
    batch = {
        r["operation"]: r["value"]
        for r in scan_ndjson(
            spark, watched_dir, QueryConfig.load("operation")
        ).collect()
    }
    assert final == batch


def _batch_variant(spark, path):
    from dragnet_spark.scan import VARIANT_COL

    txt = spark.read.option("recursiveFileLookup", "true").text(path)
    return (
        txt.filter(F.trim(F.col("value")) != "")
        .select(F.try_parse_json(F.col("value")).alias(VARIANT_COL))
        .filter(F.col(VARIANT_COL).isNotNull())
    )


def test_stream_sliding_counts_match_batch(spark, watched_dir):
    """Sliding windows (1 day length, 6 h slide) over the stream equal
    the identical expression over the same data as a batch frame."""
    from dragnet_spark.streaming import stream_sliding_counts

    sdf = read_ndjson_stream(spark, watched_dir, max_files_per_trigger=3)
    res = stream_sliding_counts(sdf, "time", 86400, 21600)
    q = (
        res.writeStream.format("memory")
        .queryName("sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from sliding").collect()}
    want = {
        tuple(r)
        for r in stream_sliding_counts(
            _batch_variant(spark, watched_dir), "time", 86400, 21600
        ).collect()
    }
    assert got == want and got


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Records repeating a key within the watermark horizon are
    dropped; the surviving key set equals batch distinct."""
    import json

    from dragnet_spark.streaming import stream_dedup

    d = tmp_path / "in"
    d.mkdir()
    lines = [
        {"k": f"key{i % 5}", "time": f"2024-01-01T10:{i:02d}:00.000Z"}
        for i in range(20)
    ]
    (d / "a.json").write_text("\n".join(json.dumps(x) for x in lines[:10]) + "\n")
    (d / "b.json").write_text("\n".join(json.dumps(x) for x in lines[10:]) + "\n")

    sdf = read_ndjson_stream(spark, str(d))
    res = stream_dedup(sdf, ["k"], "time", watermark="2 hours")
    q = (
        res.writeStream.format("memory")
        .queryName("dedup_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["__dn_key_k"]
        for r in spark.sql("select * from dedup_s").collect()
    }
    assert got == {f"key{i}" for i in range(5)}
    batch = stream_dedup(_batch_variant(spark, str(d)), ["k"], "time")
    assert batch.count() == 5


def test_stream_enrich_matches_batch(spark, watched_dir):
    """Stream-static broadcast enrichment: map each record's operation
    to a category from a static dim, count per category; streaming
    result must equal the same expression over a batch read."""
    from dragnet_spark.streaming import stream_enrich
    from dragnet_spark.sources.ndjson import read_ndjson

    dim = spark.createDataFrame(
        [("GET", "read"), ("PUT", "write"), ("DELETE", "write")],
        "operation string, category string",
    )

    def counts(df, resolver=None):
        return stream_enrich(
            df, dim, "operation", fields=["operation"], resolver=resolver
        ).groupBy("category").agg(F.sum(F.lit(1)).cast("long").alias("n"))

    sdf = read_ndjson_stream(spark, watched_dir)
    got = _run_to_memory(spark, counts(sdf), "s_enrich", "complete")
    from dragnet_spark.scan import SchemaResolver

    batch = read_ndjson(spark, [watched_dir])
    want = counts(batch, resolver=SchemaResolver(batch))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
    # left join keeps un-mapped operations (category null)
    assert any(r["category"] is None for r in got.collect())


def test_stream_interval_join_attribution_matches_batch(spark, tmp_path):
    """Stream-stream interval join (purchase ← clicks within 10 min):
    watermarked self-join over a file stream equals the same join over
    a batch read."""
    import json
    import random

    from dragnet_spark.streaming import stream_interval_join

    rng = random.Random(7)
    d = tmp_path / "attr"
    d.mkdir()
    base = 1_700_000_000
    rows = []
    for i in range(400):
        rows.append(
            {
                "id": i,
                "user": rng.randrange(12),
                "type": rng.choice(["click", "click", "purchase"]),
                "time": base + rng.randrange(3600),
            }
        )
    for part in range(4):
        with open(d / f"p{part}.ndjson", "w") as f:
            for r in rows[part * 100 : (part + 1) * 100]:
                f.write(json.dumps(r) + "\n")

    def typed(df):
        from dragnet_spark.scan import VariantResolver

        r = VariantResolver()
        return df.select(
            r._get("id", "long").alias("id"),
            r._get("user", "long").alias("user"),
            r.raw("type").alias("type"),
            F.timestamp_seconds(r._get("time", "long")).alias("ts"),
        )

    def attributed(df):
        purchases = df.filter(F.col("type") == "purchase").select(
            F.col("id").alias("purchase_id"), "user", F.col("ts").alias("pts")
        )
        clicks = df.filter(F.col("type") == "click").select(
            F.col("id").alias("click_id"), "user", F.col("ts").alias("cts")
        )
        return stream_interval_join(
            purchases, clicks, "user", "pts", "cts", max_lag_sec=600
        ).select("purchase_id", "click_id")

    sdf = typed(read_ndjson_stream(spark, str(d), max_files_per_trigger=1))
    got = _run_to_memory(spark, attributed(sdf), "s_attr", "append")

    from dragnet_spark.scan import scan_ndjson  # noqa: F401  (batch twin below)

    txt = spark.read.option("recursiveFileLookup", "true").text(str(d))
    batch = typed(
        txt.filter(F.trim("value") != "").select(
            F.try_parse_json("value").alias("__dn_v")
        )
    )
    want = attributed(batch)
    gs = {tuple(r) for r in got.collect()}
    ws = {tuple(r) for r in want.collect()}
    assert gs == ws and len(gs) > 50


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: purchases with no qualifying
    click emit null-extended once the watermark passes them. A
    far-future sentinel file advances the watermark so every real
    purchase finalizes."""
    import json

    from dragnet_spark.streaming import stream_interval_join
    from dragnet_spark.scan import VariantResolver

    base = 1_700_000_000
    d = tmp_path / "louter"
    d.mkdir()
    rows = [
        {"id": 1, "user": 1, "type": "click", "time": base + 100},
        {"id": 2, "user": 1, "type": "purchase", "time": base + 200},  # matched
        {"id": 3, "user": 2, "type": "purchase", "time": base + 300},  # no click
        {"id": 4, "user": 3, "type": "click", "time": base + 900},
        {"id": 5, "user": 3, "type": "purchase", "time": base + 5000},  # click too old
    ]
    with open(d / "a.ndjson", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # sentinels must advance BOTH inputs: the stream-stream join's
    # global watermark is the MIN over the two sides, so a click-only
    # sentinel would leave the purchase-side watermark (and the
    # buffered unmatched purchases) frozen. Two rounds because a
    # watermark computed at the end of one batch only takes effect in
    # the next.
    for i, t in enumerate([100_000, 200_000]):
        with open(d / f"z_sentinel{i}.ndjson", "w") as f:
            f.write(json.dumps({"id": 90 + i, "user": 9, "type": "click",
                                "time": base + t}) + "\n")
            f.write(json.dumps({"id": 95 + i, "user": 8, "type": "purchase",
                                "time": base + t}) + "\n")

    r = VariantResolver()
    sdf = read_ndjson_stream(spark, str(d), max_files_per_trigger=1).select(
        r._get("id", "long").alias("id"),
        r._get("user", "long").alias("user"),
        r.raw("type").alias("type"),
        F.timestamp_seconds(r._get("time", "long")).alias("ts"),
    )
    purchases = sdf.filter(F.col("type") == "purchase").select(
        F.col("id").alias("purchase_id"), "user", F.col("ts").alias("pts")
    )
    clicks = sdf.filter(F.col("type") == "click").select(
        F.col("id").alias("click_id"), "user", F.col("ts").alias("cts")
    )
    res = stream_interval_join(
        purchases, clicks, "user", "pts", "cts",
        max_lag_sec=600, watermark="10 seconds", how="left_outer",
    ).select("purchase_id", "click_id", "user")
    rows = _run_to_memory(spark, res, "s_louter", "append").collect()
    # the join key is restored from the left copy: even null-extended
    # rows carry the purchase's user, never NULL
    assert all(r["user"] is not None for r in rows)
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    # every real purchase must be accounted for exactly once — matched
    # (2→1) or null-extended (3, 5). The sentinel purchases' own flush
    # depends on whether the runner applies the final watermark in a
    # trailing batch, which varies run to run; allow them, require
    # nothing else
    core = {(2, 1), (3, None), (5, None)}
    assert core <= got <= core | {(95, None), (96, None)}


def test_compact_index_after_stream_build(spark, watched_dir, tmp_path):
    """Compaction collapses the appended per-micro-batch partials to
    one row per group; every query answer is unchanged."""
    from dragnet_spark.index import compact_index

    idx = str(tmp_path / "c_index")
    metrics = [
        Metric.load(
            "ops",
            "operation,timestamp[date,field=time,aggr=lquantize,step=86400]",
        )
    ]
    sdf = read_ndjson_stream(spark, watched_dir, max_files_per_trigger=3)
    q = stream_build(
        sdf, metrics, idx, interval="day", time_field="time",
        checkpoint=str(tmp_path / "c_ckpt"), trigger_available_now=True,
    )
    q.awaitTermination(180)

    raw = spark.read.parquet(f"{idx}/ops")
    groups = raw.select([c for c in raw.columns if c != "value"]).distinct().count()
    assert raw.count() > groups  # partials actually accumulated

    before = {
        tuple(r)
        for r in query_index(spark, idx, QueryConfig.load("operation")).collect()
    }
    compact_index(spark, idx)
    after_raw = spark.read.parquet(f"{idx}/ops")
    assert after_raw.count() == groups  # one row per group now
    after = {
        tuple(r)
        for r in query_index(spark, idx, QueryConfig.load("operation")).collect()
    }
    assert before == after


def test_stream_scan_honors_time_bounds(spark, watched_dir):
    """--after/--before bound the streaming aggregation exactly like
    the batch scan (they were the one QueryConfig field stream_scan
    ignored)."""
    q = QueryConfig.load(
        "operation",
        time_after="2014-05-01T00:00:00Z",
        time_before="2014-05-03T00:00:00Z",
        time_field="time",
    )
    got = _run_to_memory(
        spark, stream_scan(read_ndjson_stream(spark, watched_dir), q),
        "s_bounded", "complete",
    )
    batch = scan_ndjson(spark, watched_dir, q)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}
    # and the bound actually excluded something
    full = scan_ndjson(spark, watched_dir, QueryConfig.load("operation"))
    assert sum(r["value"] for r in batch.collect()) < sum(
        r["value"] for r in full.collect()
    )


def test_batch_replay_is_deduplicated_by_ledger(spark, watched_dir, tmp_path):
    """foreachBatch appends are at-least-once; the marker ledger makes
    a replayed batch id a no-op so a restart after a hard stop cannot
    double-count (see make_batch_appender)."""
    from dragnet_spark.streaming.pipeline import make_batch_appender

    idx = str(tmp_path / "replay_index")
    metrics = [Metric.load("ops", "operation")]
    src = spark.read.format("text").load(watched_dir)
    from pyspark.sql.functions import try_parse_json, col, trim
    batch_df = (
        src.filter(trim(col("value")) != "")
        .select(try_parse_json(col("value")).alias("__dn_variant"))
        .filter(col("__dn_variant").isNotNull())
    )
    append = make_batch_appender(
        metrics, idx, interval="all", checkpoint=str(tmp_path / "ck")
    )
    append(batch_df, 0)
    once = {tuple(r) for r in query_index(spark, idx, QueryConfig.load("operation")).collect()}
    append(batch_df, 0)  # replay of the same batch id: must be a no-op
    twice = {tuple(r) for r in query_index(spark, idx, QueryConfig.load("operation")).collect()}
    assert once == twice
    append(batch_df, 1)  # a NEW batch id appends for real
    doubled = {tuple(r) for r in query_index(spark, idx, QueryConfig.load("operation")).collect()}
    assert doubled == {(op, n * 2) for (op, n) in once}


def test_stream_curate_matches_batch(spark, tmp_path):
    """The continuous curation gate: quality-filtered, fingerprint-
    deduplicated stream output matches the batch twin on the same
    files — including case/whitespace-normalized duplicate detection
    and the short-doc / punctuation-heavy drops."""
    import json

    from dragnet_spark.streaming import read_ndjson_stream, stream_curate

    d = tmp_path / "docs_in"
    d.mkdir()
    good = "the quick brown fox jumps over the lazy dog again"
    rows = [
        {"id": 1, "text": good, "time": "2024-01-01T10:00:00.000Z"},
        # duplicate after normalization (case + runs of spaces)
        {"id": 2, "text": good.upper().replace(" ", "  "),
         "time": "2024-01-01T10:01:00.000Z"},
        {"id": 3, "text": "too short", "time": "2024-01-01T10:02:00.000Z"},
        {"id": 4, "text": "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))",
         "time": "2024-01-01T10:03:00.000Z"},
        {"id": 5, "text": "a genuinely different document with enough tokens",
         "time": "2024-01-01T10:04:00.000Z"},
    ]
    (d / "a.json").write_text(
        "\n".join(json.dumps(r) for r in rows[:3]) + "\n"
    )
    (d / "b.json").write_text(
        "\n".join(json.dumps(r) for r in rows[3:]) + "\n"
    )

    sdf = read_ndjson_stream(spark, str(d))
    res = stream_curate(
        sdf, "text", "time", fields=["id", "text"], min_tokens=5
    )
    q = (
        res.writeStream.format("memory")
        .queryName("curate_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"] for r in spark.sql("select * from curate_s").collect()}
    # 1 survives (first fingerprint arrival), 2 is its normalized dup,
    # 3 too short, 4 all punctuation, 5 survives
    assert got == {"1", "5"}
    batch = stream_curate(
        _batch_variant(spark, str(d)), "text", "time",
        fields=["id", "text"], min_tokens=5,
    )
    assert {r["id"] for r in batch.collect()} == {"1", "5"}


def test_stream_curate_against_store_matches_batch(spark, tmp_path):
    """Continuous ingest against the persisted fingerprint store:
    survivors must pass the quality gate, be first-in-stream, AND be
    unseen by the store — stream output equals the batch twin."""
    import json

    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.streaming import (
        read_ndjson_stream,
        stream_curate_against_store,
    )

    known = "a document the corpus has already ingested before now"
    fresh = "a genuinely new document with plenty of distinct tokens"
    dup_in_stream = "another new document that arrives exactly twice here"

    corpus = spark.createDataFrame(
        [(100, known)], "doc_id long, text string"
    )
    store = str(tmp_path / "fpstore")
    build_fingerprint_store(spark, corpus, store)

    d = tmp_path / "docs_in"
    d.mkdir()
    rows = [
        {"id": 1, "text": known.upper(), "time": "2024-01-01T10:00:00.000Z"},
        {"id": 2, "text": fresh, "time": "2024-01-01T10:01:00.000Z"},
        {"id": 3, "text": dup_in_stream, "time": "2024-01-01T10:02:00.000Z"},
        {"id": 4, "text": dup_in_stream, "time": "2024-01-01T10:03:00.000Z"},
        {"id": 5, "text": "short", "time": "2024-01-01T10:04:00.000Z"},
    ]
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    sdf = read_ndjson_stream(spark, str(d))
    res = stream_curate_against_store(
        sdf, store, "text", "time", fields=["id", "text"], min_tokens=5
    )
    q = (
        res.writeStream.format("memory")
        .queryName("curate_store_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"] for r in spark.sql("select * from curate_store_s").collect()}
    # 1 = normalized dup of the STORE doc, 4 = in-stream dup of 3,
    # 5 = quality-gated; 2 and 3 survive
    assert got == {"2", "3"}

    # batch twin over the same files (typed reader + schema resolver)
    from dragnet_spark.scan import SchemaResolver
    from dragnet_spark.sources.ndjson import read_ndjson

    batch = read_ndjson(spark, [str(d)])
    bres = stream_curate_against_store(
        batch, store, "text", "time", fields=["id", "text"], min_tokens=5,
        resolver=SchemaResolver(batch),
    )
    assert {r["id"] for r in bres.collect()} == got


def test_stream_curate_against_band_store_matches_batch(spark, tmp_path):
    """In-stream NEAR-dedup against the persisted band store: a
    token-swapped twin of a stored doc (different exact fingerprint,
    high shingle overlap) is dropped; genuinely fresh docs survive;
    stream output equals the batch twin."""
    import json

    from dragnet_spark.index.fingerprints import build_band_store
    from dragnet_spark.streaming import read_ndjson_stream
    from dragnet_spark.streaming.pipeline import (
        stream_curate_against_band_store,
    )

    stored = ("the quick brown fox jumps over the lazy dog while many "
              "other animals watch quietly from the tall grass nearby")
    twin = ("the quick brown fox jumps over the lazy dog while many "
            "other animals watch quietly from the grass tall nearby")
    fresh = ("completely novel material discussing adaptive query "
             "execution and partition pruning over columnar storage")

    corpus = spark.createDataFrame(
        [(100, stored)], "doc_id long, text string"
    )
    store = str(tmp_path / "bstore")
    build_band_store(spark, corpus, store, num_hashes=16, bands=8)

    d = tmp_path / "docs_in"
    d.mkdir()
    rows = [
        {"id": 1, "text": twin, "time": "2024-01-01T10:00:00.000Z"},
        {"id": 2, "text": fresh, "time": "2024-01-01T10:01:00.000Z"},
        {"id": 3, "text": fresh, "time": "2024-01-01T10:02:00.000Z"},
        {"id": 4, "text": "short", "time": "2024-01-01T10:03:00.000Z"},
    ]
    (d / "a.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    sdf = read_ndjson_stream(spark, str(d))
    res = stream_curate_against_band_store(
        sdf, store, "text", "time", fields=["id", "text"], min_tokens=5
    )
    q = (
        res.writeStream.format("memory")
        .queryName("curate_band_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"] for r in spark.sql("select * from curate_band_s").collect()}
    # 1 = near-dup (band collision) of the STORED doc despite a
    # different exact fingerprint; 3 = in-stream exact dup of 2;
    # 4 = quality-gated. Only 2 survives.
    assert got == {"2"}

    from dragnet_spark.scan import SchemaResolver
    from dragnet_spark.sources.ndjson import read_ndjson

    batch = read_ndjson(spark, [str(d)])
    bres = stream_curate_against_band_store(
        batch, store, "text", "time", fields=["id", "text"], min_tokens=5,
        resolver=SchemaResolver(batch),
    )
    assert {r["id"] for r in bres.collect()} == got


def test_live_store_ingest_self_feeds_across_batches(spark, tmp_path):
    """stream_ingest_with_live_store: a duplicate arriving in a LATER
    micro-batch, with timestamps far beyond the watermark horizon (so
    in-stream dedup state cannot hold it), is dropped because batch 1
    folded its original's fingerprint into the store; the store ends
    holding every sunk fingerprint."""
    import json

    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.streaming import read_ndjson_stream
    from dragnet_spark.streaming.pipeline import (
        stream_ingest_with_live_store,
    )

    seen = "a document the corpus ingested in some earlier run entirely"
    first = "a brand new document arriving in the first micro batch"
    fresh2 = "another different document arriving in the second batch"

    store = str(tmp_path / "livestore")
    build_fingerprint_store(
        spark,
        spark.createDataFrame([(100, seen)], "doc_id long, text string"),
        store,
    )

    d = tmp_path / "in"
    d.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1); the
    # batch-2 dup of `first` is 3 DAYS later: watermark state (1 min)
    # is long gone, only the live store can catch it
    (d / "a.json").write_text(
        json.dumps({"id": 1, "text": first,
                    "time": "2024-01-01T10:00:00.000Z"}) + "\n"
        + json.dumps({"id": 2, "text": seen,
                      "time": "2024-01-01T10:00:01.000Z"}) + "\n"
    )
    (d / "b.json").write_text(
        json.dumps({"id": 3, "text": first.upper(),
                    "time": "2024-01-04T10:00:00.000Z"}) + "\n"
        + json.dumps({"id": 4, "text": fresh2,
                      "time": "2024-01-04T10:00:01.000Z"}) + "\n"
    )

    sdf = read_ndjson_stream(spark, str(d), max_files_per_trigger=1)
    sink = str(tmp_path / "sink")
    q = stream_ingest_with_live_store(
        sdf, store, sink, str(tmp_path / "ckpt"),
        "text", "time", "id", fields=["id", "text"],
        min_tokens=5, watermark="1 minute",
    )
    from dragnet_spark.streaming.pipeline import drain_stream

    drain_stream(q, min_data_batches=2)
    q.stop()
    q.awaitTermination(60)

    got = {r["id"] for r in spark.read.parquet(sink).collect()}
    # 2 = exact dup of the pre-seeded store doc; 3 = normalized dup of
    # batch-1's doc 1, catchable ONLY because the store is live
    assert got == {"1", "4"}, got
    store_fps = spark.read.parquet(f"{store}/fingerprints")
    # pre-seeded + the two sunk survivors
    assert store_fps.select("fp").distinct().count() == 3


def test_live_store_ingester_replay_is_skipped(spark, tmp_path):
    """Replayed batch ids (restart with an in-flight batch) must not
    double-append to sink or store — the marker ledger dedups."""
    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.streaming.pipeline import make_live_store_ingester

    store = str(tmp_path / "rstore")
    build_fingerprint_store(
        spark,
        spark.createDataFrame([(1, "previously stored text here ok")],
                              "doc_id long, text string"),
        store,
    )
    sink = str(tmp_path / "rsink")
    ingest = make_live_store_ingester(
        store, sink, "id", checkpoint=str(tmp_path / "ck")
    )
    from dragnet_spark.ops.text import fingerprint

    batch = spark.createDataFrame(
        [("7", "some fresh survivor document text")], "id string, text string"
    ).select("id", fingerprint("text").alias("__dn_fp"))
    ingest(batch, 0)
    ingest(batch, 0)  # replay of the same batch id
    assert spark.read.parquet(sink).count() == 1
    assert (
        spark.read.parquet(f"{store}/fingerprints").count() == 2
    )  # seeded + one survivor, not three


def test_live_store_ingester_replay_after_foldin_keeps_sink(spark, tmp_path):
    """The nastier replay window (found by round-7 verification): the
    first attempt sank survivors AND folded their fingerprints into
    the store, then crashed before the marker write. The replay's
    anti-join would find ZERO survivors (their fps are in the store
    now) — it must reuse the committed sink directory instead of
    overwriting it with nothing."""
    import shutil

    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.ops.text import fingerprint
    from dragnet_spark.streaming.pipeline import make_live_store_ingester

    store = str(tmp_path / "fstore")
    build_fingerprint_store(
        spark,
        spark.createDataFrame([(1, "previously stored text here ok")],
                              "doc_id long, text string"),
        store,
    )
    sink = str(tmp_path / "fsink")
    ingest = make_live_store_ingester(
        store, sink, "id", checkpoint=str(tmp_path / "fck")
    )
    batch = spark.createDataFrame(
        [("7", "some fresh survivor document text"),
         ("8", "another fresh survivor document")],
        "id string, text string",
    ).select("id", fingerprint("text").alias("__dn_fp"))
    ingest(batch, 0)
    # crash before the marker: the ledger never recorded batch 0
    shutil.rmtree(f"{store}/_dn_batch_ledger")
    # simulate mapreduce.fileoutputcommitter.marksuccessfuljobs=false
    # (common on object stores): no _SUCCESS is ever written — the
    # framework-owned _dn_committed sentinel must carry the commit
    # record alone (ADVICE r7 #1)
    import os as _os

    _os.remove(f"{sink}/__dn_batch=0/_SUCCESS")
    ingest(batch, 0)  # full replay, store already folded
    sunk = spark.read.parquet(sink)
    assert sunk.count() == 2, "replay clobbered the committed sink dir"
    assert {r["id"] for r in sunk.collect()} == {"7", "8"}
    # store may hold replayed duplicate fps; a probe still answers
    # min-doc_id semantics and compaction collapses them
    from dragnet_spark.index.fingerprints import compact_fingerprint_store

    compact_fingerprint_store(spark, store)
    assert spark.read.parquet(f"{store}/fingerprints").count() == 3


def test_live_store_ingester_legacy_success_dir_not_clobbered(
    spark, tmp_path
):
    """Upgrade path (r8 ADVICE low #2): batch dirs committed by the
    pre-sentinel code carry _SUCCESS but no _dn_committed. A replay
    after upgrading must treat them as committed (the store is already
    folded, so a recompute finds zero survivors and would overwrite
    the dir with nothing) and stamp the sentinel on first reuse."""
    import os as _os
    import shutil

    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.ops.text import fingerprint
    from dragnet_spark.streaming.pipeline import (
        _COMMIT_SENTINEL,
        make_live_store_ingester,
    )

    store = str(tmp_path / "lstore")
    build_fingerprint_store(
        spark,
        spark.createDataFrame([(1, "previously stored text here ok")],
                              "doc_id long, text string"),
        store,
    )
    sink = str(tmp_path / "lsink")
    ingest = make_live_store_ingester(
        store, sink, "id", checkpoint=str(tmp_path / "lck")
    )
    batch = spark.createDataFrame(
        [("7", "some fresh survivor document text")],
        "id string, text string",
    ).select("id", fingerprint("text").alias("__dn_fp"))
    ingest(batch, 0)
    bdir = f"{sink}/__dn_batch=0"
    # rewind to the pre-sentinel on-disk state: _SUCCESS present,
    # sentinel absent, ledger lost, store already folded
    _os.remove(f"{bdir}/{_COMMIT_SENTINEL}")
    shutil.rmtree(f"{store}/_dn_batch_ledger")
    ingest(batch, 0)  # replay under the upgraded code
    sunk = spark.read.parquet(sink)
    assert sunk.count() == 1, "replay clobbered a legacy committed dir"
    # one-time migration: the sentinel is stamped on first reuse
    assert _os.path.exists(f"{bdir}/{_COMMIT_SENTINEL}")


def test_stream_curate_against_srp_store_drops_semantic_twins(spark, tmp_path):
    """VERDICT r7 #1: in-stream SEMANTIC near-dedup. Embeddings stream
    in as typed parquet micro-batches; perturbed twins of stored
    vectors (paraphrase embeddings) must be dropped in-stream, fresh
    vectors survive, and the static-frame batch twin must agree
    exactly."""
    import numpy as np

    from dragnet_spark.index.fingerprints import build_srp_store
    from dragnet_spark.streaming.pipeline import (
        stream_curate_against_srp_store,
    )

    rng = np.random.RandomState(5)
    base = rng.standard_normal((6, 16))
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "srpstore")
    build_srp_store(spark, corpus, store, dims=16)

    # two micro-batch files: twins (tiny noise) + fresh vectors + an
    # exact in-stream duplicate pair (same vector twice)
    fresh = rng.standard_normal((3, 16)) * 2
    twin0 = (base[1] + rng.standard_normal(16) * 1e-4).tolist()
    twin1 = (base[4] + rng.standard_normal(16) * 1e-4).tolist()
    rows1 = [(100, twin0), (101, fresh[0].tolist()), (102, fresh[1].tolist())]
    rows2 = [(103, twin1), (104, fresh[2].tolist()),
             (105, fresh[0].tolist())]  # exact dup of 101's vector
    d = tmp_path / "stream_in"
    d.mkdir()
    schema = "vec_id long, embedding array<double>"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(d / "b2"))

    src = tmp_path / "src"
    src.mkdir()
    import glob
    import shutil

    for i, b in enumerate(("b1", "b2")):
        f = glob.glob(str(d / b / "*.parquet"))[0]
        shutil.copyfile(f, str(src / f"{i}.parquet"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = stream_curate_against_srp_store(sdf, store, "embedding")
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["vec_id"] for r in spark.read.parquet(sink).collect()}
    # twins 100/103 dropped by the store; exactly ONE of {101, 105}
    # survives (they carry the identical vector — which one wins
    # depends on arrival order, which the file source doesn't pin)
    assert got - {101, 105} == {102, 104}, got
    assert len(got & {101, 105}) == 1, got

    # batch twin: identical call on the static union (same
    # modulo-the-identical-pair rule)
    static = spark.createDataFrame(rows1 + rows2, schema)
    bres = stream_curate_against_srp_store(static, store, "embedding")
    bgot = {r["vec_id"] for r in bres.collect()}
    assert bgot - {101, 105} == {102, 104}, bgot
    assert len(bgot & {101, 105}) == 1, bgot


def test_stream_ingest_vector_index(spark, tmp_path):
    """VERDICT r7 #2: continuous embedding ingest into the IVF index.
    Streamed appends must equal a batch rebuild with the same
    centroids; replays must be ledger-skipped; the ~4x skew trigger
    must fire a recenter at the next stream startup and probe answers
    must stay exact afterwards."""
    import glob
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from dragnet_spark.index.vector import (
        build_vector_index,
        load_vector_index_meta,
        maybe_recenter_vector_index,
        query_vector_index,
        vector_index_skew,
    )
    from dragnet_spark.streaming.pipeline import (
        make_vindex_appender,
        stream_ingest_vector_index,
    )

    rng = np.random.RandomState(2)
    sch = "vec_id long, embedding array<double>"
    base = rng.standard_normal((120, 8))
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(120)], sch
    )
    path = str(tmp_path / "vx")
    # 8 centroids: max/mean skew is bounded by the cell count, so the
    # 4x trigger needs K > 4 to be reachable at all
    build_vector_index(spark, corpus, path, n_centroids=8)

    # two micro-batch files of fresh vectors
    b1 = [(1000 + i, rng.standard_normal(8).tolist()) for i in range(40)]
    b2 = [(2000 + i, rng.standard_normal(8).tolist()) for i in range(40)]
    src = tmp_path / "vsrc"
    src.mkdir()
    for i, rows in enumerate((b1, b2)):
        stage = tmp_path / f"vstage{i}"
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(str(stage))
        shutil.copyfile(
            glob.glob(str(stage / "*.parquet"))[0], str(src / f"{i}.parquet")
        )

    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    ck = str(tmp_path / "vck")
    q = stream_ingest_vector_index(
        sdf, path, ck, trigger_available_now=True
    )
    q.awaitTermination(120)

    # streamed appends == rebuild with the SAME centroids
    meta = load_vector_index_meta(path)
    union = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(120)] + b1 + b2, sch
    )
    rebuilt = str(tmp_path / "vx_rebuild")
    build_vector_index(
        spark, union, rebuilt, centroids=meta["centroids"]
    )
    queries = union.filter(F.col("vec_id") < 5)
    got = {
        tuple(r)
        for r in query_vector_index(spark, path, queries, k=3, n_probe=4).collect()
    }
    want = {
        tuple(r)
        for r in query_vector_index(spark, rebuilt, queries, k=3, n_probe=4).collect()
    }
    assert got == want and got

    # replay discipline: an already-committed batch id is a no-op
    store_count = spark.read.parquet(f"{path}/vectors").count()
    app = make_vindex_appender(path, checkpoint=ck)
    app(spark.createDataFrame(b1, sch), 0)  # marker exists -> skipped
    assert spark.read.parquet(f"{path}/vectors").count() == store_count

    # drift one cell past the ~4x trigger, then restart the stream:
    # recenter must fire exactly once and probes stay exact
    hot = base[0] / np.linalg.norm(base[0])
    # a REAL cluster (sigma=1), not a point-mass: k-means can split a
    # spread cluster across cells at recenter time, which is what lets
    # the post-recenter skew drop back under the trigger
    drift = [
        (9000 + i, (hot * 5 + rng.standard_normal(8)).tolist())
        for i in range(1200)
    ]
    stage = tmp_path / "vstage_drift"
    spark.createDataFrame(drift, sch).coalesce(1).write.parquet(str(stage))
    shutil.copyfile(
        glob.glob(str(stage / "*.parquet"))[0], str(src / "2.parquet")
    )
    q = stream_ingest_vector_index(sdf, path, ck, trigger_available_now=True)
    q.awaitTermination(120)
    assert vector_index_skew(spark, path) >= 4.0
    tok_before = load_vector_index_meta(path)["layout_token"]
    q = stream_ingest_vector_index(sdf, path, ck, trigger_available_now=True)
    q.awaitTermination(120)
    meta_after = load_vector_index_meta(path)
    assert meta_after["layout_token"] != tok_before, "recenter did not fire"
    assert not maybe_recenter_vector_index(spark, path), (
        "skew still over trigger after recenter"
    )
    # post-recenter probe at full n_probe is exhaustive == exact top-k
    from dragnet_spark.ops.similarity import cosine_topk

    full = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(120)] + b1 + b2 + drift, sch
    )
    got2 = {
        tuple(r)
        for r in query_vector_index(
            spark, path, queries, k=3,
            n_probe=meta_after["n_centroids"],
        ).collect()
    }
    want2 = {
        tuple(r) for r in cosine_topk(full, queries, k=3).collect()
    }
    assert got2 == want2


def test_live_srp_store_self_feeds_across_batches(spark, tmp_path):
    """stream_ingest_with_live_srp_store: a semantic near-dup arriving
    in a LATER micro-batch is dropped because batch 1 folded its
    original's band keys into the store the moment it was sunk — no
    watermark state could span the gap."""
    import glob
    import shutil

    import numpy as np

    from dragnet_spark.index.fingerprints import build_srp_store
    from dragnet_spark.streaming.pipeline import (
        stream_ingest_with_live_srp_store,
    )

    rng = np.random.RandomState(6)
    sch = "vec_id long, embedding array<double>"
    seeded = rng.standard_normal((3, 16))
    store = str(tmp_path / "lsrp")
    build_srp_store(
        spark,
        spark.createDataFrame(
            [(i, seeded[i].tolist()) for i in range(3)], sch
        ),
        store,
        dims=16,
    )

    first_fresh = rng.standard_normal(16)
    rows1 = [
        (100, first_fresh.tolist()),              # fresh -> survives
        (101, (seeded[1] + rng.standard_normal(16) * 1e-4).tolist()),
        # ^ twin of a PRE-SEEDED store vector -> dropped
    ]
    rows2 = [
        (200, (first_fresh + rng.standard_normal(16) * 1e-4).tolist()),
        # ^ twin of batch-1's survivor: only the LIVE fold-in catches it
        (201, (rng.standard_normal(16) * 2).tolist()),  # fresh
    ]
    src = tmp_path / "lsrc"
    src.mkdir()
    for i, rows in enumerate((rows1, rows2)):
        stage = tmp_path / f"lstage{i}"
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(str(stage))
        shutil.copyfile(
            glob.glob(str(stage / "*.parquet"))[0], str(src / f"{i}.parquet")
        )

    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    sink = str(tmp_path / "lsink")
    q = stream_ingest_with_live_srp_store(
        sdf, store, sink, str(tmp_path / "lck")
    )
    from dragnet_spark.streaming.pipeline import drain_stream

    drain_stream(q, min_data_batches=2)
    q.stop()
    q.awaitTermination(60)

    got = {r["vec_id"] for r in spark.read.parquet(sink).collect()}
    assert got == {100, 201}, got

    # replay after fold-in UNDER THE SAME CHECKPOINT: committed sink
    # dir reused, not clobbered (the anti-join would now drop
    # everything — their band keys are folded in)
    from dragnet_spark.streaming.pipeline import make_live_srp_ingester

    ing = make_live_srp_ingester(
        store, sink, "vec_id", "embedding",
        checkpoint=str(tmp_path / "lck"),  # SAME checkpoint as the stream
    )
    batch1 = spark.createDataFrame(rows1, sch)
    shutil.rmtree(f"{store}/_dn_batch_ledger", ignore_errors=True)
    ing(batch1, 0)  # replay: sentinel key matches -> dir reused
    sunk0 = spark.read.parquet(f"{sink}/__dn_batch=0")
    assert sunk0.count() == 1  # batch-1's survivor kept, not erased

    # a DIFFERENT checkpoint replaying batch id 0 must NOT alias the
    # old run's committed dir as its own survivor set (ADVICE r7 #3):
    # the sentinel key mismatches, the anti-join recomputes, and —
    # since every rows1 vector is already in the store — batch 0 of
    # the NEW run legitimately has zero survivors
    shutil.rmtree(f"{store}/_dn_batch_ledger", ignore_errors=True)
    ing2 = make_live_srp_ingester(
        store, sink, "vec_id", "embedding",
        checkpoint=str(tmp_path / "lck2"),
    )
    ing2(batch1, 0)
    assert spark.read.parquet(f"{sink}/__dn_batch=0").count() == 0


def test_stream_kmv_vocab_census_matches_batch(spark, tmp_path):
    """make_kmv_vocab_ingester: N micro-batch folds of the vocab
    sketch are bit-identical to one build over the concatenated data
    (bottom-k mergeability), and re-folding a batch (at-least-once
    replay) changes nothing."""
    import json

    from pyspark.sql import functions as F

    from dragnet_spark.index.kmv import build_kmv_store, merge_kmv_batch
    from dragnet_spark.ops.text import tokens
    from dragnet_spark.streaming.pipeline import make_kmv_vocab_ingester

    d = tmp_path / "in"
    d.mkdir()
    texts = {}
    for b in range(3):
        lines = []
        for i in range(40):
            t = " ".join(f"w{(b * 37 + i * 11 + j) % 300}" for j in range(12))
            texts[(b, i)] = t
            lines.append(json.dumps({"src": f"s{i % 2}", "text": t}))
        (d / f"{b}.json").write_text("\n".join(lines) + "\n")

    store = str(tmp_path / "vocab")
    empty = spark.createDataFrame([], "src string, tok string")
    build_kmv_store(spark, empty, store, "tok", ["src"], k=64)

    sch = "src string, text string"
    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    ingest = make_kmv_vocab_ingester(store, "text", "src")
    q = (
        sdf.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    def sketch_rows(path):
        return sorted(map(tuple, spark.read.parquet(path + "/sketch").collect()))

    one = str(tmp_path / "oneshot")
    alldocs = spark.read.schema(sch).json(str(d))
    build_kmv_store(
        spark,
        alldocs.select("src", F.explode(tokens("text")).alias("tok")),
        one, "tok", ["src"], k=64,
    )
    assert sketch_rows(store) == sketch_rows(one)

    # at-least-once replay: re-fold batch 0, sketch must not move
    replay = spark.read.schema(sch).json(str(d / "0.json"))
    merge_kmv_batch(
        spark,
        replay.select("src", F.explode(tokens("text")).alias("tok")),
        store,
    )
    assert sketch_rows(store) == sketch_rows(one)
