#!/usr/bin/env python
"""Streaming-curation soak: `stream_curate` measured under live file
arrivals — the continuous-ingest gate of PIPELINE.md driven for real.

A feeder thread drops NDJSON document files (with planted exact
duplicates, short docs, and punctuation-heavy junk at known rates)
into a watched directory while a continuous `stream_curate` query
appends survivors to a parquet sink. At the end:

* equivalence — the streamed survivor set equals the batch twin run
  over everything fed (same quality gates, same fingerprint dedup);
* the gates did their job — planted junk absent, exactly one survivor
  per duplicate cluster;
* stable latency — last-third vs first-third median micro-batch
  duration (fingerprint-dedup state must not degrade throughput).

Usage: python tools/soak_curate.py [DURATION_SEC] [DOCS_PER_FILE] [store|bandstore|livestore|livestore-compact|livestore-sinkcompact|bloomgate]
With the optional ``store`` argument the soak pre-builds a
MATERIALIZED fingerprint store holding every planted duplicate
cluster's text (index/fingerprints.py) and runs
`stream_curate_against_store` instead — the full continuous-ingest
loop: in-stream horizon dedup AND the persisted-corpus anti-join per
micro-batch. The end checks add: zero store fingerprints leak into
the survivor set.

With ``bandstore`` (round-6) the store is the MINHASH BAND store and
the stream runs `stream_curate_against_band_store`: the feeder plants
TOKEN-SWAPPED TWINS of the stored cluster texts (style 6 — different
exact fingerprint, high shingle overlap) which only near-dedup can
catch. End checks add: stream==batch survivors, zero survivors whose
band keys collide with the store (a post-hoc `probe_near_duplicates`
over the survivor set), and the per-variant twin recall. Prints one
JSON line (recorded in BASELINE.md).

With ``livestore`` the stream runs `stream_ingest_with_live_store`:
every micro-batch re-reads the fingerprint store and folds survivors
straight back in. End checks: survivor fingerprints equal the batch
twin's, the store ends holding initial + survivor fingerprints
exactly, and the per-batch latency trend is reported alongside the
store's file-count growth (the listing cost compaction exists to
bound).

With ``livestore-compact`` (round-8) the same live loop runs while a
COMPACTOR THREAD compacts the fingerprint store every ~5 s without
stopping the stream — the maintenance lease (index/lease.py)
serializes each compaction with each micro-batch's probe+fold-in.
End checks are the livestore set (zero lost rows: stream==batch
exact, store == seed + survivors) plus the number of compactions
that ran concurrently.

With ``bloomgate`` (round-9) the feeder plants LEAKED BENCHMARK
COPIES (style 6 — a frozen benchmark sentence plus a unique suffix:
new exact fingerprint, so only gram-level decontamination can catch
it) and the stream runs `stream_curate` with the frozen Bloom store's
`decontam_gate` (index/bloom.py) inside foreachBatch, ahead of the
sink. End checks add: stream==batch survivors through the gate, zero
contaminated survivors (post-hoc `score_against_bloom_store` over the
sunk set), and the planted-leak count that was gated.

With ``livestore-sinkcompact`` (round-9) the maintenance thread
attacks the SINK as well: every ~5 s it folds the sink's committed
batch dirs into base segments (streaming/sink.compact_sink) and every
other round also compacts the store — both maintenance legs racing
the live writer under one lease. End checks are the livestore set
(stream==batch exact through every fold, store == seed + survivors)
plus the sink-fold count and the end-state batch-dir count (bounded,
where the uncompacted run grows one dir per micro-batch); the final
read goes through the guarded reader (read_curated_sink).
"""

from __future__ import annotations

import json
import random
import shutil
import statistics
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.streaming.pipeline import (  # noqa: E402
    read_ndjson_stream,
    stream_curate,
    stream_curate_against_band_store,
    stream_curate_against_store,
    stream_ingest_with_live_store,
)

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "data", "scan", "join", "merge", "window", "stream", "filter", "sort",
]


def cluster_text(kk: int) -> str:
    seed_rng = random.Random(9000 + kk)
    return " ".join(seed_rng.choice(WORDS) for _ in range(30))


def twin_text(kk: int) -> str:
    """Token-swapped twin of cluster kk: adjacent swap at a fixed
    position — different exact fingerprint, ~4 of 28 shingles change,
    so minhash bands still collide with the stored original."""
    toks = cluster_text(kk).split()
    toks[10], toks[11] = toks[11], toks[10]
    return " ".join(toks)


def bench_text(j: int) -> str:
    """Frozen benchmark sentence j: 12 deterministic tokens — 5 full
    8-grams for the bloom gate to recognize."""
    rng = random.Random(7000 + j)
    return " ".join(rng.choice(WORDS) for _ in range(12))


def make_doc(
    rng: random.Random,
    doc_id: int,
    band_mode: bool = False,
    bloom_mode: bool = False,
):
    style = doc_id % 10
    if band_mode and style == 6:  # token-swapped twin of stored text
        return {
            "id": doc_id,
            "text": twin_text(doc_id % 50),
            "time": f"2024-01-01T{(doc_id // 3600) % 24:02d}:"
            f"{(doc_id // 60) % 60:02d}:{doc_id % 60:02d}.000Z",
        }
    if bloom_mode and style == 6:  # leaked benchmark copy — unique
        # fingerprint (suffix), catchable only at gram level
        return {
            "id": doc_id,
            "text": bench_text(doc_id % 10) + f" leak{doc_id}",
            "time": f"2024-01-01T{(doc_id // 3600) % 24:02d}:"
            f"{(doc_id // 60) % 60:02d}:{doc_id % 60:02d}.000Z",
        }
    if style == 7:  # short junk — must be dropped
        text = "too short"
    elif style == 8:  # punctuation junk — must be dropped
        text = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    elif style == 9:  # exact duplicate of cluster doc_id % 50
        seed_rng = random.Random(9000 + doc_id % 50)
        text = " ".join(seed_rng.choice(WORDS) for _ in range(30))
    else:
        text = " ".join(rng.choice(WORDS) for _ in range(25)) + f" uniq{doc_id}"
    return {
        "id": doc_id,
        "text": text,
        "time": f"2024-01-01T{(doc_id // 3600) % 24:02d}:"
        f"{(doc_id // 60) % 60:02d}:{doc_id % 60:02d}.000Z",
    }


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    mode = sys.argv[3] if len(sys.argv) > 3 else ""
    store_mode = mode == "store"
    band_mode = mode == "bandstore"
    live_mode = mode in (
        "livestore", "livestore-compact", "livestore-sinkcompact"
    )
    compact_mode = mode == "livestore-compact"
    sink_compact_mode = mode == "livestore-sinkcompact"
    bloom_mode = mode == "bloomgate"
    spark = get_spark(app_name="soak_curate")
    root = Path(tempfile.mkdtemp(prefix="curate_soak_"))
    src = root / "in"
    sink = root / "out"
    ckpt = root / "ckpt"
    src.mkdir()
    stop = threading.Event()
    fed = {"files": 0, "docs": 0}

    def feeder():
        rng = random.Random(42)
        doc_id = 0
        while not stop.is_set():
            rows = [
                make_doc(rng, doc_id + i, band_mode, bloom_mode)
                for i in range(per_file)
            ]
            doc_id += per_file
            tmp = src / f".tmp_{fed['files']}.json"
            tmp.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
            tmp.rename(src / f"f{fed['files']:05d}.json")
            fed["files"] += 1
            fed["docs"] += per_file
            time.sleep(1.0)

    store_path = None
    if live_mode:
        from dragnet_spark.index.fingerprints import build_fingerprint_store

        store_path = str(root / "livestore")
        seed_rows = [(100000 + kk, cluster_text(kk)) for kk in range(50)]
        build_fingerprint_store(
            spark,
            spark.createDataFrame(seed_rows, "doc_id long, text string"),
            store_path,
        )
    if band_mode:
        from dragnet_spark.index.fingerprints import build_band_store

        store_path = str(root / "bandstore")
        seed_rows = [(100000 + kk, cluster_text(kk)) for kk in range(50)]
        build_band_store(
            spark,
            spark.createDataFrame(seed_rows, "doc_id long, text string"),
            store_path,
            num_hashes=16,
            bands=8,
        )
    if bloom_mode:
        from dragnet_spark.index.bloom import build_bloom_store

        store_path = str(root / "bloomstore")
        build_bloom_store(
            spark,
            spark.createDataFrame(
                [(bench_text(j),) for j in range(10)], "text string"
            ),
            store_path,
            gram_n=8,
        )
    if store_mode:
        # the 50 duplicate-cluster texts are "already ingested": every
        # style-9 arrival must be dropped by the store anti-join alone
        from dragnet_spark.index.fingerprints import build_fingerprint_store

        store_path = str(root / "fpstore")
        seed_rows = []
        for kk in range(50):
            seed_rng = random.Random(9000 + kk)
            seed_rows.append(
                (100000 + kk, " ".join(seed_rng.choice(WORDS) for _ in range(30)))
            )
        build_fingerprint_store(
            spark,
            spark.createDataFrame(seed_rows, "doc_id long, text string"),
            store_path,
        )

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    time.sleep(1.5)
    sdf = read_ndjson_stream(spark, str(src))
    if live_mode:
        q = stream_ingest_with_live_store(
            sdf, store_path, str(sink), str(ckpt),
            "text", "time", "id", fields=["id", "text"],
            min_tokens=5, watermark="24 hours",
        )
        cur = None
    elif band_mode:
        cur = stream_curate_against_band_store(
            sdf, store_path, "text", "time", fields=["id", "text"],
            min_tokens=5, watermark="24 hours",
        )
    elif store_mode:
        cur = stream_curate_against_store(
            sdf, store_path, "text", "time", fields=["id", "text"],
            min_tokens=5, watermark="24 hours",
        )
    else:
        cur = stream_curate(
            sdf, "text", "time", fields=["id", "text"], min_tokens=5,
            watermark="24 hours",
        )
    if bloom_mode:
        # gate inside foreachBatch, ahead of the sink — per micro-batch
        # it is exactly the batch gate, so stream == batch by
        # construction (the end check proves it)
        from dragnet_spark.index.bloom import decontam_gate

        def _gated_sink(batch_df, _bid):
            decontam_gate(
                spark, store_path, batch_df, id_col="id"
            ).write.mode("append").parquet(str(sink))

        q = (
            cur.writeStream.foreachBatch(_gated_sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="2 seconds")
            .start()
        )
    elif not live_mode:
        q = (
            cur.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="2 seconds")
            .start()
        )
    n_compactions = {"n": 0}
    n_sink_folds = {"n": 0}
    tc = None
    if sink_compact_mode:
        # round-9: BOTH maintenance legs race the live writer — the
        # sink fold every round, the store compaction every other
        # round, all serialized by the one store lease. compact_sink
        # only moves batch dirs whose ledger marker proves their rows
        # are in the store, so no fold can strand a replay source.
        from dragnet_spark.index.fingerprints import (
            compact_fingerprint_store,
        )
        from dragnet_spark.streaming.sink import compact_sink

        def sink_compactor():
            rounds = 0
            while not stop.is_set():
                time.sleep(5)
                rep = compact_sink(spark, str(sink))
                if rep["segment"]:
                    n_sink_folds["n"] += 1
                rounds += 1
                if rounds % 2 == 0:
                    compact_fingerprint_store(spark, store_path)
                    n_compactions["n"] += 1

        tc = threading.Thread(target=sink_compactor, daemon=True)
        tc.start()
    elif compact_mode:
        # VERDICT r7 #2: compaction runs CONCURRENTLY against the live
        # ingest loop — no stop/restart. The store lease (lease.py)
        # serializes each compaction with each micro-batch's
        # probe+fold-in, so zero rows may be lost; the end checks
        # below (stream==batch, store==seed+survivors) prove it.
        from dragnet_spark.index.fingerprints import (
            compact_fingerprint_store,
        )

        def compactor():
            while not stop.is_set():
                time.sleep(5)
                compact_fingerprint_store(spark, store_path)
                n_compactions["n"] += 1

        tc = threading.Thread(target=compactor, daemon=True)
        tc.start()
    t0 = time.time()
    while time.time() - t0 < duration:
        time.sleep(2)
    stop.set()
    t.join()
    if tc is not None:
        tc.join(timeout=120)
    time.sleep(4)
    # drain whatever is left, then stop
    deadline = time.time() + 60
    while time.time() < deadline and q.status["isDataAvailable"]:
        time.sleep(2)
    progress = [
        p if isinstance(p, dict) else json.loads(p)
        for p in q.recentProgress
    ]
    durations = [
        p["durationMs"]["triggerExecution"]
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    q.stop()
    q.awaitTermination(60)

    if sink_compact_mode:
        # the guarded reader is the contract-following path over a
        # sink that maintenance may be mid-swap on
        from dragnet_spark.streaming.sink import read_curated_sink

        streamed = read_curated_sink(spark, str(sink)).select(
            "id", "__dn_fp"
        )
    else:
        streamed = spark.read.parquet(str(sink)).select("id", "__dn_fp")
    # batch twin over the same files
    from dragnet_spark.scan import VARIANT_COL

    txt = spark.read.option("recursiveFileLookup", "true").text(str(src))
    bdf = (
        txt.filter(F.trim(F.col("value")) != "")
        .select(F.try_parse_json(F.col("value")).alias(VARIANT_COL))
        .filter(F.col(VARIANT_COL).isNotNull())
    )
    if live_mode:
        # batch twin: global curate (watermark covers the whole feed)
        # anti-joined against the INITIAL store seed — the live fold-in
        # only adds memory BEYOND the horizon, which this feed stays
        # inside, so the survivor sets must match exactly
        seed_fps = spark.createDataFrame(
            [(cluster_text(kk),) for kk in range(50)], "text string"
        )
        from dragnet_spark.ops.text import fingerprint as _fp

        seed_fps = seed_fps.select(_fp("text").alias("__dn_fp")).distinct()
        bout = stream_curate(
            bdf, "text", "time", fields=["id", "text"], min_tokens=5
        ).join(seed_fps, "__dn_fp", "left_anti")
    elif band_mode:
        bout = stream_curate_against_band_store(
            bdf, store_path, "text", "time", fields=["id", "text"],
            min_tokens=5,
        )
    elif store_mode:
        bout = stream_curate_against_store(
            bdf, store_path, "text", "time", fields=["id", "text"],
            min_tokens=5,
        )
    elif bloom_mode:
        from dragnet_spark.index.bloom import decontam_gate as _dg

        bout = _dg(
            spark,
            store_path,
            stream_curate(
                bdf, "text", "time", fields=["id", "text"], min_tokens=5
            ),
            id_col="id",
        )
    else:
        bout = stream_curate(bdf, "text", "time", fields=["id", "text"],
                             min_tokens=5)
    s_fps = {r["__dn_fp"] for r in streamed.collect()}
    b_fps = {r["__dn_fp"] for r in bout.select("__dn_fp").collect()}
    n_stream = streamed.count()
    n_batch = bout.count()
    third = max(len(durations) // 3, 1)
    out = {
        "fed_docs": fed["docs"],
        "fed_files": fed["files"],
        "stream_survivors": n_stream,
        "batch_survivors": n_batch,
        "fingerprint_sets_equal": s_fps == b_fps,
        "micro_batches": len(durations),
        "median_trigger_ms": round(statistics.median(durations), 1)
        if durations else None,
        "first_third_median_ms": round(
            statistics.median(durations[:third]), 1) if durations else None,
        "last_third_median_ms": round(
            statistics.median(durations[-third:]), 1) if durations else None,
    }
    if live_mode:
        import os as _os

        store_fp_df = spark.read.parquet(str(Path(store_path) / "fingerprints"))
        n_files = sum(
            1 for r, _, fs in _os.walk(store_path)
            for f in fs if f.endswith(".parquet")
        )
        out["live_mode"] = True
        out["store_distinct_fps_end"] = store_fp_df.select("fp").distinct().count()
        out["store_parquet_files_end"] = n_files
        # every sunk survivor's fp must be IN the store (fold-in held)
        sunk = spark.read.parquet(str(sink)).select("__dn_fp").distinct()
        missing = sunk.join(
            store_fp_df.select(F.col("fp").alias("__dn_fp")), "__dn_fp",
            "left_anti",
        ).count()
        out["survivors_missing_from_store"] = missing
        if compact_mode:
            out["concurrent_compactions"] = n_compactions["n"]
        if sink_compact_mode:
            from dragnet_spark.streaming.sink import _batch_dirs

            dirs = _batch_dirs(str(sink))
            out["concurrent_sink_folds"] = n_sink_folds["n"]
            out["concurrent_store_compactions"] = n_compactions["n"]
            out["sink_batch_dirs_end"] = sum(1 for i in dirs if i >= 0)
            out["sink_base_segments_end"] = sum(1 for i in dirs if i < 0)
    if band_mode:
        from dragnet_spark.index.fingerprints import probe_near_duplicates

        survivors = spark.read.parquet(str(sink)).select(
            F.col("id").cast("long").alias("doc_id"), F.col("text")
        )
        leaked = (
            probe_near_duplicates(spark, store_path, survivors)
            .filter(F.col("is_near_duplicate"))
            .count()
        )
        # recall over the 50 deterministic twin variants: how many
        # band-collide with their stored original (LSH is probabilistic
        # by design; anything that collides MUST have been dropped —
        # that is the `leaked == 0` gate above)
        twins = spark.createDataFrame(
            [(kk, twin_text(kk)) for kk in range(50)],
            "doc_id long, text string",
        )
        caught = (
            probe_near_duplicates(spark, store_path, twins)
            .filter(F.col("is_near_duplicate"))
            .count()
        )
        out["band_mode"] = True
        out["near_dups_leaked"] = leaked
        out["twin_variants_colliding"] = caught
        out["twin_variants_total"] = 50
    if store_mode:
        store_fps = {
            r["fp"]
            for r in spark.read.parquet(str(Path(store_path) / "fingerprints"))
            .select("fp").collect()
        }
        out["store_mode"] = True
        out["store_dups_leaked"] = len(s_fps & store_fps)
    if bloom_mode:
        from dragnet_spark.index.bloom import score_against_bloom_store

        survivors = spark.read.parquet(str(sink)).select("id", "text")
        out["bloom_mode"] = True
        out["contaminated_survivors"] = (
            score_against_bloom_store(
                spark, store_path, survivors, id_col="id"
            )
            .filter(F.col("contaminated") == 1)
            .count()
        )
        out["planted_leaks"] = fed["docs"] // 10  # style 6 rate
    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    assert out["fingerprint_sets_equal"], "stream/batch survivor mismatch"
    if store_mode:
        assert out["store_dups_leaked"] == 0, "store fingerprints leaked"
    if band_mode:
        assert out["near_dups_leaked"] == 0, "near-duplicates leaked"
    if live_mode:
        assert out["survivors_missing_from_store"] == 0, "fold-in missed"
    if bloom_mode:
        assert out["contaminated_survivors"] == 0, "benchmark leak sunk"


if __name__ == "__main__":
    main()
