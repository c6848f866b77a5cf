#!/usr/bin/env python
"""Streaming vector-index ingest soak (VERDICT r6 #2 "Done ="
criterion): a stream grows the quantized IVF index from K=1 to K=16
replicas of the sf0.1 embeddings via `stream_ingest_vector_index`
(foreachBatch → `append_vector_index` against the PERSISTED
centroids, batch-id ledger against replays), then a planted drift
phase pushes cell skew past the documented ~4× trigger so the next
stream startup recenters. Checks:

* **append == rebuild** — after the streamed K=16 growth, a 64-query
  probe against the streamed index equals the probe against a fresh
  rebuild over the same union with the SAME centroids, exactly;
* **replay discipline** — re-invoking the appender with a committed
  batch id leaves the store untouched;
* **recenter fires exactly once** — skew ≥ 4 after the drift phase,
  the next `stream_ingest_vector_index` startup recenters (layout
  token changes), a further startup does not;
* **mid-run recenter** (VERDICT r8 #2) — a second drift wave arrives
  WHILE a stream with ``recenter_every=1`` is consuming: startup sees
  balanced cells (no recenter), the in-loop every-N-batches skew
  check trips mid-run (layout token changes during the pass), the
  trailing batches append against the NEW centroids, no rows are
  lost, and an n_probe=4 probe equals a rebuild with the same
  post-recenter centroids over the dequantized store;
* **oracle-exact after recenter** — at n_probe == n_centroids the
  recentered quantized index is exhaustive over dequantized vectors:
  its top-k equals brute-force cosine over the same dequantized
  corpus, bit-for-bit (runs LAST among the drift checks, so it also
  covers the mid-run recentered state);
* **mid-run cell GROWTH** (round 9) — a separate small index built
  with a ``target_rows_per_cell`` policy absorbs K_g replicas of
  BALANCED data while a ``recenter_every=2`` stream consumes: skew
  stays ~1 the whole run (the drift trigger can never fire), the
  growth trigger (mean ≥ 2× target) trips in-loop, the cell count
  GROWS mid-run (layout token + n_centroids change during the pass),
  no rows are lost, and the exhaustive probe over the grown layout
  equals brute-force cosine bit-for-bit.

Usage: python tools/soak_vindex_stream.py [K] (default 16)
Prints one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.index.vector import (  # noqa: E402
    build_vector_index,
    load_vector_index_meta,
    query_vector_index,
    vector_index_skew,
)
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.sources.tables import load_table  # noqa: E402
from dragnet_spark.streaming.pipeline import (  # noqa: E402
    make_vindex_appender,
    stream_ingest_vector_index,
)
from tools.soak_curation import embedding_replica  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCHEMA = "vec_id long, embedding array<double>"


def _drop_file(df, src_dir: Path, stage_root: Path, name: str) -> None:
    stage = stage_root / f"stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = glob.glob(str(stage / "*.parquet"))[0]
    shutil.move(part, str(src_dir / f"{name}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def main() -> None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="soak_vindex_stream")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n0 = emb.count()

    root = Path(tempfile.mkdtemp(prefix="soak_vxs_"))
    path = str(root / "index")
    src = root / "in"
    src.mkdir()
    ck = str(root / "ck")

    build_vector_index(
        spark, emb, path, n_centroids=16, quantize=True
    )
    meta0 = load_vector_index_meta(path)

    # K-1 replica files land BEFORE the stream starts; availableNow
    # with maxFilesPerTrigger=2 then consumes them as ~K/2 batches
    for r in range(1, K):
        repl = embedding_replica(emb, r).select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"), "embedding"
        )
        _drop_file(repl, src, root, f"{r:03d}")

    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(str(src))
    )
    t0 = time.time()
    q = stream_ingest_vector_index(
        sdf, path, ck, recenter_every=0, trigger_available_now=True
    )
    q.awaitTermination(1200)
    t_stream = round(time.time() - t0, 2)
    n_streamed = spark.read.parquet(f"{path}/vectors").count()

    # probe == rebuild with the same centroids over the same union
    union = emb
    for r in range(1, K):
        union = union.unionByName(
            embedding_replica(emb, r).select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"), "embedding"
            )
        )
    rebuilt = str(root / "rebuilt")
    build_vector_index(
        spark, union, rebuilt, centroids=meta0["centroids"], quantize=True
    )
    queries = emb.filter(F.col("vec_id") < 64)
    t0 = time.time()
    got = {
        tuple(r)
        for r in query_vector_index(
            spark, path, queries, k=5, n_probe=4
        ).collect()
    }
    t_probe = round(time.time() - t0, 2)
    want = {
        tuple(r)
        for r in query_vector_index(
            spark, rebuilt, queries, k=5, n_probe=4
        ).collect()
    }
    append_eq_rebuild = got == want and len(got) > 0

    # replay discipline: committed batch id -> no-op
    app = make_vindex_appender(path, checkpoint=ck)
    app(emb.limit(100), 0)
    replay_skipped = (
        spark.read.parquet(f"{path}/vectors").count() == n_streamed
    )

    # drift phase: a REAL cluster 3x the current store size in one
    # direction -> one cell inflates past the 4x max/mean trigger
    first = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )
    hot = first / np.linalg.norm(first)
    rng = np.random.RandomState(3)
    n_drift = 3 * n0 * K
    drift_rows = [
        (50_000_000 + i, (hot * 8 + rng.standard_normal(64)).tolist())
        for i in range(n_drift)
    ]
    _drop_file(
        spark.createDataFrame(drift_rows, SCHEMA), src, root, "drift"
    )
    q = stream_ingest_vector_index(
        sdf, path, ck, recenter_every=0, trigger_available_now=True
    )
    q.awaitTermination(1200)
    skew_after_drift = round(vector_index_skew(spark, path), 2)

    tok_before = load_vector_index_meta(path)["layout_token"]
    t0 = time.time()
    q = stream_ingest_vector_index(
        sdf, path, ck, recenter_every=0, trigger_available_now=True
    )
    q.awaitTermination(1200)
    t_recenter = round(time.time() - t0, 2)
    tok_after = load_vector_index_meta(path)["layout_token"]
    recenter_fired = tok_after != tok_before
    skew_after_recenter = round(vector_index_skew(spark, path), 2)
    q = stream_ingest_vector_index(
        sdf, path, ck, recenter_every=0, trigger_available_now=True
    )
    q.awaitTermination(1200)
    recenter_once = (
        load_vector_index_meta(path)["layout_token"] == tok_after
    )

    # ---- MID-RUN recenter (VERDICT r8 #2): drift arrives WHILE the
    # stream is running and the in-loop every-N-batches skew check
    # must heal it without a restart. Drop a second hot cluster (~S/2
    # rows, tight: signal 20 vs noise ~8) plus trailing fresh
    # batches, then run ONE stream pass with recenter_every=1:
    # startup sees low skew (no recenter), the drift batch trips the
    # in-loop check, and the trailing batches append against the NEW
    # centroids.
    s_before_mid = spark.read.parquet(f"{path}/vectors").count()
    second = np.asarray(
        emb.filter(F.col("vec_id") == 1).first()["embedding"],
        dtype=np.float64,
    )
    hot2 = second / np.linalg.norm(second)
    n_drift2 = s_before_mid // 2
    drift2_rows = [
        (60_000_000 + i, (hot2 * 20 + rng.standard_normal(64)).tolist())
        for i in range(n_drift2)
    ]
    _drop_file(
        spark.createDataFrame(drift2_rows, SCHEMA), src, root, "drift2"
    )
    for r in range(K, K + 4):
        repl = embedding_replica(emb, r).select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"), "embedding"
        )
        _drop_file(repl, src, root, f"{r:03d}")
    tok_mid_before = load_vector_index_meta(path)["layout_token"]
    skew_at_start = round(vector_index_skew(spark, path), 2)
    t0 = time.time()
    q = stream_ingest_vector_index(
        sdf, path, ck, recenter_every=1, trigger_available_now=True
    )
    q.awaitTermination(1800)
    t_midrun = round(time.time() - t0, 2)
    tok_mid_after = load_vector_index_meta(path)["layout_token"]
    # startup could not have recentered (skew was < 4), so a changed
    # token proves the IN-LOOP check fired while the stream ran
    midrun_recenter_fired = (
        skew_at_start < 4.0 and tok_mid_after != tok_mid_before
    )
    skew_after_midrun = round(vector_index_skew(spark, path), 2)
    n_after_mid = spark.read.parquet(f"{path}/vectors").count()
    midrun_no_rows_lost = (
        n_after_mid == s_before_mid + n_drift2 + 4 * n0
    )
    # post-recenter probes == rebuild with the SAME (post-recenter)
    # centroids over the dequantized store contents
    meta_mid = load_vector_index_meta(path)
    dq_store = spark.read.parquet(f"{path}/vectors").select(
        "vec_id",
        F.transform(
            "qvec", lambda qv: qv.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    rebuilt_mid = str(root / "rebuilt_mid")
    build_vector_index(
        spark, dq_store, rebuilt_mid,
        centroids=meta_mid["centroids"], quantize=True,
    )
    got_mid = {
        tuple(r)
        for r in query_vector_index(
            spark, path, queries, k=5, n_probe=4
        ).collect()
    }
    want_mid = {
        tuple(r)
        for r in query_vector_index(
            spark, rebuilt_mid, queries, k=5, n_probe=4
        ).collect()
    }
    midrun_probe_equals_rebuild = got_mid == want_mid and len(got_mid) > 0

    # oracle-exact after recenter: exhaustive probe == brute force over
    # the dequantized store contents (quantization is part of the
    # contract: the stored corpus IS int8 codes + scales)
    meta2 = load_vector_index_meta(path)
    store = spark.read.parquet(f"{path}/vectors").select(
        "vec_id",
        F.transform(
            "qvec", lambda qv: qv.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    from dragnet_spark.ops.similarity import cosine_topk_blocked

    t0 = time.time()
    got2 = {
        tuple(r)
        for r in query_vector_index(
            spark, path, queries, k=5, n_probe=meta2["n_centroids"]
        ).collect()
    }
    t_full_probe = round(time.time() - t0, 2)
    want2 = {
        tuple(r)
        for r in cosine_topk_blocked(store, queries, k=5).collect()
    }
    oracle_exact_after_recenter = got2 == want2 and len(got2) > 0

    # ---- mid-run cell GROWTH (round 9): balanced ingest against a
    # target_rows_per_cell policy. Skew stays ~1 for the whole run, so
    # ONLY the growth trigger can recenter; it must fire in-loop and
    # grow the cell count while the stream is consuming.
    K_G = 8
    g_path = str(root / "gindex")
    g_src = root / "gin"
    g_src.mkdir()
    g_ck = str(root / "gck")
    target = max(n0 // 8, 1)
    build_vector_index(
        spark, emb, g_path, n_centroids=8, quantize=True,
        target_rows_per_cell=target,
    )
    g_cells0 = load_vector_index_meta(g_path)["n_centroids"]
    g_tok0 = load_vector_index_meta(g_path)["layout_token"]
    for r in range(1, K_G):
        repl = embedding_replica(emb, 100 + r).select(
            (F.col("vec_id") + (100 + r) * 1_000_000).alias("vec_id"),
            "embedding",
        )
        _drop_file(repl, g_src, root, f"g{r:03d}")
    g_sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(g_src))
    )
    g_skew_start = round(vector_index_skew(spark, g_path), 2)
    t0 = time.time()
    q = stream_ingest_vector_index(
        g_sdf, g_path, g_ck, recenter_every=2, trigger_available_now=True
    )
    q.awaitTermination(1800)
    t_growth = round(time.time() - t0, 2)
    g_meta = load_vector_index_meta(g_path)
    g_skew_end = round(vector_index_skew(spark, g_path), 2)
    growth_fired_midrun = (
        g_skew_start < 4.0
        and g_skew_end < 4.0
        and g_meta["layout_token"] != g_tok0
        and g_meta["n_centroids"] > g_cells0
    )
    g_rows = spark.read.parquet(f"{g_path}/vectors").count()
    growth_no_rows_lost = g_rows == K_G * n0
    g_store = spark.read.parquet(f"{g_path}/vectors").select(
        "vec_id",
        F.transform(
            "qvec", lambda qv: qv.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    got_g = {
        tuple(r)
        for r in query_vector_index(
            spark, g_path, queries, k=5, n_probe=g_meta["n_centroids"]
        ).collect()
    }
    want_g = {
        tuple(r) for r in cosine_topk_blocked(g_store, queries, k=5).collect()
    }
    growth_oracle_exact = got_g == want_g and len(got_g) > 0

    result = {
        "soak": "vindex_stream_ingest",
        "K": K,
        "corpus_rows": n0,
        "streamed_store_rows": n_streamed,
        "stream_append_wall_sec": t_stream,
        "append_probe_equals_rebuild": append_eq_rebuild,
        "replay_skipped": replay_skipped,
        "skew_after_drift": skew_after_drift,
        "recenter_fired": recenter_fired,
        "recenter_wall_sec": t_recenter,
        "skew_after_recenter": skew_after_recenter,
        "recenter_fired_once": recenter_once,
        "probe_wall_sec_nprobe4": t_probe,
        "full_probe_wall_sec": t_full_probe,
        "oracle_exact_after_recenter": oracle_exact_after_recenter,
        "midrun_skew_at_start": skew_at_start,
        "midrun_wall_sec": t_midrun,
        "midrun_recenter_fired": midrun_recenter_fired,
        "skew_after_midrun": skew_after_midrun,
        "midrun_no_rows_lost": midrun_no_rows_lost,
        "midrun_probe_equals_rebuild": midrun_probe_equals_rebuild,
        "growth_K": K_G,
        "growth_target_rows_per_cell": target,
        "growth_skew_start": g_skew_start,
        "growth_skew_end": g_skew_end,
        "growth_cells": [g_cells0, g_meta["n_centroids"]],
        "growth_wall_sec": t_growth,
        "growth_fired_midrun": growth_fired_midrun,
        "growth_no_rows_lost": growth_no_rows_lost,
        "growth_oracle_exact": growth_oracle_exact,
    }
    print(json.dumps(result))
    ok = (
        append_eq_rebuild
        and replay_skipped
        and skew_after_drift >= 4.0
        and recenter_fired
        and recenter_once
        and midrun_recenter_fired
        and midrun_no_rows_lost
        and midrun_probe_equals_rebuild
        and oracle_exact_after_recenter
        and growth_fired_midrun
        and growth_no_rows_lost
        and growth_oracle_exact
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
