#!/usr/bin/env python
"""SRP-store streaming soak (VERDICT r6 #1 "Done =" criterion): a
continuous embedding-ingest stream curated against a persisted SRP
band store, with PLANTED perturbED-embedding twins at known noise
levels — semantic near-duplicates of the stored corpus that only
sign-projection banding can catch in-stream.

A feeder thread drops typed parquet files (vec_id, embedding) into a
watched directory: fresh gaussian vectors mixed with twins of stored
corpus vectors at three noise scales (σ = 1e-3 ≈ 0.06° — an exact
paraphrase re-embed; 0.05 ≈ 2.9°; 0.15 ≈ 8.5° — the loose edge of
the LSH family's recall curve). `stream_curate_against_srp_store`
runs continuously, appending survivors to a parquet sink. End checks:

* **stream == batch** — the streamed survivor set equals the static
  batch twin run over everything fed (same persisted planes, same
  integer sign arithmetic, so equality is exact, not approximate);
* **zero semantic-dup leaks** — no tight twin (σ ≤ 0.05) survives;
  loose-twin recall is reported against the analytic expectation
  1-(1-p^16)^8, p = 1-θ/π;
* **fresh pass-through** — fresh vectors survive (stray collisions at
  16-bit buckets are ~1.2e-4 per stored vector; any drop is counted);
* **stable latency** — last-third vs first-third median micro-batch
  duration.

Prints ONE JSON line (recorded in BASELINE.md).

Usage: python tools/soak_srp.py [DURATION_SEC] [VECS_PER_FILE]
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402

DIMS = 64
CORPUS_N = 2000
NOISE_LEVELS = {"tight": 1e-3, "mid": 0.05, "loose": 0.15}
TWIN_RATE = 0.25  # fraction of fed vectors that are planted twins


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark(app_name="soak_srp")
    from dragnet_spark.index.fingerprints import (
        build_srp_store,
        probe_srp_near_duplicates,
    )
    from dragnet_spark.streaming.pipeline import (
        stream_curate_against_srp_store,
    )

    root = Path(tempfile.mkdtemp(prefix="soak_srp_"))
    store = str(root / "store")
    src = root / "in"
    src.mkdir()
    sink = str(root / "sink")
    ckpt = str(root / "ckpt")

    rng = np.random.RandomState(42)
    corpus = rng.standard_normal((CORPUS_N, DIMS))
    schema = "vec_id long, embedding array<double>"
    build_srp_store(
        spark,
        spark.createDataFrame(
            [(i, corpus[i].tolist()) for i in range(CORPUS_N)], schema
        ),
        store,
        dims=DIMS,
    )

    stop = threading.Event()
    fed: list[tuple[int, list[float]]] = []
    planted: dict[str, set[int]] = {k: set() for k in NOISE_LEVELS}
    fed_lock = threading.Lock()

    def feeder() -> None:
        frng = np.random.RandomState(7)
        next_id = 1_000_000
        fno = 0
        levels = list(NOISE_LEVELS.items())
        while not stop.is_set():
            rows = []
            for _ in range(per_file):
                if frng.rand() < TWIN_RATE:
                    name, sigma = levels[frng.randint(len(levels))]
                    basev = corpus[frng.randint(CORPUS_N)]
                    v = basev + frng.standard_normal(DIMS) * sigma
                    planted[name].add(next_id)
                else:
                    v = frng.standard_normal(DIMS)
                rows.append((next_id, [float(x) for x in v]))
                next_id += 1
            with fed_lock:
                fed.extend(rows)
            df = spark.createDataFrame(rows, schema).coalesce(1)
            tmp = root / f"stage_{fno}"
            df.write.mode("overwrite").parquet(str(tmp))
            import glob as _glob
            import shutil as _shutil

            part = _glob.glob(str(tmp / "*.parquet"))[0]
            _shutil.move(part, str(src / f"{fno:06d}.parquet"))
            _shutil.rmtree(tmp, ignore_errors=True)
            fno += 1
            time.sleep(1.0)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    time.sleep(2.0)

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(str(src))
    )
    out = stream_curate_against_srp_store(sdf, store, "embedding")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="2 seconds")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < duration:
        time.sleep(2)
    stop.set()
    t.join()
    batch_secs = [
        p["batchDuration"] / 1000.0
        for p in (q.recentProgress or [])
        if p.get("batchDuration") and p.get("numInputRows", 0) > 0
    ]
    q.stop()
    q.awaitTermination(60)
    # final drain: an availableNow restart on the same checkpoint
    # consumes every file the feeder wrote, race-free — the live
    # query's isDataAvailable flag lags file arrivals
    q2 = (
        stream_curate_against_srp_store(sdf, store, "embedding")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    survivors = {r["vec_id"] for r in spark.read.parquet(sink).collect()}

    with fed_lock:
        all_fed = list(fed)
    static = spark.createDataFrame(all_fed, schema)
    batch_twin = {
        r["vec_id"]
        for r in stream_curate_against_srp_store(
            static, store, "embedding"
        ).collect()
    }

    leaks = {
        name: sorted(planted[name] & survivors)
        for name in ("tight", "mid")
    }
    recall = {
        name: (
            1.0
            - len(planted[name] & survivors) / max(1, len(planted[name]))
        )
        for name in NOISE_LEVELS
    }
    fresh_ids = {i for i, _ in all_fed} - set().union(*planted.values())
    fresh_dropped = len(fresh_ids - survivors)

    # post-hoc: no survivor's bands may collide with the store
    surv_df = static.join(
        spark.createDataFrame(
            [(i,) for i in survivors], "vec_id long"
        ),
        "vec_id",
    )
    # the curator's rule is corroborated evidence (≥2 bands with one
    # stored vector); a stray single-band collision on a survivor is
    # expected and harmless, so the check counts ≥2-band evidence
    post = probe_srp_near_duplicates(spark, store, surv_df, min_band_hits=2)
    post_colliders = post.filter("is_near_duplicate").count()

    lat_trend = None
    if len(batch_secs) >= 6:
        k = len(batch_secs) // 3
        lat_trend = round(
            statistics.median(batch_secs[-k:])
            / statistics.median(batch_secs[:k]),
            2,
        )

    result = {
        "soak": "srp_store_stream_curation",
        "duration_sec": duration,
        "fed_vectors": len(all_fed),
        "planted_twins": {k: len(v) for k, v in planted.items()},
        "survivors": len(survivors),
        "stream_equals_batch": survivors == batch_twin,
        "leaks_tight": len(leaks["tight"]),
        "leaks_mid": len(leaks["mid"]),
        "loose_twin_recall": round(recall["loose"], 4),
        "fresh_dropped": fresh_dropped,
        "post_hoc_surviving_colliders": post_colliders,
        "latency_trend_last3rd_over_first3rd": lat_trend,
        "micro_batches": len(batch_secs),
    }
    print(json.dumps(result))
    ok = (
        result["stream_equals_batch"]
        and result["leaks_tight"] == 0
        and result["leaks_mid"] == 0
        and result["post_hoc_surviving_colliders"] == 0
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
