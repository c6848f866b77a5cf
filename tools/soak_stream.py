#!/usr/bin/env python
"""Streaming soak: the continuous-build story measured, not argued.

A feeder thread drops a new NDJSON file into a watched directory every
``tick`` seconds while ``stream_build`` appends each micro-batch's
partial aggregates to the same partitioned parquet views the batch
build writes. Every ``compact_every`` files the stream is stopped, the
view tree compacted (``compact_index`` — the documented stop-compact-
resume maintenance contract), and the stream restarted from its
checkpoint. At the end the index answer is compared row-for-row
against a batch scan over everything that was fed.

Asserted / reported:

* equivalence — index rollup == raw batch scan (the closure property
  held across appends, compactions, and checkpoint restarts);
* bounded files — compaction keeps the per-bucket file count flat
  (one file per bucket after each compact) instead of growing with
  stream lifetime;
* stable latency — median trigger duration of the last third of
  micro-batches vs the first third (a leak in state or file listing
  would show as monotonic growth).

Usage: python tools/soak_stream.py [DURATION_SEC] [ROWS_PER_FILE]
Prints one JSON line with the numbers (recorded in BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dragnet_spark.index.build import Metric, compact_index  # noqa: E402
from dragnet_spark.index.query import query_index  # noqa: E402
from dragnet_spark.query import QueryConfig  # noqa: E402
from dragnet_spark.scan import scan_ndjson  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.streaming.pipeline import read_ndjson_stream, stream_build  # noqa: E402
from tools.soak import CALLERS, HOSTS, METHODS, OPERATIONS  # noqa: E402


def gen_file(dirpath: str, file_idx: int, n_rows: int) -> None:
    """One NDJSON file on day 2014-05-{idx%28+1}: cycling days gives
    the view tree realistic bucket fan-out (the whole point of the
    bounded-files assertion)."""
    import random

    rng = random.Random(1000 + file_idx)
    day = f"2014-05-{(file_idx % 28) + 1:02d}"
    os.makedirs(dirpath, exist_ok=True)
    # write hidden (dot-prefixed files are invisible to Spark's file
    # source), then atomically rename into place: the stream must never
    # list a file mid-write — it would ingest the flushed prefix, mark
    # the file processed in the checkpoint, and silently drop the tail.
    # Same contract as any production log shipper (write-tmp-rename).
    tmp = os.path.join(dirpath, f".log{file_idx}.tmp")
    with open(tmp, "w") as fh:
        for i in range(n_rows):
            caller = rng.choice(CALLERS)
            rec = {
                "time": f"{day}T%02d:%02d:%02d.000Z"
                % (rng.randrange(24), rng.randrange(60), rng.randrange(60)),
                "host": rng.choice(HOSTS),
                "operation": rng.choice(OPERATIONS),
                "req": {"method": rng.choice(METHODS), "url": f"/u/{i}"},
                "res": {"statusCode": rng.choice([200, 204, 404, 500])},
                "latency": str(rng.randrange(1, 5000)),
            }
            if caller != "MISSING":
                rec["req"]["caller"] = caller
            fh.write(json.dumps(rec) + "\n")
        if file_idx == 0:  # corrupt-line tolerance, streaming too
            fh.write("{not json\n")
    os.rename(tmp, os.path.join(dirpath, f"log{file_idx}.log"))


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2] if xs else None


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    tick = 2.0
    compact_every = 40  # files between stop-compact-resume cycles

    root = tempfile.mkdtemp(prefix="dn_soak_stream_")
    data = os.path.join(root, "data")
    idx = os.path.join(root, "idx")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(data, exist_ok=True)

    spark = get_spark(app_name="dn_soak_stream")
    spark.range(1).count()

    metrics = [
        Metric.load(
            "ops_by_day",
            "operation,day[date,field=time,aggr=lquantize,step=86400]",
        ),
        Metric.load(
            "errors_by_host",
            "host,day[date,field=time,aggr=lquantize,step=86400]",
            {"eq": ["res.statusCode", "500"]},
        ),
    ]

    stop_feed = threading.Event()
    pause_feed = threading.Event()
    fed = {"files": 0, "rows": 0}

    def feeder():
        i = 0
        while not stop_feed.is_set():
            if pause_feed.is_set():
                time.sleep(0.2)
                continue
            # one new file per tick, cycling across 28 distinct days so
            # the view tree has realistic bucket fan-out
            gen_file(os.path.join(data, f"t{i}"), i, rows_per_file)
            i += 1
            fed["files"] += 1
            fed["rows"] += rows_per_file
            time.sleep(tick)

    def start_stream():
        sdf = read_ndjson_stream(spark, data, max_files_per_trigger=4)
        return stream_build(
            sdf,
            metrics,
            idx,
            interval="day",
            time_field="time",
            checkpoint=ckpt,
        )

    feeder_t = threading.Thread(target=feeder, daemon=True)
    feeder_t.start()
    q = start_stream()

    t_end = time.time() + duration
    trigger_ms: list[float] = []
    compactions = 0
    files_after_compact: list[int] = []
    last_compact_files = 0
    seen_batches = set()

    def drain_progress():
        for p in q.recentProgress:
            key = (p["id"], p["batchId"])
            if key in seen_batches or p["numInputRows"] == 0:
                continue
            seen_batches.add(key)
            trigger_ms.append(p["durationMs"]["triggerExecution"])

    while time.time() < t_end:
        time.sleep(5)
        drain_progress()
        if fed["files"] - last_compact_files >= compact_every:
            # the documented maintenance contract: stop the writer,
            # compact, resume from the checkpoint. Stopping must be
            # GRACEFUL — pause arrivals and drain in-flight batches
            # first. A hard stop() mid-foreachBatch would leave the
            # batch's parquet append in place while the checkpoint
            # never commits it, so the restart replays the batch and
            # double-counts (foreachBatch appends are at-least-once;
            # the clean-stop discipline is what makes them exact).
            pause_feed.set()
            q.processAllAvailable()
            drain_progress()
            q.stop()
            q.awaitTermination()
            t0 = time.time()
            compact_index(spark, idx)
            compact_s = time.time() - t0
            compactions += 1
            last_compact_files = fed["files"]
            nfiles = len(glob.glob(os.path.join(idx, "*", "**", "*.parquet"),
                                   recursive=True))
            files_after_compact.append(nfiles)
            print(
                f"soak: compaction #{compactions} in {compact_s:.1f}s, "
                f"{nfiles} view files",
                file=sys.stderr,
            )
            q = start_stream()
            pause_feed.clear()

    stop_feed.set()
    feeder_t.join()
    # graceful final drain: everything fed is processed before stop
    q.processAllAvailable()
    drain_progress()
    q.stop()
    q.awaitTermination()

    # equivalence: index answer vs raw batch scan over ALL fed data
    qc = QueryConfig.load(
        "operation,day[date,field=time,aggr=lquantize,step=86400]"
    )
    got = {tuple(r) for r in query_index(spark, idx, qc).collect()}
    want = {tuple(r) for r in scan_ndjson(spark, data, qc).collect()}
    equivalent = got == want
    # direction diagnostic: index > scan means duplicated batch
    # appends; index < scan means unprocessed tail
    sum_idx = sum(r[-1] for r in got)
    sum_scan = sum(r[-1] for r in want)

    third = max(len(trigger_ms) // 3, 1)
    first_med = median(trigger_ms[:third])
    last_med = median(trigger_ms[-third:])
    out = {
        "duration_sec": duration,
        "rows_fed": fed["rows"],
        "files_fed": fed["files"],
        "micro_batches": len(trigger_ms),
        "trigger_ms_median": median(trigger_ms),
        "trigger_ms_first_third_median": first_med,
        "trigger_ms_last_third_median": last_med,
        "latency_stable": bool(
            first_med and last_med and last_med <= 2.0 * first_med
        ),
        "compactions": compactions,
        "view_files_after_each_compact": files_after_compact,
        "files_bounded": bool(
            len(files_after_compact) < 2
            or max(files_after_compact) <= 2 * min(files_after_compact)
        ),
        "equivalent": equivalent,
        "index_value_sum": sum_idx,
        "scan_value_sum": sum_scan,
        "index_groups": len(got),
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    sys.exit(0 if (equivalent and out["latency_stable"]) else 1)


if __name__ == "__main__":
    main()
