"""Streaming variant tests: the same query semantics over
Structured Streaming, verified against the batch scan on identical
data (the reference's scan-vs-index equivalence idea applied to
batch-vs-streaming)."""

import os
import shutil
import time
import glob

import pytest

from dragnet_spark.index.build import Metric
from dragnet_spark.index.query import query_index
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan_ndjson
from dragnet_spark.streaming import read_ndjson_stream, stream_build, stream_scan

REF_DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DATA), reason="reference fixture data not present"
)


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
