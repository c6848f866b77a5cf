from dragnet_spark.streaming.pipeline import (
    read_ndjson_stream,
    stream_build,
    stream_curate,
    stream_curate_against_band_store,
    stream_curate_against_srp_store,
    stream_curate_against_store,
    stream_ingest_vector_index,
    stream_ingest_with_live_store,
    stream_dedup,
    stream_enrich,
    stream_interval_join,
    stream_scan,
    stream_sliding_counts,
)
from dragnet_spark.streaming.stateful import sessionize, stream_running_counts

__all__ = [
    "read_ndjson_stream",
    "sessionize",
    "stream_build",
    "stream_curate",
    "stream_curate_against_band_store",
    "stream_curate_against_srp_store",
    "stream_curate_against_store",
    "stream_ingest_vector_index",
    "stream_ingest_with_live_store",
    "stream_dedup",
    "stream_enrich",
    "stream_interval_join",
    "stream_running_counts",
    "stream_scan",
    "stream_sliding_counts",
]
