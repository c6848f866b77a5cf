from dragnet_spark.streaming.pipeline import (
    read_ndjson_stream,
    stream_build,
    stream_scan,
)

__all__ = ["read_ndjson_stream", "stream_build", "stream_scan"]
