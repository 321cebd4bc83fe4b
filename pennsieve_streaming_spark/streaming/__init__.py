"""Structured Streaming ingest + realtime query path."""

from pennsieve_streaming_spark.streaming.ingest import (  # noqa: F401
    read_ingest_stream,
    explode_segments_to_samples,
    realtime_resample_stream,
    streaming_gap_sessions,
)
