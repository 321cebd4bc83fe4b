"""Structured Streaming ingest + realtime query path."""

from pennsieve_streaming_spark.streaming.ingest import (  # noqa: F401
    read_ingest_stream,
    explode_segments_to_samples,
    realtime_resample_stream,
    streaming_gap_sessions,
)
from pennsieve_streaming_spark.streaming.corpus import (  # noqa: F401
    curate_document_stream,
    exact_dedup_stream,
    read_document_stream,
    start_neardup_dedup_stream,
)
from pennsieve_streaming_spark.streaming.sessionize import (  # noqa: F401
    sessionize_stream,
)
from pennsieve_streaming_spark.streaming.montage import (  # noqa: F401
    montage_stream,
)
