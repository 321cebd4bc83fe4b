"""Serving layer: session state + request protocol over the engine."""

from pennsieve_streaming_spark.serving.session import (  # noqa: F401
    ClearFilterRequest,
    DumpBufferRequest,
    FilterRequest,
    KeepAlive,
    MontageRequest,
    QuerySession,
    ResetFilterRequest,
    TimeSeriesRequest,
    parse_request,
)
from pennsieve_streaming_spark.serving.transport import (  # noqa: F401
    TimeSeriesServer,
    TransportConfig,
)
from pennsieve_streaming_spark.serving.ws import (  # noqa: F401
    WebSocketTimeSeriesServer,
)
