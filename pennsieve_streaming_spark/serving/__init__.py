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
from pennsieve_streaming_spark.serving.auth import (  # noqa: F401
    AuthError,
    InvalidToken,
    MissingCredentials,
    ServiceClaimRejected,
    authorize,
    parse_claim,
    sign_token,
)
from pennsieve_streaming_spark.serving.http import (  # noqa: F401
    RetrieveContext,
    RetrieveHttpServer,
)
