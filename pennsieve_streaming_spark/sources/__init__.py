"""Sources: legacy binary segment decode, CSV, and catalog lookups."""

from pennsieve_streaming_spark.sources.binary import (  # noqa: F401
    decode_binary_positions,
    decode_binary_segments,
    decode_event_files,
)
from pennsieve_streaming_spark.sources.catalog import (  # noqa: F401
    range_lookup,
    spans_to_ranges,
    spans_to_unit_ranges,
)
from pennsieve_streaming_spark.sources.local import read_value_files  # noqa: F401
