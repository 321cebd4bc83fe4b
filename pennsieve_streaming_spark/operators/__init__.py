"""Time-series query operators (SURVEY.md §2), DataFrame-first."""

from pennsieve_streaming_spark.operators.window import (  # noqa: F401
    window_query,
    check_query_limit,
    QueryLimitExceeded,
    epoch_rebase,
)
from pennsieve_streaming_spark.operators.downsample import (  # noqa: F401
    should_resample,
    resample_chunk_params,
    downsample_minmax_time,
    downsample_minmax_count,
    downsample_minmax_count_regular,
    fill_gaps,
)
from pennsieve_streaming_spark.operators.gaps import (  # noqa: F401
    time_gap_threshold,
    contiguous_spans,
    samples_to_spans,
    number_sequentially,
)
from pennsieve_streaming_spark.operators.montage import (  # noqa: F401
    MONTAGE_SCHEMES,
    montage_pairs,
    apply_montage,
    validate_montage,
    MontageValidationError,
)
from pennsieve_streaming_spark.operators.events import (  # noqa: F401
    event_summary_fixed,
    event_summary_data_driven,
    index_events,
)
from pennsieve_streaming_spark.operators.spikes import (  # noqa: F401
    cut_bucket_expr,
    resample_arrays_minmax,
    should_send_spikes,
)
from pennsieve_streaming_spark.operators.realtime import (  # noqa: F401
    resample_ingest_segments,
)
from pennsieve_streaming_spark.operators.rollups import (  # noqa: F401
    build_rollup,
    choose_level,
    downsample_from_rollup,
    rollup_from_rollup,
)
from pennsieve_streaming_spark.operators.segments import (  # noqa: F401
    build_segments_minmax,
    build_segments_raw,
    filter_channels_by_type,
    to_json_rows,
)
from pennsieve_streaming_spark.operators.align import (  # noqa: F401
    asof_locf,
    channel_grid,
    interp_resample,
    span_point_join,
)
from pennsieve_streaming_spark.operators.stats import (  # noqa: F401
    threshold_crossings,
    value_histogram,
    zscore_outliers,
)
