"""Streaming Butterworth filtering with carried state (G2, streaming
flavor).

The reference keeps one warm iirj cascade per channel across
consecutive requests (server/FilterStateTracker.scala:26-97), resetting
on discontinuity. In Structured Streaming the equivalent is per-channel
SOS state carried across micro-batches via ``applyInPandasWithState``:
each batch filters its samples seeded with the previous batch's final
filter state, so the streamed output is bit-identical to filtering the
whole channel in one pass (guaranteed by the sosfilt chunk-continuity
property, tested in tests/test_dsp.py).

Reset-on-discontinuity: if a batch's first sample is > 100 sample
periods after the stored last timestamp, state is discarded before
filtering (query/TimeSeriesQueryRawHttp.scala:155-167).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from pennsieve_streaming_spark.datamodel import FILTER_RESET_SAMPLE_PERIODS
from pennsieve_streaming_spark.dsp.butterworth import (
    butter_sos,
    filter_transient_length,
    reflected_prewarm,
    sosfilt,
)
from pennsieve_streaming_spark.dsp.filtering import FilterSpec

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# state: flattened SOS state (n_sections*2 doubles) + last sample ts
STATE_SCHEMA = T.StructType(
    [
        T.StructField("zi", T.ArrayType(T.DoubleType())),
        T.StructField("last_ts", T.LongType()),
    ]
)


def stateful_filter_stream(
    samples_stream: DataFrame, spec: FilterSpec, rate_hz: float
) -> DataFrame:
    """Filter a streaming (channel, ts, value) frame with per-channel
    state carried across micro-batches."""
    sos = butter_sos(spec.order, spec.freq, rate_hz, spec.btype, spec.width)
    n_sections = sos.shape[0]
    gap_us = FILTER_RESET_SAMPLE_PERIODS / rate_hz * 1e6
    pad = filter_transient_length(spec.order, spec.max_freq, rate_hz)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        pdf = pd.concat(list(pdfs)).sort_values("ts").reset_index(drop=True)
        if state.exists:
            zi_flat, last_ts = state.get
            zi = np.array(zi_flat).reshape(n_sections, 2)
            if len(pdf) and pdf["ts"].iloc[0] - last_ts > gap_us:
                zi = None  # discontinuity -> reset (reference rule)
        else:
            zi, last_ts = None, None
        vals = pdf["value"].to_numpy(dtype=float)
        if zi is None and len(vals):
            # fresh / reset state: seed with the reflected prewarm
            # (reference applyFilterWithPadding runs whenever the
            # cascade is clean; batch _filter_run does the same)
            warm = reflected_prewarm(vals, pad)
            _, zi = sosfilt(sos, warm)
        out, zf = sosfilt(sos, vals, zi=zi)
        if len(pdf):
            state.update((zf.ravel().tolist(), int(pdf["ts"].iloc[-1])))
        yield pd.DataFrame(
            {"channel": channel, "ts": pdf["ts"], "value": out}
        )

    return samples_stream.groupBy("channel").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
