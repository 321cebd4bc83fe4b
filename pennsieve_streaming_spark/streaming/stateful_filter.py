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

Prewarm parity with the batch path (``dsp.filtering.apply_filter``):
a fresh/reset run BUFFERS samples in state until ``pad`` are available
before seeding the reflected prewarm — so the warmup is computed from
the run's true first ``pad`` samples regardless of where micro-batch
boundaries fall, and streamed output matches the batch path
bit-for-bit. A run that goes quiet before reaching ``pad`` samples stays
buffered until more data arrives; pass ``flush_timeout_ms`` to flush
such runs by a processing-time timeout using the same short-run
prewarm casework ``apply_filter``'s close_run applies. The timeout is
OPT-IN because ProcessingTimeTimeout makes the query run continuous
state-cleanup batches — ``processAllAvailable()`` (the test-harness
drive) never quiesces under it.
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

# state: flattened SOS state (n_sections*2 doubles; empty = run not
# yet warmed), last sample ts, and the buffered run head awaiting
# enough samples for the prewarm
STATE_SCHEMA = T.StructType(
    [
        T.StructField("zi", T.ArrayType(T.DoubleType())),
        T.StructField("last_ts", T.LongType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
    ]
)

def stateful_filter_stream(
    samples_stream: DataFrame,
    spec: FilterSpec,
    rate_hz: float,
    flush_timeout_ms: int | None = None,
) -> DataFrame:
    """Filter a streaming (channel, ts, value) frame with per-channel
    state carried across micro-batches.

    ``flush_timeout_ms``: if set, a run buffered below ``pad`` samples
    flushes with the short-run prewarm after that much quiet processing
    time (close_run semantics); if None (default) it waits for more
    data."""
    sos = butter_sos(spec.order, spec.freq, rate_hz, spec.btype, spec.width)
    n_sections = sos.shape[0]
    gap_us = FILTER_RESET_SAMPLE_PERIODS / rate_hz * 1e6
    pad = filter_transient_length(spec.order, spec.max_freq, rate_hz)

    def warm_and_filter(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        warm = reflected_prewarm(vals, pad)
        _, zi = sosfilt(sos, warm)
        return sosfilt(sos, vals, zi=zi)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:
            # run went quiet before reaching pad samples: flush it with
            # the short-run prewarm casework (apply_filter.close_run)
            _, _, buf_ts, buf_val = state.get
            state.remove()
            if buf_ts:
                vals = np.asarray(buf_val, dtype=float)
                out, _ = warm_and_filter(vals)
                yield pd.DataFrame(
                    {"channel": channel, "ts": buf_ts, "value": out}
                )
            return

        pdf = pd.concat(list(pdfs)).sort_values("ts").reset_index(drop=True)
        if not len(pdf):
            return
        zi = None
        buf_ts: list[int] = []
        buf_val: list[float] = []
        if state.exists:
            zi_flat, last_ts, buf_ts, buf_val = state.get
            buf_ts, buf_val = list(buf_ts), list(buf_val)
            if zi_flat:
                zi = np.array(zi_flat).reshape(n_sections, 2)
            prev_ts = buf_ts[-1] if buf_ts else last_ts
            if prev_ts is not None and pdf["ts"].iloc[0] - prev_ts > gap_us:
                # discontinuity -> close the previous run (reference
                # reset rule). A buffered sub-pad head flushes with the
                # short-run casework before the new run starts.
                if buf_ts:
                    vals = np.asarray(buf_val, dtype=float)
                    out, _ = warm_and_filter(vals)
                    yield pd.DataFrame(
                        {"channel": channel, "ts": buf_ts, "value": out}
                    )
                zi, buf_ts, buf_val = None, [], []

        new_ts = pdf["ts"].astype("int64").tolist()
        new_vals = pdf["value"].to_numpy(dtype=float)

        if zi is not None:
            # warmed run: plain continuation
            out, zf = sosfilt(sos, new_vals, zi=zi)
            state.update((zf.ravel().tolist(), int(new_ts[-1]), [], []))
            yield pd.DataFrame({"channel": channel, "ts": new_ts, "value": out})
            return

        # un-warmed run head: buffer until pad samples are available so
        # the prewarm sees the run's true first pad samples (batch-path
        # parity, ADVICE r2)
        buf_ts.extend(new_ts)
        buf_val.extend(float(v) for v in new_vals)
        if len(buf_ts) < max(pad, 1):
            state.update(([], int(buf_ts[-1]), buf_ts, buf_val))
            if flush_timeout_ms is not None:
                state.setTimeoutDuration(flush_timeout_ms)
            return
        vals = np.asarray(buf_val, dtype=float)
        out, zf = warm_and_filter(vals)
        state.update((zf.ravel().tolist(), int(buf_ts[-1]), [], []))
        yield pd.DataFrame({"channel": channel, "ts": buf_ts, "value": out})

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if flush_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return samples_stream.groupBy("channel").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
