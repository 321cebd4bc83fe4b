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

# Spark 4's transformWithState API (SPARK-49564) — the forward path
# for applyInPandasWithState per SURVEY §7.4; gate on import so the
# module keeps working against Spark 3.5 clusters.
try:  # pragma: no cover - exercised implicitly by the import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS_API = True
except ImportError:  # Spark < 4.0
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    _HAS_TWS_API = False

# The transformWithState Python state-server protocol additionally
# needs the google.protobuf package at RUNTIME (the worker crashes at
# query start without it) — a separate gate from the API import, since
# pyspark itself imports fine without protobuf installed.
try:  # pragma: no cover
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

HAS_TRANSFORM_WITH_STATE = _HAS_TWS_API and _HAS_PROTOBUF

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

def _warm_filter(
    sos: np.ndarray, vals: np.ndarray, pad: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reflected-prewarm seed + filter (the batch path's run open)."""
    warm = reflected_prewarm(vals, pad)
    _, zi = sosfilt(sos, warm)
    return sosfilt(sos, vals, zi=zi)


def _advance(
    channel: str,
    pdf: pd.DataFrame,
    prior: tuple | None,
    sos: np.ndarray,
    n_sections: int,
    gap_us: float,
    pad: int,
) -> tuple[list[pd.DataFrame], tuple]:
    """One micro-batch state transition for one channel — the PURE
    core shared by both streaming APIs (applyInPandasWithState and
    transformWithStateInPandas), so their outputs cannot drift.

    ``prior`` is the stored (zi_flat, last_ts, buf_ts, buf_val) or
    None; returns (output frames, new state tuple)."""
    zi = None
    buf_ts: list[int] = []
    buf_val: list[float] = []
    outs: list[pd.DataFrame] = []
    if prior is not None:
        zi_flat, last_ts, buf_ts, buf_val = prior
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
                out, _ = _warm_filter(sos, vals, pad)
                outs.append(
                    pd.DataFrame(
                        {"channel": channel, "ts": buf_ts, "value": out}
                    )
                )
            zi, buf_ts, buf_val = None, [], []

    new_ts = pdf["ts"].astype("int64").tolist()
    new_vals = pdf["value"].to_numpy(dtype=float)

    if zi is not None:
        # warmed run: plain continuation
        out, zf = sosfilt(sos, new_vals, zi=zi)
        outs.append(
            pd.DataFrame({"channel": channel, "ts": new_ts, "value": out})
        )
        return outs, (zf.ravel().tolist(), int(new_ts[-1]), [], [])

    # un-warmed run head: buffer until pad samples are available so
    # the prewarm sees the run's true first pad samples (batch-path
    # parity, ADVICE r2)
    buf_ts.extend(new_ts)
    buf_val.extend(float(v) for v in new_vals)
    if len(buf_ts) < max(pad, 1):
        return outs, ([], int(buf_ts[-1]), buf_ts, buf_val)
    vals = np.asarray(buf_val, dtype=float)
    out, zf = _warm_filter(sos, vals, pad)
    outs.append(
        pd.DataFrame({"channel": channel, "ts": buf_ts, "value": out})
    )
    return outs, (zf.ravel().tolist(), int(buf_ts[-1]), [], [])


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
                out, _ = _warm_filter(sos, vals, pad)
                yield pd.DataFrame(
                    {"channel": channel, "ts": buf_ts, "value": out}
                )
            return

        pdf = pd.concat(list(pdfs)).sort_values("ts").reset_index(drop=True)
        if not len(pdf):
            return
        prior = tuple(state.get) if state.exists else None
        outs, new_state = _advance(
            channel, pdf, prior, sos, n_sections, gap_us, pad
        )
        state.update(new_state)
        if not new_state[0] and new_state[2] and flush_timeout_ms is not None:
            # still buffering a sub-pad run head: arm the flush timer
            state.setTimeoutDuration(flush_timeout_ms)
        yield from outs

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


class ButterworthStatefulProcessor(StatefulProcessor):
    """transformWithState processor wrapping the same :func:`_advance`
    per-batch transition as the applyInPandasWithState path — the two
    APIs produce bit-identical output by construction.

    Carries the filter design as plain picklable fields (the SOS
    matrix flattens to a list); the single ValueState variable uses
    the same STATE_SCHEMA tuple as the legacy path.
    """

    def __init__(
        self,
        sos_flat: list[float],
        n_sections: int,
        gap_us: float,
        pad: int,
    ) -> None:
        self._sos_flat = list(sos_flat)
        self._n_sections = int(n_sections)
        self._gap_us = float(gap_us)
        self._pad = int(pad)

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._sos = np.array(self._sos_flat, dtype=float).reshape(
            self._n_sections, 6
        )
        self._state = handle.getValueState(
            "butterworth_run", STATE_SCHEMA
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        pdf = (
            pd.concat(list(rows)).sort_values("ts").reset_index(drop=True)
        )
        if not len(pdf):
            return
        got = self._state.get()
        prior = tuple(got) if got is not None else None
        outs, new_state = _advance(
            channel,
            pdf,
            prior,
            self._sos,
            self._n_sections,
            self._gap_us,
            self._pad,
        )
        self._state.update(new_state)
        yield from outs

    def close(self) -> None:
        pass


def stateful_filter_stream_tws(
    samples_stream: DataFrame,
    spec: FilterSpec,
    rate_hz: float,
) -> DataFrame:
    """:func:`stateful_filter_stream` on Spark 4's
    ``transformWithStateInPandas`` (SPARK-49564) — the
    forward-compatible stateful API (SURVEY §7.4): named state
    variables in the state store v2 instead of a single opaque state
    struct, and a processor object instead of a closure. Output is
    bit-identical to the legacy path (shared :func:`_advance` core;
    dual-path parity test in tests/test_stateful_filter.py).

    The sub-pad flush timeout is not carried over in this prototype —
    ``timeMode="none"``; a quiet short run stays buffered (the legacy
    path's default behavior too).

    Raises RuntimeError on Spark < 4.0 (no transformWithState).
    """
    if not HAS_TRANSFORM_WITH_STATE:
        missing = (
            "Spark >= 4.0 (pyspark.sql.streaming.stateful_processor)"
            if not _HAS_TWS_API
            else "the google.protobuf package (transformWithState "
            "Python state-server dependency)"
        )
        raise RuntimeError(
            f"transformWithStateInPandas requires {missing}; use "
            "stateful_filter_stream (applyInPandasWithState) instead"
        )
    sos = butter_sos(spec.order, spec.freq, rate_hz, spec.btype, spec.width)
    processor = ButterworthStatefulProcessor(
        sos_flat=sos.ravel().tolist(),
        n_sections=int(sos.shape[0]),
        gap_us=FILTER_RESET_SAMPLE_PERIODS / rate_hz * 1e6,
        pad=filter_transient_length(spec.order, spec.max_freq, rate_hz),
    )
    return samples_stream.groupBy("channel").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
