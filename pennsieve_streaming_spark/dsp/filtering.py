"""Butterworth filtering as a Spark operator (G1-G3).

IIR filtering is a sequential recurrence — the one genuinely
non-embarrassingly-parallel operator in the reference. Parallelism
therefore comes from channels (and contiguous spans within a channel),
never from within a span: each (channel, span) flows through one
pandas group, ordered by ts, exactly like the reference routes each
channel's stream through one stateful iirj cascade
(query/TimeSeriesQueryRawHttp.scala:148-180).

Reference semantics reproduced:
- reset-on-discontinuity: a new filter state whenever the gap to the
  previous sample exceeds 100 sample periods
  (query/TimeSeriesQueryRawHttp.scala:155-167; FilterStateTracker).
  In batch mode each contiguous run is filtered independently —
  strictly better than the reference's cross-request carry.
- reflected prewarm: before each run, padLength =
  ceil((rate/cutoff)*8*(1+(order-1)*0.5)) reflected samples warm the
  filter and are discarded (applyFilterWithPadding, :220-313).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from pennsieve_streaming_spark.datamodel import FILTER_RESET_SAMPLE_PERIODS
from pennsieve_streaming_spark.dsp.butterworth import (
    butter_sos,
    filter_transient_length,
    reflected_prewarm,
    sosfilt,
)


@dataclass(frozen=True)
class FilterSpec:
    """A FilterRequest: type + [order, freq, width?]
    (reference server/TSJsonSupport.scala FilterRequest,
    server/TimeSeriesFlow.scala:921-948)."""

    btype: str                 # lowpass | highpass | bandpass | bandstop
    order: int
    freq: float                # cutoff (lp/hp) or center (bp/bs), Hz
    width: float | None = None  # band width, Hz

    @property
    def max_freq(self) -> float:
        """Frequency used for the transient-length estimate (the
        reference tracks the filter's max frequency)."""
        return self.freq if self.width is None else self.freq + self.width / 2


def _filter_run(values: np.ndarray, sos: np.ndarray, pad: int) -> np.ndarray:
    warm = reflected_prewarm(values, pad)
    _, state = sosfilt(sos, warm)           # warm up, discard output
    out, _ = sosfilt(sos, values, zi=state)
    return out


def apply_filter(
    samples: DataFrame,
    spec: FilterSpec,
    rate_hz: float,
    prewarm: bool = True,
) -> DataFrame:
    """Filter each channel's stream, resetting state at discontinuities
    > 100 sample periods. Input/output: (channel, ts, value).

    Scale note: one shuffle on channel; within a channel the pandas
    group sorts by ts and runs the recurrence in-order. Very long
    channels should pre-split into (channel, span) groups upstream via
    contiguous_spans so no single task holds a whole channel's history.
    """
    sos = butter_sos(spec.order, spec.freq, rate_hz, spec.btype, spec.width)
    pad = (
        filter_transient_length(spec.order, spec.max_freq, rate_hz)
        if prewarm
        else 0
    )
    gap_us = FILTER_RESET_SAMPLE_PERIODS / rate_hz * 1e6

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        ts = pdf["ts"].to_numpy()
        vals = pdf["value"].to_numpy(dtype=float)
        # split into contiguous runs at discontinuities (reset rule)
        breaks = np.flatnonzero(np.diff(ts) > gap_us) + 1
        out = np.empty_like(vals)
        for seg in np.split(np.arange(len(vals)), breaks):
            if len(seg) == 0:
                continue
            out[seg] = _filter_run(vals[seg], sos, pad)
        pdf["value"] = out
        return pdf

    return samples.select("channel", "ts", "value").groupBy("channel").applyInPandas(
        run, schema="channel string, ts long, value double"
    )
