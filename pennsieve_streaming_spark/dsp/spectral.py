"""Spectral band power via the Goertzel algorithm (Goertzel 1958 —
the classic single-bin DFT recurrence).

EEG review is done in frequency bands (delta/theta/alpha/beta); the
reference serves only time-domain samples and leaves banding to the
client. This operator computes per-window power at a set of target
frequencies engine-side:

    s_n = x_n + c*s_{n-1} - s_{n-2},   c = 2*cos(2*pi*f/fs)
    power = s_{N-1}^2 + s_{N-2}^2 - c*s_{N-1}*s_{N-2}

Execution: windows are fixed sample-count chunks per channel (row
ranking, same shape as the count downsample); each (channel, window)
group runs the recurrence once per frequency inside ``applyInPandas``
— vectorized ACROSS frequencies per sample step, sequential over
samples (the recurrence is inherently so, exactly like the IIR path).

Determinism: the recurrence is two multiplies + two adds per sample in
a fixed order, and ``c`` is baked as a python float literal — the
DuckDB oracle replays the identical ops in a recursive CTE
(bit-exact, same class as the Butterworth/EWMA oracles). At 100 TB
parallelism is |channels| x |windows| — embarrassing parallel, no
shuffle beyond the one window ranking.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def goertzel_coeff(freq_hz: float, rate_hz: float) -> float:
    """c = 2*cos(2*pi*f/fs), the literal both engines share."""
    return 2.0 * math.cos(2.0 * math.pi * freq_hz / rate_hz)


def band_power(
    samples: DataFrame,
    freqs_hz: tuple[float, ...],
    rate_hz: float,
    window_samples: int,
) -> DataFrame:
    """Per-(channel, window, frequency) Goertzel power.

    Windows are consecutive ``window_samples``-row chunks in (ts,
    value) order per channel; ragged tails are dropped (the count
    downsample's convention). Output: (channel, win, freq_hz, n,
    power).
    """
    coeffs = {float(f): goertzel_coeff(f, rate_hz) for f in freqs_hz}
    ws = int(window_samples)
    w = Window.partitionBy("channel").orderBy("ts", "value")
    ranked = samples.withColumn(
        "_rn", F.row_number().over(w) - 1
    ).withColumn("win", F.floor(F.col("_rn") / ws))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "value"]).reset_index(drop=True)
        x = pdf["value"].to_numpy(dtype=np.float64)
        out = []
        ch = pdf["channel"].iloc[0]
        win = int(pdf["win"].iloc[0])
        if len(x) == ws:  # ragged tail dropped
            for f, c in coeffs.items():
                s1 = 0.0
                s2 = 0.0
                for i in range(len(x)):
                    s = x[i] + c * s1 - s2
                    s2 = s1
                    s1 = s
                power = s1 * s1 + s2 * s2 - c * s1 * s2
                out.append((ch, win, f, len(x), power))
        return pd.DataFrame(
            out, columns=["channel", "win", "freq_hz", "n", "power"]
        )

    return ranked.groupBy("channel", "win").applyInPandas(
        run,
        "channel string, win long, freq_hz double, n long, power double",
    )
