"""Streaming spectral-flux monitor: the batch onset front-end
(dsp/spectral.spectral_flux_onsets) run incrementally over a live
audio feed.

State per channel is (next frame index, the partial frame's raw
samples — at most ws−1 doubles, the lz_stream carry pattern — and the
previous COMPLETE frame's band-power vector). Each micro-batch emits
one (win, flux_q) row per completed frame with a predecessor; the
Goertzel recurrence, the fixed band-order GREATEST fold, and the
half-up flux quantization replicate the batch operator's IEEE op
sequence exactly, so under the in-order-arrival contract the drained
table is bit-identical to the batch flux table wherever the
micro-batch boundaries fall.

The onset FLAG is deliberately NOT computed here: it needs the
channel's median flux, a corpus statistic no prefix can know — the
caller flags the drained table exactly like the batch operator (the
registry query does, sharing the batch oracle).
"""

from __future__ import annotations

import decimal
from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pennsieve_streaming_spark.dsp.spectral import goertzel_coeff

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("win", T.LongType()),
        T.StructField("flux_q", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("win_offset", T.LongType()),
        T.StructField("carry", T.ArrayType(T.DoubleType())),
        T.StructField("prev", T.ArrayType(T.DoubleType())),
    ]
)


def flux_stream(
    samples_stream: DataFrame,
    freqs_hz: tuple[float, ...],
    rate_hz: float,
    window_samples: int,
) -> DataFrame:
    """Live per-(channel, frame) positive spectral flux; emits one row
    per completed frame that has a predecessor frame."""
    ws = int(window_samples)
    coeffs = [goertzel_coeff(f, rate_hz) for f in freqs_hz]
    nb = len(coeffs)

    def band_powers(x: "np.ndarray") -> list[float]:
        out = []
        for c in coeffs:
            s1 = 0.0
            s2 = 0.0
            for i in range(len(x)):
                s = x[i] + c * s1 - s2
                s2 = s1
                s1 = s
            out.append(s1 * s1 + s2 * s2 - c * s1 * s2)
        return out

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "value"]).reset_index(drop=True)
        if state.exists:
            off, carry, prev = state.get
            prev = list(prev) if prev is not None else None
        else:
            off, carry, prev = 0, [], None
        x = np.concatenate(
            [np.asarray(carry, dtype=np.float64),
             rows["value"].to_numpy(np.float64)]
        )
        wins, fluxes = [], []
        i = 0
        frame_idx = int(off)
        while i + ws <= len(x):
            p = band_powers(x[i : i + ws])
            if prev is not None:
                # fixed band-order fold, identical to the batch SQL
                # GREATEST chain's left-to-right evaluation
                fl = 0.0
                for b in range(nb):
                    d = p[b] - prev[b]
                    fl = fl + (d if d > 0.0 else 0.0)
                wins.append(frame_idx)
                # SQL round() is BigDecimal(double) HALF_UP — decimal
                # semantics over the double's shortest repr. floor(x
                # + 0.5) is NOT equivalent within one ulp below a .5
                # boundary (0.49999999999999994 + 0.5 == 1.0 in
                # binary), so round via Decimal (ADVICE r7).
                fluxes.append(
                    int(
                        decimal.Decimal(repr(fl)).quantize(
                            decimal.Decimal(1),
                            rounding=decimal.ROUND_HALF_UP,
                        )
                    )
                )
            prev = p
            frame_idx += 1
            i += ws
        state.update(
            (frame_idx, [float(v) for v in x[i:]],
             [float(v) for v in prev] if prev is not None else None)
        )
        if not wins:
            return
        yield pd.DataFrame(
            {
                "channel": pd.Series([channel] * len(wins), dtype=str),
                "win": pd.Series(wins, dtype="int64"),
                "flux_q": pd.Series(fluxes, dtype="int64"),
            }
        )

    return samples_stream.groupBy("channel").applyInPandasWithState(
        step,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
