"""Streaming Holt smoothing: the batch level+trend smoother
(dsp/filtering.holt_filter) run incrementally over a live feed.

State is TWO doubles per channel — (level, trend) — carried across
micro-batches via ``applyInPandasWithState``; the next member up from
streaming/ewma.py (one double) toward the stateful Butterworth (a
biquad cascade). Same in-order-arrival contract as every ingest-path
operator here; under it the emitted rows are bit-identical to the
batch operator over everything ingested so far: the recurrence sees
the same samples in the same (ts, value) order with the same fixed
IEEE op sequence, so every (level, trend) pair agrees bitwise
wherever the micro-batch boundaries fall (equivalence-tested).

Unlike ewma_stream's per-chunk walk, the batch's Arrow chunks are
concatenated and sorted ONCE before the walk — chunk delivery order
within a group is not a documented ordering guarantee, and the
recurrence must consume rows in exactly the batch operator's order.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("forecast", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
    ]
)


def holt_stream(
    samples_stream: DataFrame, alpha: float, beta: float
) -> DataFrame:
    """Incremental Holt smoothing over a streaming (channel, ts, value)
    feed. Output: (channel, ts, value, level, trend, forecast), every
    input row emitted with its smoothed state."""
    a = float(alpha)
    b = 1.0 - a
    g = float(beta)
    d = 1.0 - g

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
        x = rows["value"].to_numpy(dtype=np.float64)
        lvl_arr = np.empty_like(x)
        trd_arr = np.empty_like(x)
        carry = state.get if state.exists else None
        start = 0
        if carry is None:
            lvl, trd = x[0], 0.0
            lvl_arr[0], trd_arr[0] = lvl, trd
            start = 1
        else:
            lvl, trd = float(carry[0]), float(carry[1])
        for i in range(start, len(x)):
            l_new = a * x[i] + b * (lvl + trd)
            trd = g * (l_new - lvl) + d * trd
            lvl = l_new
            lvl_arr[i], trd_arr[i] = lvl, trd
        state.update((float(lvl), float(trd)))
        yield pd.DataFrame(
            {
                "channel": channel,
                "ts": rows["ts"],
                "value": rows["value"],
                "level": lvl_arr,
                "trend": trd_arr,
                "forecast": lvl_arr + trd_arr,
            }
        )

    return samples_stream.groupBy("channel").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
