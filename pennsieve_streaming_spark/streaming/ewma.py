"""Streaming EWMA: the batch first-order IIR smoother
(dsp/filtering.ewma_filter) run incrementally over a live feed.

State is ONE double per channel (the last smoothed value) carried
across micro-batches via ``applyInPandasWithState`` — the minimal
stateful-streaming shape, and the simplest member of the same family
as the stateful Butterworth (streaming/stateful_filter.py, whose
state is the full biquad cascade). Same in-order-arrival contract as
every ingest-path operator here; under it the emitted rows are
bit-identical to the batch operator over everything ingested so far
(the recurrence sees the same samples in the same order with the same
float ops — equivalence-tested wherever the batch boundaries fall).
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
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("y", T.DoubleType())])


def ewma_stream(samples_stream: DataFrame, alpha: float) -> DataFrame:
    """Incremental EWMA over a streaming (channel, ts, value) feed.
    Output: (channel, ts, value, ewma), every input row emitted with
    its smoothed value."""
    a = float(alpha)
    b = 1.0 - a

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        y_prev = state.get[0] if state.exists else None
        # Concatenate the batch's Arrow chunks and sort ONCE: chunk
        # delivery order within a group is not a documented ordering
        # guarantee, and a recurrence consumed out of order would
        # silently diverge from the batch operator (the
        # stateful_filter/holt/sessionize convention).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "value"]).reset_index(drop=True)
        x = pdf["value"].to_numpy(dtype=np.float64)
        y = np.empty_like(x)
        start = 0
        if y_prev is None:
            y[0] = x[0]
            y_prev = y[0]
            start = 1
        for i in range(start, len(x)):
            y_prev = a * x[i] + b * y_prev
            y[i] = y_prev
        state.update((float(y_prev),))
        yield pd.DataFrame(
            {
                "channel": channel,
                "ts": pdf["ts"],
                "value": pdf["value"],
                "ewma": y,
            }
        )

    return samples_stream.groupBy("channel").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
