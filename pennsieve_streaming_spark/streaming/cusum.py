"""Streaming CUSUM monitor: the batch two-sided control monitor
(dsp/filtering.cusum_monitor) run incrementally over a live feed.

State is TWO doubles per channel — the post-reset (g+, g-) pair —
carried across micro-batches via ``applyInPandasWithState``; the
control-chart member of the stateful family (ewma one double, holt
two, Butterworth a biquad cascade). Same in-order-arrival contract as
every ingest-path operator here; under it the emitted rows are
bit-identical to the batch operator over everything ingested so far:
the recurrence sees the same samples in the same (ts, value) order
with the same fixed IEEE op sequence ``((g + (x - mu0)) - k)``
clamped at 0.0, so every (g+, g-, alarm) triple agrees bitwise
wherever the micro-batch boundaries fall (equivalence-tested).

Like holt_stream (and unlike ewma_stream's per-chunk walk), the
batch's Arrow chunks are concatenated and sorted ONCE before the
walk — chunk delivery order within a group is not a documented
ordering guarantee, and the recurrence must consume rows in exactly
the batch operator's order.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pennsieve_streaming_spark.dsp.filtering import cusum_walk
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("gpos", T.DoubleType()),
        T.StructField("gneg", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("gpos", T.DoubleType()),
        T.StructField("gneg", T.DoubleType()),
    ]
)


def cusum_stream(samples_stream: DataFrame, params: dict) -> DataFrame:
    """Incremental CUSUM monitoring over a streaming (channel, ts,
    value) feed. ``params`` maps channel -> (mu0, k, h) as in the
    batch operator; unconfigured channels are dropped upstream of the
    stateful operator (their groups never materialize state).

    Output: (channel, ts, value, gpos, gneg, alarm), every input row
    emitted with its pre-reset statistics and alarm flag."""
    from pyspark.sql import functions as F

    cfg = {
        str(c): (float(m), float(k), float(h))
        for c, (m, k, h) in params.items()
    }

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        mu0, k, h = cfg[channel]
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "value"]).reset_index(drop=True)
        gp, gn = state.get if state.exists else (0.0, 0.0)
        gpos, gneg, alarm, gp, gn = cusum_walk(
            rows["value"], mu0, k, h, gp, gn
        )
        state.update((gp, gn))
        yield pd.DataFrame(
            {
                "channel": rows["channel"],
                "ts": rows["ts"],
                "value": rows["value"],
                "gpos": gpos,
                "gneg": gneg,
                "alarm": alarm,
            }
        )

    return (
        samples_stream.filter(F.col("channel").isin(list(cfg)))
        .groupBy("channel")
        .applyInPandasWithState(
            step,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
