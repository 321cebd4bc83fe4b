"""Streaming circadian concentration: the batch per-user hour-profile
statistics (operators/analytics.circadian_rhythm) maintained
incrementally over a live event feed.

State is the 24-bin hour-count vector (+ total) per user — exact
integers, so unlike the recurrence-carrying members of the stateful
family (ewma/holt/cusum) there is no float state at all: every
emission recomputes the circular statistics from exact counts with
the IDENTICAL literal table and fold order as the batch SQL
expression, so the per-user snapshot after draining a bounded feed is
bit-identical to the batch operator (equivalence-tested across
micro-batch splits). Arrival order is irrelevant — counts commute —
which makes this the rare stateful operator with NO in-order
contract.

Each micro-batch emits one snapshot row per touched user; the
LAST snapshot (max n_events — monotone) is the batch answer.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pennsieve_streaming_spark.operators.analytics import RAYLEIGH_CRIT

# literal tables: parse the SAME .17e strings the batch SQL embeds so
# the doubles are bit-identical to what both engines fold
COS24 = [float(f"{math.cos(2.0 * math.pi * h / 24.0):.17e}") for h in range(24)]
SIN24 = [float(f"{math.sin(2.0 * math.pi * h / 24.0):.17e}") for h in range(24)]
CRIT = float(f"{RAYLEIGH_CRIT:.17e}")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("peak_hour", T.LongType()),
        T.StructField("peak_share", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("rayleigh_z", T.DoubleType()),
        T.StructField("circadian", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField(f"h{i}", T.LongType()) for i in range(24)]
)


def _snapshot(user_id: int, counts: list[int]) -> dict:
    n = sum(counts)
    # left-to-right folds in hour order — the SQL expression's order
    cs = 0.0
    sn = 0.0
    for h in range(24):
        cs = cs + counts[h] * COS24[h]
        sn = sn + counts[h] * SIN24[h]
    peak_cnt = max(counts)
    peak_hour = counts.index(peak_cnt)   # smallest hour wins ties
    r = math.sqrt(cs * cs + sn * sn) / n
    z = n * r * r
    return {
        "user_id": user_id,
        "n_events": n,
        "peak_hour": peak_hour,
        "peak_share": float(peak_cnt) / n,
        "r": r,
        "rayleigh_z": z,
        "circadian": z > CRIT,
    }


def circadian_stream(events_stream: DataFrame) -> DataFrame:
    """Incremental per-user circadian profile over a streaming
    (user_id, ts) feed; ts is epoch-µs. Emits one snapshot per
    touched user per micro-batch; snapshots are cumulative, the last
    one equals the batch operator."""
    from pyspark.sql import functions as F

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        counts = list(state.get) if state.exists else [0] * 24
        hours = ((rows["ts"].to_numpy() // 3_600_000_000) % 24).astype(int)
        for h in hours:
            counts[h] += 1
        state.update(tuple(counts))
        yield pd.DataFrame([_snapshot(int(user_id), counts)])

    hourly = events_stream.select("user_id", "ts")
    return hourly.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
