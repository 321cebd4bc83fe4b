"""Streaming inter-arrival gap extraction for the burstiness panel:
the batch per-user-per-type gap table (the input of
operators/analytics.burstiness) maintained incrementally over a live
event feed.

State per (user_id, event_type) key is ONE integer — the last seen
event timestamp (the sessionize carry pattern). Each micro-batch
sorts its rows in (ts, event_id) order, emits one second-floored gap
row per consecutive pair INCLUDING the pair that straddles the
micro-batch boundary (the carried last_ts), and stores the new last
timestamp. Gap rows are append-only and emitted exactly once, so
under the in-order-arrival contract the drained gap table is
bit-identical to the batch lag — the registry query aggregates it
with the SAME fixed moment/finish expressions and therefore shares
ev_burstiness's oracle (the flux/lz stream==batch gating pattern).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("gs", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_ts", T.LongType())])


def gaps_stream(events_stream: DataFrame) -> DataFrame:
    """(user_id, event_type, ts, event_id) stream → append-only
    (event_type, gs) gap rows, gs in whole seconds (the batch
    operator's second-floored rule)."""

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        _user_id, event_type = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = rows["ts"].to_numpy()
        gaps = []
        prev = state.get[0] if state.exists else None
        for t in ts:
            t = int(t)
            if prev is not None:
                gaps.append((t - prev) // 1_000_000)
            prev = t
        state.update((prev,))
        if not gaps:
            return
        yield pd.DataFrame(
            {
                "event_type": pd.Series(
                    [event_type] * len(gaps), dtype=str
                ),
                "gs": pd.Series(gaps, dtype="int64"),
            }
        )

    return events_stream.select(
        "user_id", "event_type", "ts", "event_id"
    ).groupBy("user_id", "event_type").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
