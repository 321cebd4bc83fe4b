"""Streaming Simpson-diversity state: per-(user, type) exact event
counts maintained incrementally — the kmv/circadian/benford
commutative class (counts commute, so NO in-order contract). The
diversity finishes are NOT computed here: the caller aggregates the
drained counts with the SAME shared SIMPSON_LAMBDA Spark SQL
expression as the batch operator, so ev_simpson_diversity's oracle
gates the stream verbatim (the stream_benford pattern).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("c", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("c", T.LongType())])


def type_counts_stream(events_stream: DataFrame) -> DataFrame:
    """Incremental per-(user, type) event counts. Emits the
    cumulative count per touched key per micro-batch; the max per
    key (monotone) is the batch count."""

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        c = int(state.get[0]) if state.exists else 0
        c += len(rows)
        state.update((c,))
        yield pd.DataFrame(
            [{"user_id": int(user_id), "event_type": event_type, "c": c}]
        )

    return events_stream.select("user_id", "event_type").groupBy(
        "user_id", "event_type"
    ).applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
