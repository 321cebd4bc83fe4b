"""Core window query: time-range slice + limit + cost guard.

Reference semantics (SURVEY.md §2.2, §3.2): the REST continuous
endpoint answers ``channel, [start,end), limit`` with raw
``(ts, value)`` pairs. The reference needs a 6-case trim taxonomy
(query/TimeSeriesQueryUtils.scala:114-154) because timestamps are
implicit in file offsets; with explicit timestamps the whole taxonomy
collapses into one predicate, which Catalyst pushes down to the
Parquet scan (partition pruning + row-group min/max skipping at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.datamodel import DEFAULT_QUERY_LIMIT


class QueryLimitExceeded(Exception):
    """Raised when the estimated sample count exceeds the query limit."""


def check_query_limit(
    start_us: int, end_us: int, rate_hz: float, limit: int = DEFAULT_QUERY_LIMIT
) -> None:
    """Pre-flight cost guard — reference ``overLimit``
    (query/TimeSeriesQueryUtils.scala:362-369): estimated samples
    ``(end-start)/1e6*rate`` must be ≤ limit.

    Runs on the driver against catalog metadata only; no Spark job.
    """
    estimated = (end_us - start_us) / 1e6 * rate_hz
    if estimated > limit:
        raise QueryLimitExceeded(f"exceeded retrieval limit of {limit}")


def window_query(
    samples: DataFrame,
    channel: str | list[str] | None,
    start_us: int,
    end_us: int,
    limit: int | None = None,
) -> DataFrame:
    """Raw sample slice: REST `/ts/retrieve/continuous` semantics
    (reference server/ContinuousQueryService.scala:47-96 →
    QuerySequencer.scala:62-105). Start inclusive, end exclusive of
    trailing samples beyond the window (the reference's trim keeps
    ``[queryStart, queryEnd)`` worth of samples; with explicit ts this
    is one predicate).

    ``limit`` reproduces O2 ``seq.take(limit)``
    (query/TimeSeriesQueryRawHttp.scala:183-186) but deterministically:
    samples are taken in (ts, value) order. Catalyst compiles
    sort+limit into TakeOrderedAndProject (no full sort at scale).
    """
    df = samples.filter((F.col("ts") >= start_us) & (F.col("ts") < end_us))
    if channel is not None:
        if isinstance(channel, str):
            df = df.filter(F.col("channel") == channel)
        else:
            df = df.filter(F.col("channel").isin(channel))
    # limit=0 short-circuits via Catalyst's PropagateEmptyRelation (P4,
    # reference query/TimeSeriesQueryRawHttp.scala:59-80).
    if limit is not None:
        df = df.orderBy("ts", "value").limit(limit)
    return df


def epoch_rebase(df: DataFrame, package_min_ts: int | Column, cols: list[str] | None = None) -> DataFrame:
    """F5 epoch re-basing: subtract the package minimum time from
    timestamp columns (reference resetResponseTimestamps,
    server/TimeSeriesFlow.scala:382-429; package min at :169).
    """
    cols = cols or ["ts"]
    base = F.lit(package_min_ts) if isinstance(package_min_ts, int) else package_min_ts
    for c in cols:
        df = df.withColumn(c, F.col(c) - base)
    return df
