"""Pixel-query routing — the engine's (small) planner.

The reference hard-codes its "optimizer" as scattered driver branches
(SURVEY §4): the 100k cost guard, the resample-vs-raw ratio, and
always-from-raw execution. Catalyst owns the relational planning here;
what remains engine-specific is the *physical source* decision for a
visual query, made from catalog metadata only (no data scan):

  raw          — few samples per pixel (ratio <= 3): send samples
  direct       — resample from the samples table
  rollup:L     — resample from the coarsest rollup level L that
                 divides the pixel width (reads ~pixel/L rows per
                 pixel instead of pixel*rate/1e6 raw samples)

The decision is O(1) per channel; `estimated_rows` lets a serving
layer enforce admission control before any job starts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pennsieve_streaming_spark.datamodel import DEFAULT_QUERY_LIMIT
from pennsieve_streaming_spark.operators.downsample import should_resample
from pennsieve_streaming_spark.operators.rollups import DEFAULT_LEVELS_US, choose_level
from pennsieve_streaming_spark.operators.window import check_query_limit


@dataclass(frozen=True)
class QueryPlan:
    path: str                 # 'raw' | 'direct' | 'rollup'
    rollup_level_us: int | None
    estimated_input_rows: int
    estimated_output_rows: int


def plan_pixel_query(
    start_us: int,
    end_us: int,
    pixel_width_us: int,
    rate_hz: float,
    rollup_levels_us: list[int] | None = None,
    raw_limit: int | None = DEFAULT_QUERY_LIMIT,
) -> QueryPlan:
    """Choose the physical path for one channel's pixel query.

    Raises QueryLimitExceeded only for raw-path queries over the
    admission limit (the reference guards only the raw REST path);
    pass ``raw_limit=None`` when the caller supplies an explicit row
    limit instead.
    """
    duration = end_us - start_us
    raw_rows = int(duration / 1e6 * rate_hz)

    if pixel_width_us <= 0 or not should_resample(rate_hz, pixel_width_us):
        if raw_limit is not None:
            check_query_limit(start_us, end_us, rate_hz, raw_limit)
        return QueryPlan("raw", None, raw_rows, raw_rows)

    n_pixels = max(1, duration // pixel_width_us)
    level = choose_level(pixel_width_us, rollup_levels_us or DEFAULT_LEVELS_US)
    if level is not None and level > 1e6 / rate_hz:
        # rollup only wins when its buckets hold >1 raw sample
        return QueryPlan("rollup", level, int(duration // level), int(n_pixels))
    return QueryPlan("direct", None, raw_rows, int(n_pixels))
