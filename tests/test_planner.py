"""Query-router decisions from catalog metadata only."""

from __future__ import annotations

import pytest

from pennsieve_streaming_spark.operators.window import QueryLimitExceeded
from pennsieve_streaming_spark.plans import plan_pixel_query

US = 1_000_000
HOUR = 3600 * US


def test_raw_when_zoomed_in():
    # 2 samples per pixel at 250 Hz -> raw
    p = plan_pixel_query(0, 10 * US, 8000, 250.0)
    assert p.path == "raw"
    assert p.estimated_input_rows == 2500


def test_raw_over_limit_rejected():
    with pytest.raises(QueryLimitExceeded):
        plan_pixel_query(0, 3600 * US, 8000, 250.0)  # 900k samples raw


def test_direct_when_no_level_divides():
    # pixel 166646 µs: no ladder level divides -> direct from raw
    p = plan_pixel_query(0, 23 * US, 166_646, 200.0)
    assert p.path == "direct"
    assert p.estimated_output_rows == 23 * US // 166_646


def test_rollup_for_wide_views():
    # 1 px = 1 hour over 30 days at 1 kHz -> hourly rollup
    p = plan_pixel_query(0, 30 * 24 * HOUR, HOUR, 1000.0)
    assert p.path == "rollup"
    assert p.rollup_level_us == HOUR
    assert p.estimated_input_rows == 30 * 24
    # vs 2.6e9 raw rows — the whole point
    assert p.estimated_input_rows < 1000


def test_rollup_skipped_when_buckets_subsample():
    # 1 s rollup buckets hold <1 sample at 0.5 Hz -> direct
    p = plan_pixel_query(0, 1000 * US, 10 * US, 0.5)
    assert p.path in ("direct", "raw")
