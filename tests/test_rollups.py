"""Rollup ladder: lossless re-aggregation and level choice."""

from __future__ import annotations

import pytest

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.operators import (
    build_rollup,
    choose_level,
    downsample_from_rollup,
    downsample_minmax_time,
    rollup_from_rollup,
)

DAY = 86_400_000_000
WEEK = 7 * DAY
T0 = 694_224_000_000_000
T1 = 915_148_800_000_000


def _key(rows):
    return sorted(
        (r["channel"], r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
        for r in rows
    )


def test_choose_level():
    assert choose_level(WEEK) == 3_600_000_000
    assert choose_level(90_000_000) == 1_000_000  # 90 s: only 1 s divides
    assert choose_level(500) is None
    assert choose_level(60_000_000) == 60_000_000


def test_rollup_equals_direct(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir).filter(f"ts >= {T0} and ts < {T1}")
    direct = downsample_minmax_time(s, T0, T1, WEEK)
    daily = build_rollup(s, DAY, origin_us=T0)
    via = downsample_from_rollup(daily, DAY, T0, T1, WEEK)
    assert _key(direct.collect()) == _key(via.collect())


def test_rollup_ladder_maintenance(spark, sf_dir):
    """hour->day coarsening must equal a day rollup built from raw."""
    s = TBL.samples_view(spark, sf_dir).filter(f"ts >= {T0} and ts < {T1}")
    hourly = build_rollup(s, 3_600_000_000, origin_us=T0)
    day_from_hour = rollup_from_rollup(hourly, 24)
    day_direct = build_rollup(s, DAY, origin_us=T0)
    assert _key(day_from_hour.collect()) == _key(day_direct.collect())


def test_misaligned_pixel_rejected(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    daily = build_rollup(s, DAY, origin_us=T0)
    with pytest.raises(ValueError):
        downsample_from_rollup(daily, DAY, T0, T1, DAY + 1)
