"""Round-8 wave-11 operator goldens."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_rle_stats_golden():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import rle_stats

    # two-row frame: [1 1 2 2], [1 1 1 1]
    g = np.array([[1, 1, 2, 2], [1, 1, 1, 1]])
    n_px, n_h, n_v = rle_stats(g)
    assert n_px == 8
    assert n_h == 2 + 1          # row0 has 2 runs, row1 has 1
    # columns: [1,1] [1,1] [2,1] [2,1] — transitions in cols 2 and 3
    assert n_v == 4 + 2


def test_rle_flat_is_maximally_compressible():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import rle_stats

    n_px, n_h, n_v = rle_stats(np.full((5, 6), 3))
    assert (n_h, n_v) == (5, 6)  # one run per row / per column


def test_dup_source_mix_golden(spark):
    from pennsieve_streaming_spark.llm.dedup import dup_source_mix

    docs = spark.createDataFrame(
        [(0, "s1"), (1, "s1"), (2, "s2")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "doc_a long, doc_b long"
    )
    out = dup_source_mix(pairs, docs).collect()[0]
    assert out.n_pairs == 3
    assert out.n_within == 1 and out.n_cross == 2
    assert out.within_share == round(1 / 3, 9)


def test_dup_source_mix_empty_pairs_sentinels(spark):
    from pennsieve_streaming_spark.llm.dedup import dup_source_mix

    docs = spark.createDataFrame([(0, "s1")], "doc_id long, source string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = dup_source_mix(pairs, docs).collect()[0]
    assert out.n_pairs == 0 and out.n_within == 0
    assert out.within_share == 0.0 and out.cross_share == 0.0


def test_weekend_effect_golden(spark):
    import math

    from pennsieve_streaming_spark.operators.analytics import (
        weekend_effect,
    )

    DAY = 86_400_000_000
    # 1970-01-01 was Thursday (dow (0+4)%7 = 4); +2 days = Saturday
    # (dow 6), +3 = Sunday (dow 0). Sat/Sun land on days 2,3,9,10 —
    # hand-picked, independent of the operator's dow formula.
    rows = []
    weekend_days = {2, 3, 9, 10}
    for d in range(14):
        # 'wk' fires every day; 'we' only Sat/Sun (days 2,3,9,10)
        rows.append(("wk", d * DAY))
        if d in weekend_days:
            rows.append(("we", d * DAY))
    ev = spark.createDataFrame(rows, "event_type string, ts long")
    out = {r.event_type: r for r in weekend_effect(ev).collect()}
    wk = out["wk"]
    assert wk.n == 14 and wk.n_weekend == 4
    z = (4 - 14 * 2 / 7) / math.sqrt(14 * (2 / 7) * (5 / 7))
    assert wk.z == round(z, 9) and wk.verdict == "calendar"
    we = out["we"]
    assert we.n == 4 and we.n_weekend == 4
    assert we.verdict == "weekend_heavy"
