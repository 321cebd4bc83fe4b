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


# --------------------------------------------------------------------------
# physical-plan shape assertions for the similarity/dedup hot paths
# --------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cosine_topk_plan_broadcasts_and_prereduces(spark):
    """The corpus side must never shuffle for scoring: queries are
    broadcast, and the partial top-k reduction sits before the single
    rank exchange."""
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.llm.similarity import cosine_topk

    embs = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    df = cosine_topk(embs, embs.filter(F.col("vec_id") < 4), k=3)
    plan = _plan(df)
    assert "BroadcastExchange" in plan          # query side broadcast
    assert "MapInPandas" in plan                # partial top-k reduction
    # exactly one shuffle: the final per-query rank window
    n_exchanges = plan.count("ShuffleExchange") or plan.count("Exchange hashpartitioning")
    assert n_exchanges >= 1
    before_window = plan.split("Window")[-1]
    assert "MapInPandas" in before_window       # reduction feeds the rank


def test_near_dup_plan_no_cartesian(spark):
    """LSH blocking must produce an equi-join on bucket, never a
    cartesian/broadcast nested loop over the corpus."""
    from pennsieve_streaming_spark.llm.similarity import cosine_near_dup_pairs

    embs = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 11) for j in range(8)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(
        cosine_near_dup_pairs(
            embs, min_cosine=0.1, n_tables=2, bits_per_table=4, dim=8
        )
    )
    assert "CartesianProduct" not in plan
    # banded LSH: candidates come from an equi-join on (tbl, key)
    assert "tbl" in plan and "key" in plan


def test_dedup_candidate_join_is_equi(spark):
    """The LSH candidate join must be an equi-join on (band, band_key)."""
    from pennsieve_streaming_spark.llm.dedup import (
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_wide,
    )

    sh = spark.createDataFrame(
        [(d, (d * 31 + k) % 97) for d in range(50) for k in range(10)],
        "doc_id long, sh long",
    )
    plan = _plan(lsh_candidate_pairs(lsh_band_keys(minhash_wide(sh))))
    assert "CartesianProduct" not in plan
    assert "band_key" in plan
