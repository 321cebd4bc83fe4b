"""Suite-resident plan-shape guards (VERDICT r9 item 6): run the 100x
smoke's six heavy families at sf0.001 / factor 2 — guards only, no
timing assertions — through the SAME run_families/plan_problems code
the manual smoke uses, so a plan regression (lost broadcast, lost
WindowGroupLimit partial top-k, a sneaked shuffle join or cartesian)
fails the suite instead of waiting for the next manual 100x run.

The guard strings are judged on EXECUTED (post-AQE) plans: each
family actually runs to a noop sink at this tiny scale (~tens of
seconds total on local[*])."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_smoke_100x as smoke  # noqa: E402


def test_heavy_family_plans_keep_their_shape(spark, sf_dir):
    results, plans = smoke.run_families(spark, sf_dir, factor=2)
    # all six families built, executed, and captured
    assert set(plans) == {
        "doc_minhash_lsh_pairs",
        "emb_cosine_topk",
        "emb_ivf_ann",
        "ts_butterworth_longspan",
        "ts_butterworth_bulk_lanes",
        "doc_contamination_screened",
        "doc_crawl_screen",
    }
    assert all(v > 0 for v in results.values())
    assert smoke.plan_problems(plans) == []


def test_pitch_tempo_pin_holds(spark, sf_dir):
    """The r10 audit caught the pitch/tempo frame tables re-running
    their ranking window once per consuming subtree (24 parquet scans
    in the executed plan). The fix materializes the table once (r12:
    pin_big — persist + count, so the cached lineage stays printed
    under InMemoryRelation but executes only at the fill barrier);
    this guard asserts the executed plan's LIVE operators read the
    materialization instead of re-scanning parquet, so the regression
    can't sneak back."""
    import __spark_entry__ as entry
    from pennsieve_streaming_spark.util import live_plan_counts

    for name in ("mm_audio_pitch", "mm_audio_tempo"):
        df = entry.queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        c = live_plan_counts(
            df,
            {"scan": "Scan parquet", "cart": "CartesianProduct"},
            executed=True,
        )
        assert c["scan"] == 0, f"{name}: {c['scan']} live raw scans after pin"
        assert c["cart"] == 0


def test_fingerprint_pin_holds(spark, sf_dir):
    """The r11 global plan scan caught the H&K fingerprint tables
    re-running the per-frame FFT pandas stage once per consuming
    subtree (30 parquet scans in mm_audio_offset_search's planned
    query, 24 in mm_audio_match_pairs — the pitch/tempo replay
    disease in the fingerprint family). The fix materializes the
    narrow (channel, win, fp) tables once (r12: pin_big); this guard
    asserts the executed plan's LIVE operators read the
    materializations instead of re-scanning parquet."""
    import __spark_entry__ as entry
    from pennsieve_streaming_spark.util import live_plan_counts

    for name in ("mm_audio_match_pairs", "mm_audio_offset_search"):
        df = entry.queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        c = live_plan_counts(
            df,
            {"scan": "Scan parquet", "cart": "CartesianProduct"},
            executed=True,
        )
        assert c["scan"] == 0, f"{name}: {c['scan']} live raw scans after pin"
        assert c["cart"] == 0


def test_cross_corpus_broadcast_delta(spark, sf_dir):
    """A small crawl delta must BROADCAST into the containment join
    so the standing corpus's shingle table never shuffles (r10
    VERDICT #3 — the docstring promised this; now the plan proves
    it): the executed sh-join is a BroadcastHashJoin and no
    SortMergeJoin appears anywhere in the plan."""
    import __spark_entry__ as entry

    df = entry.queries()["doc_incremental_dedup"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "delta shuffled the corpus"
    assert "CartesianProduct" not in plan


def test_cross_corpus_broadcast_gate(spark):
    """The auto gate: a delta over CROSS_CORPUS_BROADCAST_DOCS ids
    falls back to the shuffle join (broadcast_delta resolves False),
    a small one broadcasts — proven via the forced flags on a tiny
    frame (the bounded count itself is exercised by the default-path
    test above)."""
    from pennsieve_streaming_spark.llm.dedup import (
        cross_corpus_containment,
    )

    sh = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)], "doc_id long, sh long"
    )
    new_ids = spark.createDataFrame([(1,)], "doc_id long")
    for flag, want in ((True, True), (False, False)):
        df = cross_corpus_containment(
            sh, new_ids, 0.5, broadcast_delta=flag
        )
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        has_smj = "SortMergeJoin" in plan
        if want:
            assert not has_smj
        # rows identical either way
        rows = {tuple(r) for r in df.collect()}
        assert rows == {(1, 2, 2, 1, 0.5, True)}


def test_incremental_build_pins_and_plan(spark, sf_dir):
    """doc_incremental_build's four pinned stages (exact-deduped
    delta, the delta shingle table the broadcast-delta screen fast
    path pins, screened fresh set, manifest base) each execute ONCE
    with a shuffle-join-free shape, and the finish plan reads only
    the checkpoints (zero raw scans, no SMJ after the seqs
    broadcast)."""
    import pennsieve_streaming_spark.util as U
    import __spark_entry__ as entry

    captured = []
    real_pin = U.pin

    def spy(df, eager=True):
        r = real_pin(df, eager)
        captured.append(df)
        return r

    # entry binds ``pin`` at module level (r11), so patch the
    # already-bound symbol there as well as the util module — the spy
    # must work whether or not entry was imported by an earlier test.
    U.pin = spy
    entry.pin = spy
    try:
        df = entry.q_incremental_build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    finally:
        U.pin = real_pin
        entry.pin = real_pin
    assert len(captured) == 4
    for stage in captured:
        p = stage._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.count("FileScan") + final.count("Scan parquet") == 0
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_crawl_screen_plan_no_joins(spark, sf_dir):
    """The bloom crawl screen's scoring pass is ONE narrow map: the
    executed plan carries only broadcast joins (the 1-row bitset and
    the delta id semi-join) — no SMJ, no shuffle join, no cartesian
    anywhere."""
    import __spark_entry__ as entry

    df = entry.queries()["doc_crawl_screen"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
