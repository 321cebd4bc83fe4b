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
    }
    assert all(v > 0 for v in results.values())
    assert smoke.plan_problems(plans) == []


def test_pitch_tempo_pin_holds(spark, sf_dir):
    """The r10 audit caught the pitch/tempo frame tables re-running
    their ranking window once per consuming subtree (24 parquet scans
    in the executed plan). The fix pins (localCheckpoints) the table;
    this guard asserts the executed plan reads the checkpoint instead
    of re-scanning parquet, so the regression can't sneak back."""
    import __spark_entry__ as entry

    for name in ("mm_audio_pitch", "mm_audio_tempo"):
        df = entry.queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_scans = plan.count("FileScan") + plan.count("Scan parquet")
        assert n_scans == 0, f"{name}: {n_scans} raw scans after pin"
        assert "CartesianProduct" not in plan
