#!/usr/bin/env python
"""sf0.1 oracle-parity spot-check for the float-finish-heavy queries.

The r7 ts_spectral_slope red passed at sf0.001 and failed at sf0.01 —
quantization bugs in transcendental finishes can hide below the gate
SF. This job re-runs the driver-identical parity comparison at sf0.1
(10× the gate) for the queries whose outputs end in ln/exp/sqrt
finishes, where more rows mean more chances to land on a cross-engine
ULP boundary. Intended as the round-close hardening step (VERDICT r7
item 7); exits non-zero on any mismatch.

Run: python tools/parity_sf01_spotcheck.py   (~5-10 min on local[32])
Output: one MATCH/MISMATCH line per query + a JSON summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the float-finish-heavy set: ln/exp/sqrt finishes, order statistics
# interpolations, and this round's new quantized finishes
QUERIES = [
    "ts_spectral_slope", "ts_higuchi_fd", "ev_ab_sequential",
    "ts_dfa", "ts_kpss", "ts_variance_ratio", "ts_poincare",
    "ev_burstiness", "stream_burstiness", "ev_ab_conversion",
    "ev_retention_halflife", "ev_ab_power", "ts_adf_test",
    "ts_acf_halflife", "ts_hurst_rs", "ts_spectral_edge",
    "ts_welch_psd", "emb_silhouette", "doc_score_spearman",
    "ev_pareto_alpha",
    # wave-5/6 transcendental/sqrt finishes
    "ts_mann_kendall", "ev_mann_whitney", "ev_ab_cuped",
    "emb_intrinsic_dim", "doc_lexical_diversity",
    "mm_audio_dynamic_range", "ts_turning_points", "ts_cointegration",
    # round-10 float-finish additions: R²/sqrt (arch, cp/cpk, ks, z),
    # log10 dB, pow-threshold display, sigmoid-decile calibration
    "ts_arch_lm", "ts_process_capability", "ts_ks_two_sample",
    "ev_daily_anomalies", "mm_audio_snr", "mm_audio_pitch",
    "mm_audio_tempo", "emb_mmd", "doc_lsh_tuning",
    "doc_classifier_calibration", "doc_corpus_build",
    "doc_contamination_by_source", "doc_pack_efficiency",
    "emb_lsh_bucket_balance", "mm_image_palette", "doc_shard_manifest",
]


def main() -> None:
    t0 = time.monotonic()
    env = dict(os.environ)
    env["SPARK_GRAFT_PARITY_SF_DIR"] = "/root/testdata/sf0.1"
    args = [
        sys.executable, "-m", "pytest", "-q", "--no-header",
        *[
            f"tests/test_oracle_parity.py::test_oracle_parity[{q}]"
            for q in QUERIES
        ],
    ]
    r = subprocess.run(args, cwd=REPO, env=env)
    print(
        json.dumps(
            {
                "metric": "parity_sf01_spotcheck",
                "queries": len(QUERIES),
                "sf": 0.1,
                "passed": r.returncode == 0,
                "wall_sec": round(time.monotonic() - t0, 1),
            }
        )
    )
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
