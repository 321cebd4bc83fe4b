#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from pennsieve_streaming_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ts_window_query",
    "ts_minmax_downsample_time",
    "ts_minmax_downsample_count",
    "ts_fill_gaps",
    "ts_gap_spans",
    "ts_montage",
    "ts_event_summary",
    "ts_epoch_rebase",
    "ts_cut_resample",
    "ts_realtime_resample",
    "ts_rollup_downsample",
    "doc_exact_dedup",
    "doc_token_stats",
    "doc_lang_id",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "emb_cosine_topk",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("pss-bench")

    # warm up the JVM / scheduler so the first query isn't taxed
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(max(1, REPS)):  # min-of-N damps co-tenant noise
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
