#!/usr/bin/env python
"""Bloom-ladder headroom smoke (VERDICT r9 item 2): a benchmark with
~1M distinct shingles — beyond the OLD 1 Mib clamp's 16-bits/element
range — screened against a clean corpus, at the auto-sized rung vs
the old clamp top.

The corpus shares (essentially) nothing with the synthetic benchmark,
so the bloom-flagged fraction directly measures the FP-driven ratio
leakage: at 1 Mib / ~1M shingles the bitset saturates (per-shingle FP
(1−e^{−3})³ ≈ 0.85 ⇒ bloom_ratio ≈ 0.85 > 0.5 ⇒ EVERY doc flagged ⇒
the exact audit runs corpus-wide and the screen saves nothing); at
the auto-sized 16 Mib rung (≥16 bits/element) the FP is ~5e-3
worst-case and the screen stays selective. Correctness is unaffected
either way (no false negatives at any load factor) — this smoke pins
the PERFORMANCE cliff the r10 ladder extension removed.

Run: python tools/bloom_ladder_smoke.py   (~1-3 min on local[32])
Output: one JSON line per configuration + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pennsieve_streaming_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BLOOM_BENCH_DOCS", "10000"))
TOKENS_PER_DOC = 100


def main() -> None:
    from pennsieve_streaming_spark.llm.curation import (
        bloom_bits_for,
        contamination_screened,
    )

    spark = get_spark("pss-bloom-ladder-smoke")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    # synthetic benchmark: unique vocabulary => ~98 distinct 3-shingles
    # per doc, ~1M total — nothing the corpus can genuinely overlap
    bench = spark.range(N_BENCH_DOCS).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, {TOKENS_PER_DOC - 1}), "
            f"j -> concat('uvw', CAST(id * {TOKENS_PER_DOC} + j "
            "AS STRING))), ' ')"
        ).alias("text"),
    )
    n_shingles_bench = N_BENCH_DOCS * (TOKENS_PER_DOC - 2)
    auto_bits = bloom_bits_for(n_shingles_bench)

    results = []
    for label, n_bits in (
        ("auto_r10_ladder", None),           # -> 16 Mib at ~1M shingles
        ("old_clamp_1mib", 1_048_576),       # the pre-r10 ladder top
    ):
        t0 = time.monotonic()
        out = contamination_screened(
            docs, bench, k=3, threshold=0.5, n_bits=n_bits,
            fast_hash=True,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(n_bloom_hits AS DOUBLE) > "
                    "0.5 * CAST(n_shingles AS DOUBLE) "
                    "THEN 1 ELSE 0 END"
                )
            ).alias("n_flagged"),
            F.sum(F.expr("CASE WHEN contaminated THEN 1 ELSE 0 END"))
            .alias("n_contaminated"),
        ).collect()[0]
        secs = time.monotonic() - t0
        rec = {
            "config": label,
            "n_bits": n_bits if n_bits is not None else auto_bits,
            "bits_per_element": round(
                (n_bits or auto_bits) / n_shingles_bench, 2
            ),
            "bench_shingles": n_shingles_bench,
            "corpus_docs": int(agg["n"]),
            "flagged_docs": int(agg["n_flagged"]),
            "flagged_frac": round(agg["n_flagged"] / agg["n"], 4),
            "contaminated_docs": int(agg["n_contaminated"]),
            "sec": round(secs, 2),
        }
        results.append(rec)
        print(json.dumps(rec))
    print(
        json.dumps(
            {
                "metric": "bloom_ladder_smoke",
                "corpus_docs": n_docs,
                "selective": results[0]["flagged_frac"] < 0.05,
                "old_clamp_saturated": results[1]["flagged_frac"] > 0.5,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
