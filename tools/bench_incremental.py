#!/usr/bin/env python
"""Scale point for the composed incremental-crawl build (r10 VERDICT
#2 done-condition): hold the STANDING corpus fixed and grow only the
DELTA — the shape where the screen must be linear in the delta.

Builds two dirs from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):
  * base:    documents as-is (delta = src0 rows within it)
  * deltaN:  standing (non-src0) rows unchanged + src0 replicated
    FACTOR x with doc_id strides and a per-replica token prefix (the
    make_sf1 convention — a near-dup-rich delta, not exact copies)

then times doc_incremental_build on each (min over REPS interleaved
passes) and prints ONE JSON line with the ratio and the load sentinel.
A healthy screen scales ~linearly in the delta: ratio <~ FACTOR x.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402
from bench import SENTINEL_QUIET_SEC, _sentinel_sec  # noqa: E402
from pennsieve_streaming_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
ID_STRIDE = 100_000_000


def build_dirs(root: str) -> tuple[str, str]:
    base, grown = f"{root}/base", f"{root}/delta{FACTOR}"
    os.makedirs(base, exist_ok=True)
    os.makedirs(grown, exist_ok=True)
    shutil.copyfile(
        f"{SRC}/documents.parquet", f"{base}/documents.parquet"
    )
    con = duckdb.connect()
    dc = f"read_parquet('{SRC}/documents.parquet')"
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source, n_chars FROM {dc}
          WHERE source <> 'src0'
          UNION ALL
          SELECT doc_id + rep * {ID_STRIDE} AS doc_id,
                 CASE WHEN rep = 0 THEN text
                      ELSE 'r' || CAST(rep AS VARCHAR) || ' ' || text
                 END AS text,
                 lang, source, n_chars
          FROM {dc},
               (SELECT unnest(range({FACTOR})) AS rep)
          WHERE source = 'src0'
        ) TO '{grown}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for d in (base, grown):
        n = con.execute(
            f"SELECT count(*), count(*) FILTER (source = 'src0') "
            f"FROM read_parquet('{d}/documents.parquet')"
        ).fetchone()
        print(f"{d}: total={n[0]} delta={n[1]}", file=sys.stderr)
    return base, grown


def main() -> None:
    root = tempfile.mkdtemp(prefix="pss_incr_bench_")
    base, grown = build_dirs(root)
    spark = get_spark("pss-bench-incremental")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sentinel = _sentinel_sec(spark)

    best = {"base": float("inf"), "grown": float("inf")}
    for _ in range(max(1, REPS)):
        for key, d in (("base", base), ("grown", grown)):
            t0 = time.perf_counter()
            entry.q_incremental_build(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            best[key] = min(best[key], time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "incremental_build_delta_scale",
                "value": round(best["grown"] / best["base"], 3),
                "unit": "ratio",
                "queries": {
                    "base_sec": round(best["base"], 4),
                    f"delta_x{FACTOR}_sec": round(best["grown"], 4),
                },
                "factor": FACTOR,
                "sentinel_sec": round(sentinel, 4),
                "load_ratio": round(sentinel / SENTINEL_QUIET_SEC, 3),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
