#!/usr/bin/env python
"""Capture .explain("formatted") output for a set of declared queries.

Usage:
  python tools/capture_plans.py <outdir> [query ...]

With no query names, captures the headline + heavy sets. Plans are
written to <outdir>/<query>.txt. Planning only — nothing is executed,
so this is safe to run alongside other jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pennsieve_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_heavy import HEAVY

        names = list(dict.fromkeys(HEADLINE + HEAVY))
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pss-capture-plans")
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")
    spark.stop()


if __name__ == "__main__":
    main()
