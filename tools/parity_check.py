#!/usr/bin/env python
"""Oracle-parity check for a named subset of registry queries.

Run: python tools/parity_check.py <sf_dir> <query> [query ...]
Same normalization and comparison as tools/full_sweep.py, one fresh
session, exit 1 on any mismatch — the per-change verification loop of
an optimization round (full_sweep sweeps everything; this sweeps what
you just touched).
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def norm(v):
    if isinstance(v, float) and not isinstance(v, bool):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, osql = E.queries(), E.oracle_sql()
    bad = []
    for name in names:
        try:
            df = qs[name](spark, sf)
            cols = sorted(df.columns)
            # key=repr: a total order even when a nullable column
            # mixes None with values (tuple comparison would raise
            # TypeError and surface as ERROR instead of a comparison
            # — ADVICE r11); equality still compares the tuples.
            s = sorted(
                (tuple(norm(r[c]) for c in cols) for r in df.collect()),
                key=repr,
            )
            res = con.execute(osql[name])
            dc = [d[0] for d in res.description]
            d = sorted(
                (tuple(norm(row[dc.index(c)]) for c in cols)
                 for row in res.fetchall()),
                key=repr,
            )
            ok = s == d
        except Exception as ex:
            bad.append(name + ": " + repr(ex)[:160])
            print(f"{name}: ERROR {repr(ex)[:160]}")
            continue
        if not ok:
            bad.append(name)
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(s)} rows)")
    print(json.dumps({"metric": "parity_check", "sf_dir": sf,
                      "total": len(names), "bad": bad}))
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
