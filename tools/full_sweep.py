#!/usr/bin/env python
"""Full-registry oracle sweep in CHUNKED vanilla sessions.

A single default-conf (1g driver) session dies of memory-pool aging
somewhere past ~170 registry queries (GCLocker retry exhaustion /
UNABLE_TO_ACQUIRE_MEMORY — the r9 ts_theil_sen artifact, reproduced
in r10's first 384-query attempt). The driver's 50-query gate never
approaches that age, so the honest way to sweep everything under the
gate's own conditions is N queries per FRESH subprocess session —
which this tool does, defaulting to 96/chunk.

Run: python tools/full_sweep.py [sf_dir] [chunk_size]
Output: per-chunk MATCH counts + one JSON summary line; exit 1 on
any mismatch.

Chunk default lowered 96 -> 64 (optimization r11): a 96-query chunk
reproduced the 1g aging death mid-chunk on a slower box (the
ts_theil_sen Py4J signature, then connection-refused for the chunk's
tail); 64 keeps a wider margin under the same 1g vanilla contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, math, os, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import duckdb
b = (SparkSession.builder.master("local[32]")
     .config("spark.ui.enabled", "false"))
# the measured conf floor for long-lived many-query sessions
# (session_aging_probe: 1g dies ~128 heavy queries, 2g survives 400+);
# set SPARK_GRAFT_DRIVER_MEM=2g with chunk_size=400 to run the WHOLE
# registry in one session
_dm = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
if _dm:
    b = b.config("spark.driver.memory", _dm)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
sf = {sf!r}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{{sf}}/{{t}}.parquet"
    if os.path.exists(p):
        con.execute(
            f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{p}}')")
def norm(v):
    if isinstance(v, float) and not isinstance(v, bool):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v
qs, osql = E.queries(), E.oracle_sql()
bad = []
for name in {names!r}:
    try:
        df = qs[name](spark, sf)
        cols = sorted(df.columns)
        # key=repr: a total order even when a nullable column mixes None
        # with values (tuple comparison would raise TypeError and
        # surface as ERROR instead of a comparison — ADVICE r11);
        # equality still compares the actual normalized tuples.
        s = sorted((tuple(norm(r[c]) for c in cols) for r in df.collect()),
                   key=repr)
        res = con.execute(osql[name])
        dc = [d[0] for d in res.description]
        d = sorted((tuple(norm(row[dc.index(c)]) for c in cols)
                    for row in res.fetchall()), key=repr)
        if s != d:
            bad.append(name)
    except Exception as ex:
        bad.append(name + ": " + repr(ex)[:120])
print("CHUNK_RESULT " + json.dumps(bad))
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    names = [n for n in E.queries() if n in E.oracle_sql()]
    all_bad: list[str] = []
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        proc = subprocess.run(
            [sys.executable, "-c",
             _CHILD.format(repo=REPO, sf=sf, names=part)],
            capture_output=True, text=True,
        )
        bad = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHUNK_RESULT "):
                bad = json.loads(line[len("CHUNK_RESULT "):])
        if bad is None:
            bad = [f"chunk {i // chunk}: session crashed (rc="
                   f"{proc.returncode})"]
        all_bad.extend(bad)
        print(f"chunk {i // chunk}: {len(part) - len(bad)}/{len(part)} "
              f"MATCH" + (f"; bad: {bad}" if bad else ""))
    print(json.dumps({
        "metric": "full_sweep", "sf_dir": sf, "total": len(names),
        "bad": all_bad, "chunk_size": chunk,
    }))
    if all_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
