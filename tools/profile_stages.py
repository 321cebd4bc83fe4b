#!/usr/bin/env python
"""Per-stage wall/metric breakdown for declared queries (guide §1/§7).

Runs each named query once to the noop sink with event logging on,
then parses the event log and prints, per query: job/stage wall times,
task-time totals, shuffle read/write bytes, and input bytes — the
"where does the time go" evidence the optimization round needs.

Usage:
  python tools/profile_stages.py <query> [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pennsieve_streaming_spark.session import get_spark  # noqa: E402

LOGDIR = "/tmp/pss_eventlogs"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    spark = get_spark(
        "pss-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOGDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entry.queries()
    walls = {}
    for name in names:
        # rep 0 warms JIT/caches and is NOT reported; rep 1 (cache
        # cleared, like the bench) carries the Q:: description.
        for rep in (0, 1):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(
                f"Q::{name}" if rep else f"warm::{name}"
            )
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            walls[name] = (t1 - t0, t2 - t1)
            spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log (flat file, or the v2 rolling dir) ----
    logs = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(LOGDIR)
        for f in fs
        if not f.startswith("appstatus")
    ]
    ev = []
    for path in logs:
        with open(path) as f:
            for line in f:
                try:
                    ev.append(json.loads(line))
                except json.JSONDecodeError:
                    pass

    job_q = {}       # job id -> query name
    job_stages = {}  # job id -> [stage ids]
    stage_info = {}  # stage id -> dict
    for e in ev:
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            if desc.startswith("Q::"):
                jid = e["Job ID"]
                job_q[jid] = desc[3:]
                job_stages[jid] = [
                    s["Stage ID"] for s in e.get("Stage Infos", [])
                ]
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            stage_info[sid] = {
                "name": si.get("Stage Name", "")[:60],
                "wall_ms": si.get("Completion Time", 0)
                - si.get("Submission Time", 0),
                "tasks": si.get("Number of Tasks", 0),
            }
        elif t == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            d = stage_info.setdefault(sid, {})
            tm = e.get("Task Metrics") or {}
            d["task_ms"] = d.get("task_ms", 0) + tm.get(
                "Executor Run Time", 0
            )
            d["gc_ms"] = d.get("gc_ms", 0) + tm.get("JVM GC Time", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            im = tm.get("Input Metrics") or {}
            d["sh_read"] = d.get("sh_read", 0) + srm.get(
                "Remote Bytes Read", 0
            ) + srm.get("Local Bytes Read", 0)
            d["fetch_ms"] = d.get("fetch_ms", 0) + srm.get(
                "Fetch Wait Time", 0
            )
            d["sh_write"] = d.get("sh_write", 0) + swm.get(
                "Shuffle Bytes Written", 0
            )
            d["input"] = d.get("input", 0) + im.get("Bytes Read", 0)
            d["py_ms"] = d.get("py_ms", 0)

    for name in names:
        build, run = walls[name]
        print(f"\n=== {name}: build {build:.3f}s  exec {run:.3f}s ===")
        jids = sorted(j for j, q in job_q.items() if q == name)
        seen = set()
        for j in jids:
            for sid in sorted(job_stages.get(j, [])):
                if sid in seen or sid not in stage_info:
                    continue
                seen.add(sid)
                d = stage_info[sid]
                if "wall_ms" not in d:
                    continue  # skipped stage (reused exchange)
                print(
                    f"  job{j} stage{sid:>4} wall={d['wall_ms']:>6}ms "
                    f"task={d.get('task_ms', 0):>6}ms "
                    f"gc={d.get('gc_ms', 0):>4}ms "
                    f"fetch={d.get('fetch_ms', 0):>4}ms "
                    f"in={d.get('input', 0):>9} "
                    f"shR={d.get('sh_read', 0):>8} "
                    f"shW={d.get('sh_write', 0):>8} "
                    f"n={d.get('tasks', 0):>3}  {d.get('name', '')}"
                )


if __name__ == "__main__":
    main()
