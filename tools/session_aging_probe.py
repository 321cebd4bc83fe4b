#!/usr/bin/env python
"""Reproduce + root-cause the 1g-driver session-aging artifact (r10
VERDICT #6): a vanilla default-conf session dies past ~170 registry
queries with GCLocker retry exhaustion / UNABLE_TO_ACQUIRE_MEMORY.

Hypotheses probed:
  H1 JVM GCLocker: G1 + tiny (1g) heap + 32 concurrent tasks doing
     JNI-critical work (lz4/snappy shuffle compression, Arrow) hit
     the JDK's GCLockerRetryAllocationCount=2 default — a JVM-level
     spurious OOM unrelated to Spark memory accounting.
  H2 Accumulated block-manager state: .cache()/persist/localCheckpoint
     blocks from earlier queries pin the unified pool (ContextCleaner
     only frees on driver GC of the weak refs).

Method: loop a fixed mixed set of registry queries (the cache/pin
users among them) in ONE session until failure or --max executions,
logging executions, persistent-RDD count, and JVM heap after each.
Modes (argv[1]):
  vanilla    — default conf (the failing shape)
  gclocker   — vanilla + -XX:GCLockerRetryAllocationCount=64  (H1)
  clearcache — vanilla + spark.catalog.clearCache() every 25   (H2)
  gc         — clearcache + driver System.gc() every 25 (H2 hard)
  mem2g      — vanilla + spark.driver.memory=2g (the conf floor)

Measured (r11, sf0.01): vanilla dies at exec 128 (GCLocker retry
exhaustion -> JVM OOM, heap 990/1024 MiB, persistentRDDs 15->51);
gc dies at 108 (same signature — cache/cleaner hygiene is NOT the
fix); gclocker survives to 228 (~1.8x) then dies with Spark
UNABLE_TO_ACQUIRE_MEMORY (the unified pool itself exhausts under
the residual heap creep); mem2g SURVIVES all 400 (heap sawtooths
0.3-1.7 GiB, stable) — the documented conf floor for long-lived
many-query sessions. See NOTES_r11 §6 for the full root cause.

Run: python tools/session_aging_probe.py vanilla [max_execs]
Prints one status line per 10 executions and a final JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "vanilla"
MAX = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# mixed set: cache users (minhash family), pin users (incremental
# build, tempo), persist users (curate), plus plain heavies — the
# same pressure profile as the full sweep, cycled
NAMES = [
    "doc_minhash_lsh_pairs",
    "doc_dup_clusters",
    "doc_corpus_build",
    "doc_incremental_build",
    "mm_audio_tempo",
    "emb_ann_ivf_pq",
    "doc_contamination_screened",
    "ts_minmax_downsample_count",
    "ts_theil_sen",
    "doc_bpe_token_ids",
    "ts_matrix_profile",
    "emb_cosine_topk",
    "doc_token_stats",
    "ts_fill_gaps",
    "ts_arch_lm",
    "doc_simhash",
    "emb_mmd",
    "ts_realtime_resample",
    "doc_lsh_tuning",
    "doc_pack_efficiency",
]


def main() -> None:
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[32]").config(
        "spark.ui.enabled", "false"
    )
    if MODE == "gclocker":
        # diagnostic flag on JDK 17 — the unlock must precede it
        b = b.config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=64",
        )
    if MODE == "mem2g":
        b = b.config("spark.driver.memory", "2g")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    jvm_rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    sc = spark.sparkContext._jsc.sc()

    t0 = time.time()
    n = 0
    err = None
    while n < MAX:
        name = NAMES[n % len(NAMES)]
        try:
            qs[name](spark, SF).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # noqa: BLE001 — record and stop
            err = f"{name}@{n}: {type(e).__name__}: {str(e)[:400]}"
            break
        n += 1
        if MODE == "clearcache" and n % 25 == 0:
            spark.catalog.clearCache()
        if MODE == "gc" and n % 25 == 0:
            # clear cached relations AND kick the ContextCleaner:
            # localCheckpoint blocks are only freed when the JVM GCs
            # the weak refs (default periodicGC is 30 min — far past
            # the session's death)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if n % 10 == 0:
            heap_mb = (
                jvm_rt.totalMemory() - jvm_rt.freeMemory()
            ) // 1048576
            n_rdds = sc.getPersistentRDDs().size()
            print(
                f"[{MODE}] exec={n} heap={heap_mb}MiB "
                f"persistentRDDs={n_rdds} "
                f"elapsed={time.time() - t0:.0f}s",
                flush=True,
            )
    heap_mb = (jvm_rt.totalMemory() - jvm_rt.freeMemory()) // 1048576
    print(
        json.dumps(
            {
                "metric": "session_aging_probe",
                "mode": MODE,
                "executions": n,
                "max": MAX,
                "survived": err is None,
                "error": err,
                "final_heap_mib": heap_mb,
                "persistent_rdds": sc.getPersistentRDDs().size(),
                "elapsed_sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
