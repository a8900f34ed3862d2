#!/usr/bin/env python
"""Diagnose what accumulates across the bench.py 96-query loop.

Round-7 verdict: per-query swings of +-45-70% on byte-identical code
(dedup_simhash -45%, geo_wkt_polygon_ops +70%, sf1x dedup_minhash_lsh
2.96 -> 4.99 s) make the recorded headline a noise draw between ~2.4x
and ~2.7x.  Competing hypotheses:

  H1 accumulation — localCheckpoint'd model RDD blocks + broadcast
     blocks from earlier queries pin the (8g, single-JVM local-mode)
     heap, so later queries pay inflated GC; per-query cleanup fixes.
  H2 co-tenant bursts — host load spikes cover all 5 consecutive
     samples of whichever query is running; min-of-samples across
     spread-out passes fixes, cleanup does not.

Protocol (one process):
  phase A  measure CANARIES fresh (right after registration)
  phase B  run every other headline query once (accumulate state)
  phase C  re-measure CANARIES dirty (no cleanup)
  phase D  full cleanup (unpersist all RDDs, clearCache, dual GC)
  phase E  re-measure CANARIES clean

H1 predicts C >> A and E ~ A.  H2 predicts A/C/E statistically equal
(within a pass) with occasional correlated spikes.  JVM heap, GC time,
and pinned-RDD counts are recorded at every phase boundary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


CANARIES = [
    "docs_lm_quality",
    "sim_ivf_probe",
    "ml_learn_classify",
    "tpch_q02",
    "tpch_q18",
    "dedup_minhash_lsh",
]


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / 1e6
    gc_ms = 0
    gc_n = 0
    for bean in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans():
        gc_ms += bean.getCollectionTime()
        gc_n += bean.getCollectionCount()
    pinned = spark.sparkContext._jsc.getPersistentRDDs().size()
    return {
        "heap_used_mb": round(used, 1),
        "gc_ms_cum": gc_ms,
        "gc_count_cum": gc_n,
        "pinned_rdds": pinned,
    }


def cleanup(spark) -> None:
    """Release everything a finished query can leave pinned."""
    import gc

    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def measure(spark, fn, sf_dir, runs=5, prewarm=1):
    df = fn(spark, sf_dir)
    for _ in range(prewarm):
        df.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 4))
    return {
        "median": round(statistics.median(samples), 4),
        "min": min(samples),
        "samples": samples,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from presto_copy_spark.functions import register_all
    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import get_spark

    registry.load_all()
    spark = get_spark("bench-variance-diag")
    register_all(spark)

    from presto_copy_spark.streaming.jobs import BATCH_PARITY

    names = [n for n in sorted(registry.QUERIES) if n.startswith("tpch_")]
    for extra in sorted(registry.QUERIES):
        if not extra.startswith("tpch_") and extra.split("_")[0] in (
            "win", "events", "dedup", "text", "sim", "func", "ml",
            "multimodal", "geo", "docs", "pii",
        ):
            names.append(extra)

    out: dict = {"phases": {}}

    def phase(tag, fn):
        t0 = time.perf_counter()
        res = fn()
        out["phases"][tag] = {
            "wall_sec": round(time.perf_counter() - t0, 1),
            "jvm_after": jvm_stats(spark),
            "result": res,
        }
        print(f"--- {tag}: {out['phases'][tag]['jvm_after']}", file=sys.stderr)
        return res

    def run_canaries():
        return {
            n: measure(spark, BATCH_PARITY.get(n) or registry.QUERIES[n], sf_dir)
            for n in CANARIES
        }

    def accumulate():
        done = 0
        for n in names:
            if n in CANARIES:
                continue
            fn = BATCH_PARITY.get(n) or registry.QUERIES[n]
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                done += 1
            except Exception as e:
                print(f"accumulate: {n} failed: {e}", file=sys.stderr)
        return {"queries_run": done}

    out["phases"]["start"] = {"jvm": jvm_stats(spark)}
    phase("A_fresh", run_canaries)
    phase("B_accumulate", accumulate)
    phase("C_dirty", run_canaries)
    phase("D_cleanup", lambda: cleanup(spark))
    phase("E_clean", run_canaries)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_variance_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    # compact comparison table
    print(f"{'query':24s} {'A_fresh':>8s} {'C_dirty':>8s} {'E_clean':>8s}  (medians; min in parens)")
    for n in CANARIES:
        row = []
        for tag in ("A_fresh", "C_dirty", "E_clean"):
            r = out["phases"][tag]["result"][n]
            row.append(f"{r['median']:.3f}({r['min']:.3f})")
        print(f"{n:24s} {row[0]:>14s} {row[1]:>14s} {row[2]:>14s}")


if __name__ == "__main__":
    main()
