#!/usr/bin/env python
"""Job-floor class decomposition (VERDICT r11 ask #3).

For each of the 16 material >2x bench rows that are claimed to sit at
the local job-scheduling floor (NOT the six accepted architecture
floors), measure per row:

  - solo sf0.1 median (bench protocol: warm plan, noop sink, N runs)
  - Spark job count for one execution (per-job local floor = solo/jobs)
  - DuckDB sf0.1 denominator (parsed from BASELINE.md's bench table)
  - sf1x Spark solo + sf1x DuckDB oracle time -> the sf1x ratio

The floor claim is per-row evidence iff: solo/jobs lands in the
measured 0.1-0.2 s/job local floor band AND the sf1x ratio is <= ~2x
(the gap does not survive one decade of data growth).  Any row whose
sf1x ratio reads >2x is flagged RE-PLAN — the table prints it loudly.

Streaming rows are measured through their BATCH_PARITY twins exactly
like bench.py (the oracles are batch SQL; the streaming machinery
premium is benched separately as streaming_machinery_sec).

Usage: python tools/floor_decomposition.py  (markdown to stdout)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"

ROWS = [
    "tpch_q03", "tpch_q04", "tpch_q05", "tpch_q07", "tpch_q08",
    "tpch_q09", "tpch_q10", "tpch_q12", "tpch_q16", "tpch_q17",
    "tpch_q20", "win_topn_row_number", "events_tumbling",
    "events_streaming_dedup", "multimodal_features",
    "multimodal_audio_features",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import get_spark
    from presto_copy_spark.streaming.jobs import BATCH_PARITY
    from tools.floor_table import duckdb_baseline
    from tools.scale_convergence import build_layouts

    registry.load_all()
    spark = get_spark("floor-decomposition")
    base01 = duckdb_baseline()
    layouts = build_layouts(spark)
    sf1x = layouts["sf1x"]

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def fn_for(name):
        return BATCH_PARITY.get(name) or registry.QUERIES[name]

    def solo(name, sf_dir, runs=5):
        # size shuffle partitions to the layout, like scale_convergence
        # (the local-session default of 8 is tuned for sf0.1; sf1x gets
        # the full core count — session.py sizing note)
        from presto_copy_spark.session import default_parallelism

        spark.conf.set(
            "spark.sql.shuffle.partitions",
            "8" if sf_dir == SF01 else str(default_parallelism()),
        )
        df = fn_for(name)(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        return statistics.median(samples)

    def njobs(name, sf_dir):
        # Count inside a dedicated job group and require two identical
        # reads (ADVICE r12): the old before/after diff over the GLOBAL
        # job list could under-count when retained-job eviction dropped
        # ids between the two snapshots, or drift when AQE re-plans
        # change the job count run-to-run — either silently inflates
        # the printed s/job floor in this evidence tool.
        df = fn_for(name)(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        counts = []
        for i in range(2):
            group = f"floor-njobs-{name}-{i}"
            spark.sparkContext.setJobGroup(group, "floor_decomposition njobs")
            try:
                df.write.format("noop").mode("overwrite").save()
            finally:
                spark.sparkContext.setJobGroup(None, None)
            counts.append(len(tracker.getJobIdsForGroup(group) or []))
        assert counts[0] == counts[1], (
            f"njobs({name}) unstable across identical runs: {counts}"
            " — AQE or eviction interfered; rerun in a quiet session"
        )
        return counts[0]

    def duck_times(sf_dir, names, runs=5):
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            glob = p if os.path.isfile(p) else f"{p}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
        out = {}
        for n in names:
            sql = registry.ORACLES[n]
            con.sql(sql).fetchall()  # warm
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            out[n] = statistics.median(samples)
        con.close()
        return out

    # warm the session once (floor_table.py note: first executedPlan
    # pays one-time rule init)
    w = spark.range(2).groupBy("id").count()
    w.write.format("noop").mode("overwrite").save()

    # same clean-window certification as bench.py: the first draft of
    # this table was measured in a drifting window (q16 solo read
    # 0.18 s then 0.36 s minutes apart) — refuse to print floor
    # evidence from an uncertified window
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(
        f"canary: final {gate['final_sec']:.3f}s"
        f" (ref {gate['ref_sec']}, band {gate['band']},"
        f" in_band={gate['in_band']},"
        f" attempts={len(gate['attempts'])})"
    )

    duck1x = duck_times(sf1x, ROWS)

    print(
        "| query | sf0.1 solo s | jobs | s/job | duckdb sf0.1 s |"
        " sf0.1 ratio | sf1x spark s | sf1x duckdb s | sf1x ratio |"
        " verdict |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for n in ROWS:
        s01 = solo(n, SF01)
        j = njobs(n, SF01) or 1
        s1x = solo(n, sf1x)
        d01 = base01.get(n, float("nan"))
        d1x = duck1x[n]
        r01 = s01 / d01 if d01 else float("nan")
        r1x = s1x / d1x
        verdict = "floor" if r1x <= 2.0 else "**RE-PLAN**"
        print(
            f"| {n} | {s01:.3f} | {j} | {s01 / j:.3f} | {d01:.4f} |"
            f" {r01:.1f}x | {s1x:.3f} | {d1x:.3f} | {r1x:.1f}x |"
            f" {verdict} |"
        )


if __name__ == "__main__":
    main()
