#!/usr/bin/env python
"""docs_quality_classifier decade sweep — TRAIN-INCLUSIVE on both
engines (round 14).

The bench protocol builds each DataFrame once, and this query's
training runs driver-side at build time (qc_learn_weights collects the
65-long gradient per step), so bench's timed saves price SCORING
against frozen weights while DuckDB re-runs its train CTEs per run —
the same documented asymmetry class as the ANN model rows (bench.py
"note").  This sweep removes it: each timed Spark run REBUILDS the
DataFrame (re-trains, re-collects) before the noop save; DuckDB runs
the full oracle.  3 runs, medians, canary-certified window.

Usage: python tools/r14_classifier_decades.py [sf1x sf3x sf10x]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = "/tmp/spark_graft_scale"
Q = "docs_quality_classifier"


def main() -> None:
    layouts = sys.argv[1:] or ["sf1x", "sf3x", "sf10x"]

    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("r14-clf", shuffle_partitions=default_parallelism())
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    print("| layout | spark train+score | duckdb train+score | ratio |")
    print("|---|---|---|---|")
    for lname in layouts:
        ldir = f"{SCALE}/{lname}"

        def run_spark() -> float:
            t0 = time.perf_counter()
            registry.QUERIES[Q](spark, ldir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        run_spark()  # warm (codegen, file listing)
        s = [run_spark() for _ in range(3)]

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM"
            f" '{ldir}/documents.parquet/*.parquet'"
        )
        con.sql(registry.ORACLES[Q]).fetchall()  # warm
        d = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(registry.ORACLES[Q]).fetchall()
            d.append(time.perf_counter() - t0)
        con.close()
        sm, dm = statistics.median(s), statistics.median(d)
        print(f"| {lname} | {sm:.3f} | {dm:.3f} | {sm / dm:.2f}x |")


if __name__ == "__main__":
    main()
