#!/usr/bin/env python
"""Round-14 paired adjudication of the two >30% round-over-round movers
(VERDICT r13 Wrong #2): win_range_frame (0.066 -> 0.118 s) and
text_repetition (0.178 -> 0.235 s).  Neither was touched in r13; both
sit inside the documented window-noise band.  Protocol: canary-certify
the window, then run BOTH engines paired (3 Spark noop-sink runs +
3 DuckDB fetchall runs, medians) — run this in 2-3 separate windows
and compare the spread to the r12/r13 record deltas.

Usage: python tools/r14_noise_movers.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["win_range_frame", "text_repetition"]


def main() -> None:
    import duckdb

    from presto_copy_spark.catalog import TABLES
    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import get_spark

    registry.load_all()
    spark = get_spark("r14-noise-movers")
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    print("| query | spark med (3) | duckdb med (3) | ratio |")
    print("|---|---|---|---|")
    for q in QUERIES:
        df = registry.QUERIES[q](spark, SF)
        df.write.format("noop").mode("overwrite").save()  # warm
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s.append(time.perf_counter() - t0)
        con.sql(registry.ORACLES[q]).fetchall()  # warm
        d = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(registry.ORACLES[q]).fetchall()
            d.append(time.perf_counter() - t0)
        sm, dm = statistics.median(s), statistics.median(d)
        print(f"| {q} | {sm:.3f} | {dm:.3f} | {sm / dm:.1f}x |")


if __name__ == "__main__":
    main()
