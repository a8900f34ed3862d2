#!/usr/bin/env python
"""Round-14 sf30x documents decade (VERDICT r13 ask #8 + the new
classifier's scale read).

Runs documents-only registry queries on the persisted 300-copy layout
(/tmp/spark_graft_scale/sf30x_docs, built by tools/urls_sf30x.py)
exactly like tools/scale_convergence.py: 3 runs, median, warm, noop
sink; DuckDB runs the literal oracle SQL on the same parquet.

Usage: python tools/r14_sf30x_docs.py [query ...]
       (default: dedup_exact_substring docs_quality_classifier)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_scale/sf30x_docs"


def main() -> None:
    names = sys.argv[1:] or ["dedup_exact_substring", "docs_quality_classifier"]

    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("r14-sf30x", shuffle_partitions=default_parallelism())
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")
    assert os.path.exists(f"{OUT}/documents.parquet/_SUCCESS"), "layout missing"

    print("| query | spark med (3) | duckdb med (3) | ratio |")
    print("|---|---|---|---|")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{OUT}/documents.parquet/*.parquet'"
    )
    for q in names:
        df = registry.QUERIES[q](spark, OUT)
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
        print(f"| {q} | {sm:.3f} | {dm:.3f} | {sm / dm:.2f}x |")


if __name__ == "__main__":
    main()
