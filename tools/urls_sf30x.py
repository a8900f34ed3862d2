#!/usr/bin/env python
"""dedup_urls fifth decade (round 13, VERDICT r12 ask #8).

dedup_urls' absolutes stayed FLAT (0.26 -> 0.81 s) across sf0.1 ->
sf10x while DuckDB grew linearly; one more decade should put the
crossover below 1x.  The query reads ONLY the documents table (URLs
derive from doc_id), so this builds a documents-only 300-copy layout
(1.5M docs) instead of a full sf30x table set, then measures both
engines on it exactly like tools/scale_convergence.py (3 runs, median,
warm; DuckDB runs the literal oracle SQL).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale/sf30x_docs"
OFF = 10_000_000
COPIES = 300


def main() -> None:
    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("urls-sf30x", shuffle_partitions=default_parallelism())
    from pyspark.sql import functions as F

    bp = f"{OUT}/documents.parquet"
    if not os.path.exists(f"{bp}/_SUCCESS"):
        os.makedirs(OUT, exist_ok=True)
        src = spark.read.parquet(f"{SRC}/documents.parquet")
        # same key-shift + text-tagging scheme as scale_convergence
        # (linear corpus growth, no adversarial verbatim duplicates)
        parts = [
            src.withColumn("doc_id", F.col("doc_id") + i * OFF)
            .withColumn("text", F.regexp_replace("text", " ", f" x{i}"))
            .withColumn("n_chars", F.length("text"))
            for i in range(COPIES)
        ]
        big = parts[0]
        for c in parts[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(bp)

    df = registry.QUERIES["dedup_urls"](spark, OUT)
    df.write.format("noop").mode("overwrite").save()
    s = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        s.append(time.perf_counter() - t0)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{bp}/*.parquet'")
    sql = registry.ORACLES["dedup_urls"]
    con.sql(sql).fetchall()
    d = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        d.append(time.perf_counter() - t0)
    sm, dm = statistics.median(s), statistics.median(d)
    print(f"sf30x (1.5M docs): spark {sm:.3f}s duckdb {dm:.3f}s ratio {sm/dm:.2f}x")
    print(f"  spark samples {[round(x,3) for x in s]} duckdb {[round(x,3) for x in d]}")


if __name__ == "__main__":
    main()
