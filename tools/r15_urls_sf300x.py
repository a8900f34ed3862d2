#!/usr/bin/env python
"""dedup_urls seventh decade (round 15, VERDICT r14 Next #7): the
corrected r14 slope (~0.85x/decade from the sf100x 2.76x, after the
favorable-window 1.65x retraction) predicts crossover 2-3 decades out
— this half-decade read (sf300x, 15M docs) either confirms the slope
or retires the prediction.

Layout: 3000 key-shifted copies of the sf0.1 documents table (15M docs)
built as ONE plan — documents CROSS JOIN range(3000) with doc_id shift
and per-copy text tag — instead of the 300-branch union the sf30x tool
used (a 1000-branch union tree is all planner overhead).

Usage: python tools/r14_urls_sf300x.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale/sf300x_docs"
OFF = 10_000_000
COPIES = 3000


def main() -> None:
    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("urls-sf300x", shuffle_partitions=default_parallelism())
    from pyspark.sql import functions as F

    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    bp = f"{OUT}/documents.parquet"
    if not os.path.exists(f"{bp}/_SUCCESS"):
        os.makedirs(OUT, exist_ok=True)
        src = spark.read.parquet(f"{SRC}/documents.parquet")
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        big = (
            src.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy") * OFF).alias("doc_id"),
                F.regexp_replace(
                    "text", " ", F.concat(F.lit(" x"), F.col("copy"))
                ).alias("text"),
                "lang",
                "source",
            )
            .withColumn("n_chars", F.length("text"))
        )
        big.repartition(64).write.mode("overwrite").parquet(bp)
        print("layout built")

    q = "dedup_urls"
    df = registry.QUERIES[q](spark, OUT)
    df.write.format("noop").mode("overwrite").save()
    s = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        s.append(time.perf_counter() - t0)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{bp}/*.parquet'"
    )
    con.sql(registry.ORACLES[q]).fetchall()
    d = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.sql(registry.ORACLES[q]).fetchall()
        d.append(time.perf_counter() - t0)
    sm, dm = statistics.median(s), statistics.median(d)
    print(f"| sf300x (15M docs) | {sm:.3f} | {dm:.3f} | {sm / dm:.2f}x |")


if __name__ == "__main__":
    main()
