#!/usr/bin/env python
"""Round-15 scale read: persisted-ANN probe, Spark vs DuckDB, PAIRED.

Complements tools/r15_ann_index_ab.py (Spark probe vs Spark inline):
this prices the PROBE against the symmetric DuckDB denominator (index
prebuilt untimed into temp tables via the same
registry.BENCH_ORACLE_BUILDERS builder bench uses) at sf1x / sf10x —
the decade story for the sf0.1 job-floor row in the headline bench.

Usage: python tools/r15_ann_scale.py [sf1x sf10x]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = "/tmp/spark_graft_scale"


def main() -> None:
    layouts = sys.argv[1:] or ["sf1x", "sf10x"]

    import duckdb

    from pyspark.sql import functions as F

    from presto_copy_spark.operators.ann_index import (
        persist_ann_index,
        probe_ann_index,
    )
    from presto_copy_spark.queries import registry
    from presto_copy_spark.queries.similarity import (
        PQ_QMOD,
        _ann_bench_probe_oracle,
        _emb,
        ivfadc_quantize,
    )
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("r15-ann-scale", shuffle_partitions=default_parallelism())
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    print("| layout | spark probe | duckdb probe (prebuilt index) | ratio |")
    print("|---|---|---|---|")
    for lname in layouts:
        ldir = f"{SCALE}/{lname}"
        prefix = f"r15sc_{lname}"
        persist_ann_index(spark, _emb(spark, ldir), prefix)
        try:
            qs = (
                ivfadc_quantize(_emb(spark, ldir))
                .filter(F.col("vec_id") % PQ_QMOD == 0)
                .select(F.col("vec_id").alias("qid"), "qarr")
            )
            con = duckdb.connect()
            ep = f"{ldir}/embeddings.parquet"
            glob = f"{ep}/*.parquet" if os.path.isdir(ep) else ep
            con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{glob}'")
            probe_sql = _ann_bench_probe_oracle(con)  # builds temp index, untimed
            con.sql(probe_sql).fetchall()  # warm
            probe_ann_index(spark, qs, prefix).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            s: list[float] = []
            d: list[float] = []
            for _ in range(3):
                t0 = time.perf_counter()
                probe_ann_index(spark, qs, prefix).write.format("noop").mode(
                    "overwrite"
                ).save()
                s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.sql(probe_sql).fetchall()
                d.append(time.perf_counter() - t0)
            con.close()
            sm, dm = statistics.median(s), statistics.median(d)
            print(f"| {lname} | {sm:.3f} | {dm:.3f} | {sm / dm:.2f}x |")
        finally:
            for suf in ("centroids", "pq", "codes", "vectors"):
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_{suf}")


if __name__ == "__main__":
    main()
