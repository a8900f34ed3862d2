#!/usr/bin/env python
"""Short subset bench for JVM-level A/B (fresh JVM per invocation).

Usage: python tools/r15_subset_bench.py [label]
Env: R15_JAVA_OPTS extra driver/executor JVM flags (local mode: one JVM).

Prints one JSON line {label, total, queries{...}, canary}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "dedup_semantic",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh_neardup",
    "dedup_ngram_jaccard",
    "dedup_exact_substring",
    "docs_filter_funnel",
    "tpch_q01",
    "tpch_q09",
    "tpch_q18",
    "tpch_q21",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    java_opts = os.environ.get("R15_JAVA_OPTS", "")

    from presto_copy_spark.functions import register_all
    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import get_spark

    registry.load_all()
    extra = {}
    if java_opts:
        extra["spark.driver.extraJavaOptions"] = java_opts
    cg = os.environ.get("R15_CODEGEN_CACHE", "")
    if cg:
        extra["spark.sql.codegen.cache.maxEntries"] = cg
    spark = get_spark("r15-subset", extra_conf=extra)
    register_all(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    cdf = spark.range(0, 500_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) AS h"
    )
    cdf.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    cdf.write.format("noop").mode("overwrite").save()
    canary = time.perf_counter() - t0

    dfs = {n: registry.QUERIES[n](spark, sf_dir) for n in SUBSET}
    # global warmup pass
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    out = {}
    for n, df in dfs.items():
        xs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            xs.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(xs), 4)
    print(
        json.dumps(
            {
                "label": label,
                "java_opts": java_opts,
                "canary": round(canary, 4),
                "total": round(sum(out.values()), 4),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
