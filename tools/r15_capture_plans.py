#!/usr/bin/env python
"""Capture `.explain("formatted")` for every registry query (round-15
optimization audit): one file per query under plans/r15/<tag>/.

Usage: python tools/r15_capture_plans.py <tag> [name ...]
  tag: subdirectory (e.g. all_before, after)
  names: optional subset; default = every registry query + the
         streaming rows' batch-parity twins (the benched plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "all_before"
    only = set(sys.argv[2:])
    out_dir = os.path.join(REPO, "plans", "r15", tag)
    os.makedirs(out_dir, exist_ok=True)

    from presto_copy_spark.functions import register_all
    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import get_spark
    from presto_copy_spark.streaming.jobs import BATCH_PARITY

    registry.load_all()
    spark = get_spark("r15-plan-capture")
    register_all(spark)

    names = sorted(only or registry.QUERIES)
    for name in names:
        fn = BATCH_PARITY.get(name) or registry.QUERIES[name]
        try:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print(name)


if __name__ == "__main__":
    main()
