#!/usr/bin/env python
"""Round-15 A/B: persisted ANN index probe vs inline sim_ivfadc.

VERDICT r14 Missing #2 / Next #5 evidence: the inline pipeline
re-trains the coarse quantizer + PQ codebook and re-encodes the whole
corpus on every query batch; the persisted index pays that once at
persist time and every probe after that reads ONLY its probed cells
(partition pruning) plus the KB-sized model rows.  This measures the
two paths paired in one window (3 runs each, interleaved, medians) on
the sf1x / sf10x embedding layouts, plus the one-time persist cost.

Usage: python tools/r15_ann_index_ab.py [sf1x sf10x]
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

    from pyspark.sql import functions as F

    from presto_copy_spark.operators.ann_index import (
        persist_ann_index,
        probe_ann_index,
    )
    from presto_copy_spark.queries import registry
    from presto_copy_spark.queries.similarity import PQ_QMOD, _emb, ivfadc_quantize
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark("r15-ann-ab", shuffle_partitions=default_parallelism())
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    print("| layout | inline (train+search) | persisted probe | probe/inline |")
    print("|---|---|---|---|")
    for lname in layouts:
        ldir = f"{SCALE}/{lname}"
        prefix = f"r15ab_{lname}"
        t0 = time.time()
        persist_ann_index(spark, _emb(spark, ldir), prefix)
        build_s = time.time() - t0
        try:
            qs = (
                ivfadc_quantize(_emb(spark, ldir))
                .filter(F.col("vec_id") % PQ_QMOD == 0)
                .select(F.col("vec_id").alias("qid"), "qarr")
            )

            def run_probe():
                probe_ann_index(spark, qs, prefix).write.format("noop").mode(
                    "overwrite"
                ).save()

            def run_inline():
                registry.QUERIES["sim_ivfadc"](spark, ldir).write.format(
                    "noop"
                ).mode("overwrite").save()

            run_probe()  # warm both plans
            run_inline()
            samples: dict[str, list[float]] = {"probe": [], "inline": []}
            for _ in range(3):
                for key, fn in (("inline", run_inline), ("probe", run_probe)):
                    t0 = time.time()
                    fn()
                    samples[key].append(time.time() - t0)
            il = statistics.median(samples["inline"])
            pr = statistics.median(samples["probe"])
            print(
                f"| {lname} | {il:.3f} | {pr:.3f} | {pr / il:.2f}x |"
                f"  (one-time persist {build_s:.1f}s)"
            )
        finally:
            for s in ("centroids", "pq", "codes", "vectors"):
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_{s}")


if __name__ == "__main__":
    main()
