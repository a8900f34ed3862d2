#!/usr/bin/env python
"""Round-14 A/B: Bloom pre-filter on the persisted prior-index probe.

VERDICT r13 ask #7: the batch/stream probes shuffle every new-dump row
to the exact join; a broadcast Bloom of the prior fps should cut that
shuffle to candidate mass only.  Keep only on evidence — this measures
``dedup_against_prior`` with and without the filter, paired in one
window (3 runs each, interleaved, medians), on the persisted-index
layouts the round-13 probe-vs-inline A/B used.

Usage: python tools/r14_bloom_ab.py [sf1x sf3x sf10x]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = "/tmp/spark_graft_scale"


def main() -> None:
    layouts = sys.argv[1:] or ["sf1x", "sf3x", "sf10x"]

    from presto_copy_spark.operators.incremental import (
        dedup_against_prior,
        persist_prior_index,
    )
    from presto_copy_spark.queries.text import inc_snapshots
    from presto_copy_spark.session import default_parallelism, get_spark

    spark = get_spark(
        "r14-bloom-ab", shuffle_partitions=default_parallelism()
    )
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    print("| layout | probe no-bloom | probe bloom | bloom/no-bloom |")
    print("|---|---|---|---|")
    for lname in layouts:
        ldir = f"{SCALE}/{lname}"
        prior, newc = inc_snapshots(spark, ldir)
        prefix = f"r14ab_{lname}"
        t0 = time.time()
        persist_prior_index(spark, prior, prefix)
        build_s = time.time() - t0
        try:
            samples: dict[bool, list[float]] = {True: [], False: []}
            for use_bloom in (True, False):  # warm both plans
                dedup_against_prior(
                    spark, newc, prefix, use_bloom=use_bloom
                ).write.format("noop").mode("overwrite").save()
            for _ in range(3):
                for use_bloom in (False, True):
                    t0 = time.time()
                    dedup_against_prior(
                        spark, newc, prefix, use_bloom=use_bloom
                    ).write.format("noop").mode("overwrite").save()
                    samples[use_bloom].append(time.time() - t0)
            nb = statistics.median(samples[False])
            wb = statistics.median(samples[True])
            print(
                f"| {lname} | {nb:.3f} | {wb:.3f} | {wb / nb:.2f}x |"
                f"  (index build {build_s:.1f}s)"
            )
        finally:
            for t in (f"{prefix}_fp", f"{prefix}_bands", f"{prefix}_bloom"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
