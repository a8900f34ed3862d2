#!/usr/bin/env python
"""Round-14 paired sf10x events reads (VERDICT r13 Wrong #1 / ask #2).

events_tumbling's committed 5.1x rode on a DuckDB denominator that
moved 5x across the day's windows.  This script runs ONE certified
window: canary first, then Spark current plan / Spark pre-agg
candidate / DuckDB oracle, 3 runs each, medians — run it 3+ times
across the session and publish the band.  events_json_props rides
along to price the round-14 exactly-once regex guard in the same
windows (its 0.68 s / 4.0x r13 read predates the guard).

The candidate plan (ask #2): pre-aggregate once to (window, type,
user) grain — count/cents partials combine map-side — then the final
(window, type) agg gets n_users as a plain count of the pre-agg rows;
ONE un-expanded data-sized shuffle instead of Expand(2x rows) feeding
the distinct-agg shuffle.

Usage: python tools/r14_events_windows.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LDIR = "/tmp/spark_graft_scale/sf10x"


def tumbling_preagg(spark, sf_dir):
    from pyspark.sql import functions as F

    from presto_copy_spark.queries.events import _cents_sum, _events

    e = _events(spark, sf_dir)
    g1 = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).agg(F.count(F.lit(1)).alias("n"), _cents_sum().alias("c"))
    return (
        g1.groupBy("w", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum("c").alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value_cents",
        )
    )


def main() -> None:
    import duckdb

    from presto_copy_spark.queries import registry
    from presto_copy_spark.session import default_parallelism, get_spark

    registry.load_all()
    spark = get_spark(
        "r14-events", shuffle_partitions=default_parallelism()
    )
    from bench import _canary_gate

    gate = _canary_gate(spark)
    print(f"canary: {gate['final_sec']}s in_band={gate['in_band']}")

    cur = registry.QUERIES["events_tumbling"](spark, LDIR)
    cand = tumbling_preagg(spark, LDIR)
    # candidate must agree before it may be priced
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, cand.collect()))
    assert a == b, "candidate disagrees with current plan"

    jp = registry.QUERIES["events_json_props"](spark, LDIR)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{LDIR}/events.parquet/*.parquet'"
    )

    def spark_med(df):
        df.write.format("noop").mode("overwrite").save()
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s.append(time.perf_counter() - t0)
        return statistics.median(s)

    def duck_med(q):
        con.sql(registry.ORACLES[q]).fetchall()
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(registry.ORACLES[q]).fetchall()
            s.append(time.perf_counter() - t0)
        return statistics.median(s)

    rows = [
        ("tumbling current", spark_med(cur)),
        ("tumbling pre-agg cand", spark_med(cand)),
        ("tumbling duckdb", duck_med("events_tumbling")),
        ("json_props spark", spark_med(jp)),
        ("json_props duckdb", duck_med("events_json_props")),
    ]
    for name, v in rows:
        print(f"| {name} | {v:.3f} |")
    d = dict(rows)
    print(
        f"ratios: current {d['tumbling current'] / d['tumbling duckdb']:.1f}x"
        f"  candidate {d['tumbling pre-agg cand'] / d['tumbling duckdb']:.1f}x"
        f"  json_props {d['json_props spark'] / d['json_props duckdb']:.1f}x"
    )


if __name__ == "__main__":
    main()
