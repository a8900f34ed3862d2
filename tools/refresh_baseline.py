#!/usr/bin/env python
"""Regenerate BASELINE.md's per-query DuckDB table.

Runs the literal ``oracle_sql()`` of every registered query on DuckDB
(same parquet fixtures, 32 threads, full ``fetchall()`` materialization)
and rewrites the measured-baseline section of BASELINE.md in place.
Run whenever oracles change.

Round-9 protocol parity (ADVICE r9): the SAME three-passes-of-three,
best-pass-median estimator bench.py uses for Spark, INCLUDING the
burst-retry 4th pass for any query whose pass medians disagree >30%
after the main three (previously bench.py-only, which gave the Spark
column a one-sided extra min() sample) — so the two columns of the
ratio are drawn from identical statistics.
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASELINE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md")


def main() -> None:
    import duckdb

    from presto_copy_spark.catalog import TABLES
    from presto_copy_spark.queries import registry

    registry.load_all()

    # Same clean-window certification as bench.py (VERDICT r11 ask #5):
    # the round-11 +5% denominator drift showed the DuckDB table could
    # be refreshed in a window the Spark numerator would refuse to
    # measure in.  Symmetric protocol: run the identical Spark canary
    # before timing anything, and record its trace in the refresh note.
    from bench import _canary_gate
    from presto_copy_spark.session import get_spark

    gate = _canary_gate(get_spark("refresh-baseline-canary"))
    print(
        f"canary: final {gate['final_sec']}s in_band={gate['in_band']}"
        f" attempts={len(gate['attempts'])}",
        file=sys.stderr,
    )

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # Denominator symmetry (round 15, VERDICT r14 Wrong #2): rows whose
    # Spark timed region scores/probes against a prebuilt model get a
    # score-only timed SQL — the builder trains UNTIMED (the analogue
    # of Spark's DataFrame-build-time training) and returns the SQL
    # measuring only the work bench.py times.  ORACLES stays the
    # train-inclusive correctness SQL.
    timed_sql: dict[str, str] = dict(registry.ORACLES)
    symmetric_rows = []
    for name, builder in registry.BENCH_ORACLE_BUILDERS.items():
        if name in timed_sql:
            timed_sql[name] = builder(con)
            symmetric_rows.append(name)
    if symmetric_rows:
        print(f"score-only denominators: {sorted(symmetric_rows)}", file=sys.stderr)

    pass_samples: dict[str, list[float]] = {n: [] for n in registry.ORACLES}
    for pass_i in range(3):
        for name in sorted(registry.ORACLES):
            sql = timed_sql[name]
            if pass_i == 0:
                con.sql(sql).fetchall()  # warm
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            pass_samples[name].append(statistics.median(samples))

    # Burst-retry pass — identical to bench.py's (ADVICE r9): a query
    # whose pass medians still disagree >30% gets one more pass so the
    # recorded min comes from a clean window, on BOTH ratio columns.
    retried = []
    for name in sorted(registry.ORACLES):
        meds = pass_samples[name]
        if meds and min(meds) > 0 and max(meds) / min(meds) > 1.3:
            sql = timed_sql[name]
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            pass_samples[name].append(statistics.median(samples))
            retried.append(name)
    if retried:
        print(f"burst-retried: {retried}", file=sys.stderr)

    timings = {
        n: round(min(meds), 4) for n, meds in sorted(pass_samples.items())
    }
    for name, v in timings.items():
        print(f"{name}: {v}", file=sys.stderr)

    # bench headline subset = what bench.py runs AND has an oracle
    bench_prefixes = ("tpch_", "win", "events", "dedup", "text", "sim", "func", "multimodal")
    bench_subset = {
        n: v
        for n, v in timings.items()
        if n.startswith("tpch_") or n.split("_")[0] in ("win", "events", "dedup", "text", "sim", "func", "multimodal")
    }

    lines = ["| query | duckdb sec |", "|---|---|"]
    lines += [f"| {n} | {v} |" for n, v in sorted(timings.items())]
    lines.append(f"| **total (all {len(timings)})** | **{round(sum(timings.values()), 3)}** |")
    lines.append(
        f"| **total (bench headline subset with oracles, {len(bench_subset)} queries)** "
        f"| **{round(sum(bench_subset.values()), 3)}** |"
    )
    table = "\n".join(lines)

    sym = (
        f"  Score-only (model prebuilt untimed) denominators:"
        f" {sorted(symmetric_rows)}."
        if symmetric_rows
        else ""
    )
    note = (
        f"Refresh note: {time.strftime('%Y-%m-%d %H:%M')} local — canary"
        f" {gate['final_sec']} s (ref {gate['ref_sec']}, band"
        f" {gate['band']}x, in_band={gate['in_band']},"
        f" attempts={len(gate['attempts'])}); numbers below measured"
        f" only in this certified window.{sym}\n\n"
    )
    src = open(BASELINE).read()
    start = src.index("| query | duckdb sec |")
    end = src.index("\n\n", src.index("total (bench headline subset"))
    head = src[:start]
    m = re.search(r"Refresh note: [^\n]*\n\n$", head, re.DOTALL)
    if m:
        head = head[: m.start()]
    # keep the prose count in sync with the actual row count (ADVICE
    # r12: the "All N oracle queries" line drifted every round)
    head = re.sub(
        r"All \d+ oracle queries, seconds:",
        f"All {len(timings)} oracle queries, seconds:",
        head,
    )
    open(BASELINE, "w").write(head + note + table + src[end:])
    print("BASELINE.md table refreshed", file=sys.stderr)


if __name__ == "__main__":
    main()
