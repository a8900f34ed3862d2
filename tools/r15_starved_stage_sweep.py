"""Round-15 sweep: find heavy LOW-PARALLELISM stages across every bench
query (the defect class the stage profiles exposed in
geo_kdb_partition_join and the multimodal codec rows).

For each registry bench query: one prewarm + one profiled run; flag any
stage with <= 2 tasks and > 80 ms of task run time (a single-threaded
hot spot on a 32-core host), and any stage whose run time is > 3x its
CPU time with > 0.3 s run (wait-dominated).

Usage inside the perf_iter REPL:
    >>> from tools.r15_starved_stage_sweep import sweep
    >>> sweep(spark, build, registry)
"""

from __future__ import annotations

import time


def sweep(spark, build, registry, names=None):
    from presto_copy_spark.streaming.jobs import BATCH_PARITY

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    tracker = sc.statusTracker()
    gw = sc._gateway

    if names is None:
        names = [n for n in sorted(registry.QUERIES) if n.startswith("tpch_")]
        for extra in sorted(registry.QUERIES):
            if not extra.startswith("tpch_") and extra.split("_")[0] in (
                "win", "events", "dedup", "text", "sim", "func", "ml",
                "multimodal", "geo", "docs", "pii",
            ):
                names.append(extra)

    flags = []
    for name in names:
        try:
            fn = BATCH_PARITY.get(name) or registry.QUERIES[name]
            df = fn(spark, "/root/testdata/sf0.1")
            df.write.format("noop").mode("overwrite").save()  # prewarm
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            after = set(tracker.getJobIdsForGroup(None) or [])
            wanted = set()
            for jid in sorted(after - before):
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    wanted.update(ji.stageIds)
            store = jsc.statusStore()
            statuses = gw.jvm.java.util.ArrayList()
            tstat = gw.jvm.java.util.ArrayList()
            quant = gw.new_array(gw.jvm.double, 0)
            sl = store.stageList(statuses, False, False, quant, tstat)
            for i in range(sl.size()):
                s = sl.apply(i)
                if s.stageId() not in wanted:
                    continue
                nt = s.numCompleteTasks()
                rt = (s.executorRunTime() or 0) / 1000.0
                cpu = (s.executorCpuTime() or 0) / 1e9
                if nt and nt <= 2 and rt > 0.08:
                    flags.append((name, s.stageId(), nt, rt, cpu, wall, "starved"))
                    print(f"FLAG starved {name}: stage {s.stageId()} tasks {nt} run {rt:.3f} cpu {cpu:.3f} wall {wall:.3f}")
                elif rt > 0.3 and cpu > 0 and rt / cpu > 3:
                    flags.append((name, s.stageId(), nt, rt, cpu, wall, "waity"))
                    print(f"FLAG waity   {name}: stage {s.stageId()} tasks {nt} run {rt:.3f} cpu {cpu:.3f} wall {wall:.3f}")
        except Exception as e:
            print(f"SKIP {name}: {e}")
    print(f"done: {len(flags)} flags")
    return flags
