"""Per-stage time breakdown via SparkStatusTracker (UI is disabled, so
this is the guide §1.1 'which stage is slow' loop for this sandbox).

    >>> from tools.r15_stage_profile import stage_profile
    >>> stage_profile(spark, df)

Runs one noop save and prints each completed stage of the jobs it
triggered: task count, total task time, wall span, and the stage name
(operator scope).
"""

from __future__ import annotations

import time


def stage_profile(spark, df, label="query"):
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = set(tracker.getJobIdsForGroup(None) or [])
    jobs = sorted(after - before)
    print(f"{label}: wall {wall:.3f}s, {len(jobs)} job(s)")
    wanted = set()
    for jid in jobs:
        jinfo = tracker.getJobInfo(jid)
        if jinfo is not None:
            wanted.update(jinfo.stageIds)
    store = jsc.statusStore()
    gw = sc._gateway
    statuses = gw.jvm.java.util.ArrayList()
    task_statuses = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    sl = store.stageList(statuses, False, False, quantiles, task_statuses)
    n = sl.size()
    rows = []
    for i in range(n):
        s = sl.apply(i)
        sid = s.stageId()
        if sid not in wanted:
            continue
        nt = s.numCompleteTasks()
        rt = (s.executorRunTime() or 0) / 1000.0
        cpu = (s.executorCpuTime() or 0) / 1e9
        srd = (s.shuffleFetchWaitTime() or 0) / 1000.0
        name = (s.name() or "")[:70]
        rows.append((sid, nt, rt, cpu, srd, name))
    for sid, nt, rt, cpu, srd, name in sorted(rows):
        print(
            f"  stage {sid}: tasks {nt}, run {rt:.3f}s, cpu {cpu:.3f}s,"
            f" fetchwait {srd:.3f}s  {name}"
        )
