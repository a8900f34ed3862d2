"""Interactive perf-iteration helpers: keep one warm JVM in a REPL and
re-time individual registry queries after editing their modules.

Usage (inside `python -i tools/perf_iter.py` or a tmux REPL):

    >>> t("tpch_q21")            # 1 prewarm + 3 timed runs, prints median
    >>> t("tpch_q21", runs=5)
    >>> r()                      # reload all query modules after an edit
    >>> ex("tpch_q21")           # formatted explain
    >>> jobs("tpch_q21")         # count Spark jobs triggered by one run

The bench protocol itself lives in bench.py; this is only the editing
feedback loop (VERDICT r8 ask #1: stage-count reduction needs fast
job-count visibility).
"""

from __future__ import annotations

import importlib
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from presto_copy_spark.functions import register_all  # noqa: E402
from presto_copy_spark.queries import registry  # noqa: E402
from presto_copy_spark.session import get_spark  # noqa: E402

registry.load_all()
spark = get_spark("perf-iter")
register_all(spark)

SF_DIR = "/root/testdata/sf0.1"

_QUERY_MODULES = [
    "presto_copy_spark.operators.aggregates",
    "presto_copy_spark.operators.ann_index",
    "presto_copy_spark.operators.incremental",
    "presto_copy_spark.operators.join",
    "presto_copy_spark.operators.ml",
    "presto_copy_spark.operators.multimodal",
    "presto_copy_spark.operators.similarity",
    "presto_copy_spark.operators.spatial",
    "presto_copy_spark.operators.text",
    "presto_copy_spark.queries.qutil",
    "presto_copy_spark.queries.aggregates",
    "presto_copy_spark.queries.events",
    "presto_copy_spark.queries.functions_sql",
    "presto_copy_spark.queries.geo",
    "presto_copy_spark.queries.ml",
    "presto_copy_spark.queries.multimodal",
    "presto_copy_spark.queries.pipeline",
    "presto_copy_spark.queries.relational",
    "presto_copy_spark.queries.similarity",
    "presto_copy_spark.queries.sqltext",
    "presto_copy_spark.queries.text",
    "presto_copy_spark.queries.tpch",
    "presto_copy_spark.queries.tpch_extra",
    "presto_copy_spark.queries.windows",
]


def r() -> None:
    """Reload every query module (after an on-disk edit)."""
    for mod in _QUERY_MODULES:
        if mod in sys.modules:
            importlib.reload(sys.modules[mod])


def build(name: str):
    return registry.QUERIES[name](spark, SF_DIR)


def t(name: str, runs: int = 3, prewarm: int = 1) -> float:
    df = build(name)
    for _ in range(prewarm):
        df.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    med = statistics.median(samples)
    print(f"{name}: median {med:.3f}s  samples {[round(s, 3) for s in samples]}")
    return med


def ex(name: str) -> None:
    build(name).explain("formatted")


def jobs(name: str) -> int:
    """Number of Spark jobs one execution triggers (stage-count proxy)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    df = build(name)
    df.write.format("noop").mode("overwrite").save()  # build-time jobs out
    before = set(tracker.getJobIdsForGroup(None) or [])
    df.write.format("noop").mode("overwrite").save()
    after = set(tracker.getJobIdsForGroup(None) or [])
    n = len(after - before)
    print(f"{name}: {n} jobs")
    return n


if __name__ == "__main__":
    print("perf_iter ready: t(name), r(), ex(name), jobs(name)")
