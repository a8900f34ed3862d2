"""Paired in-window A/B helper for the perf_iter REPL.

    >>> from tools.r15_ab import ab
    >>> ab(df_current, df_variant, rounds=5)

Alternates A,B,A,B,... within the same host window (the repo's paired
protocol) and prints per-round pairs + medians, so co-tenant bursts hit
both arms equally.
"""

from __future__ import annotations

import statistics
import time


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(a, b, rounds: int = 5, label_a: str = "A", label_b: str = "B"):
    _run(a)
    _run(b)  # prewarm both
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(_run(a))
        tb.append(_run(b))
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(f"{label_a}: median {ma:.3f}s  {[round(x, 3) for x in ta]}")
    print(f"{label_b}: median {mb:.3f}s  {[round(x, 3) for x in tb]}")
    print(f"ratio {label_b}/{label_a} = {mb / ma:.3f}")
    return ma, mb
