#!/usr/bin/env python
"""Mechanical function-name coverage sweep (COVERAGE.md §name sweeps).

Extracts every @ScalarFunction / @AggregationFunction name from the
reference's presto-main (both the named form `@ScalarFunction("foo")`
and the bare form, which uses the annotated method's name), then
resolves each against this engine's SHOW FUNCTIONS + dialect rewrites.

Run:  python tools/name_sweep.py
"""

from __future__ import annotations

import glob
import re

REF = "/root/reference/presto-main/src/main/java"

_NAMED = re.compile(
    r'@(ScalarFunction|AggregationFunction)\s*\(\s*(?:value\s*=\s*)?"([a-zA-Z0-9_$]+)"'
)
# bare annotation: names come from the next method declaration
_BARE = re.compile(
    r"@(ScalarFunction|AggregationFunction)\s*(?:\([^)\"]*\))?\s*\n"
    r"(?:\s*@[A-Za-z].*\n)*?\s*(?:public|private|protected)?\s*static\s+"
    r"[\w<>,.\[\]? ]+\s+(\w+)\s*\(",
    re.MULTILINE,
)

# camelCase method name -> snake_case SQL name (the reference's
# convention for bare annotations)
def _snake(name: str) -> str:
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


def extract() -> tuple[set[str], set[str]]:
    scalars: set[str] = set()
    aggs: set[str] = set()
    for path in glob.glob(REF + "/**/*.java", recursive=True):
        src = open(path, encoding="utf-8", errors="ignore").read()
        for kind, name in _NAMED.findall(src):
            (scalars if kind == "ScalarFunction" else aggs).add(name.lower())
        for kind, meth in _BARE.findall(src):
            (scalars if kind == "ScalarFunction" else aggs).add(_snake(meth))
    return scalars, aggs


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from presto_copy_spark import dialect
    from presto_copy_spark.functions import register_all
    from presto_copy_spark.session import get_spark

    scalars, aggs = extract()
    spark = get_spark()
    register_all(spark)
    shown = {
        r.function.split(".")[-1].lower()
        for r in spark.sql("SHOW FUNCTIONS").collect()
    }

    def resolves(n: str) -> bool:
        if n in shown:
            return True
        probes = [
            "x", "x, y", "x, y, z", "x, y, z, w",
            "x, ARRAY[0.5]",  # vector accessors want literal arrays
            "x, 2",           # literal-int arity-2 (combinations, ...)
            "5, x, y", "5, x, y, w",  # classification_* literal buckets
            "x, '%Y'",        # literal-format datetime rewrites
            # differential_entropy fixed_histogram_mle literal form
            "8, x, w, 'fixed_histogram_mle', 0.0, 1.0",
            # spatial_partitions planner-literal KdbTree form (round 8)
            'CAST(\'{"root":{"extent":{"xMin":0,"yMin":0,"xMax":1,'
            '"yMax":1},"leafId":0}}\' AS KDBTREE), x',
        ]
        for p in probes:
            try:
                t = dialect.transpile(f"SELECT {n}({p}) FROM t")
                if f"{n}(" not in t.lower():
                    return True
            except Exception:
                continue
        return False

    s_missing = [n for n in sorted(scalars) if not resolves(n)]
    a_missing = [n for n in sorted(aggs) if not resolves(n)]
    print(f"scalar: {len(scalars) - len(s_missing)}/{len(scalars)}")
    print("scalar missing:", s_missing)
    print(f"aggregate: {len(aggs) - len(a_missing)}/{len(aggs)}")
    print("aggregate missing:", a_missing)


if __name__ == "__main__":
    main()
