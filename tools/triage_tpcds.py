#!/usr/bin/env python
"""Triage the reference's 103 tpcds golden queries: transpile + run on
Spark vs DuckDB over the synthetic TPC-DS fixtures
(tests/tpcds_fixtures.py), report per-query status so passing cases can
be baked into tests/test_golden_sql.py and failures become dialect work
items."""
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

TESTCASES = "/root/reference/presto-product-tests/src/main/resources/sql-tests/testcases"


def canon_cell(v):
    if v is None or (isinstance(v, str) and v.lower() == "null"):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    try:
        f = float(v)
        return f"{f:.6g}"
    except (TypeError, ValueError):
        return str(v)


def canon_rows(rows):
    return sorted(tuple(canon_cell(c) for c in r) for r in rows)


def main():
    import glob

    import duckdb

    import tpcds_fixtures as fx
    from presto_copy_spark.engine import Engine
    from presto_copy_spark.session import get_spark

    spark = get_spark("tpcds-triage")
    fx.register_spark(spark)
    con = duckdb.connect()
    fx.register_duckdb(con)

    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    results = {}
    for path in sorted(glob.glob(os.path.join(TESTCASES, "tpcds", "*.sql"))):
        rel = os.path.basename(path)[:-4]
        if only and rel not in only:
            continue
        with open(path) as f:
            text = "\n".join(
                line for line in f.read().splitlines()
                if not line.lstrip().startswith("--")
            ).strip().rstrip(";")
        try:
            sql = Engine.transpile(text)
        except Exception as e:
            results[rel] = f"TRANSPILE: {type(e).__name__}: {e}"
            continue
        try:
            got = canon_rows([list(r) for r in spark.sql(sql).collect()])
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            results[rel] = f"SPARK: {type(e).__name__}: {msg}"
            continue
        duck_text = re.sub(r"(?i)decimal\s+'([^']*)'", r"\1", text)
        try:
            want = canon_rows([list(r) for r in con.sql(duck_text).fetchall()])
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            results[rel] = f"DUCK: {type(e).__name__}: {msg}"
            continue
        if got == want:
            results[rel] = f"PASS ({len(got)} rows)"
        else:
            diff = next(((a, b) for a, b in zip(got, want) if a != b), ("len", (len(got), len(want))))
            results[rel] = f"MISMATCH: {str(diff)[:200]}"
    npass = sum(1 for v in results.values() if v.startswith("PASS"))
    for k, v in sorted(results.items()):
        print(f"{k}: {v}")
    print(f"\n{npass}/{len(results)} pass")


if __name__ == "__main__":
    main()
