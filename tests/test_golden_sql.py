"""Golden-SQL corpus: the reference's own product-test SQL files run
through Engine.sql unmodified (VERDICT r1 item 4's acceptance bar).

Two tiers, both reading the literal ``.sql`` text from the reference
tree (skipped when it isn't mounted — the repo stays standalone):

- data-independent testcases (``select_no_from``, scalar-function
  probes): executed and compared cell-by-cell against the committed
  ``.result`` files (numeric tolerance; Presto prints decimals with
  trailing zeros, Spark prints the double — same value).
- fixture-compatible TPC-H goldens (``hive_tpch`` q01/q06 — the ones
  whose columns all exist in the driver fixtures): executed at sf0.001
  and value-checked against DuckDB running the equivalent SQL.

Reference: presto-product-tests/src/main/resources/sql-tests/testcases
(372 .sql files; runner SqlTests.java / convention-based tests).
"""

from __future__ import annotations

import os
import re

import pytest

TESTCASES = "/root/reference/presto-product-tests/src/main/resources/sql-tests/testcases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTCASES), reason="reference testcase corpus not mounted"
)

# Data-independent goldens: (relative sql path) -> compared to .result.
NO_FROM_CASES = [
    "select_no_from/projectAggFuncs",
    "select_no_from/projectConstants",
    "select_no_from/projectFunctions",
    "select_no_from/withGroupOrderHaving",
    "select_no_from/withUnionAll",
    "select_no_from/withWhereClause",
    "select_no_from/withWhereFalse",
    "math_functions/checkMathOperatorsAccessible",
    "horology_functions/extractAccessible",
    "convertion_functions/castAccessible",
    "convertion_functions/tryCastAccessible",
    "map_functions/mapRetrieveOperatorWorks",
]

# Fixture-compatible TPC-H goldens (every referenced column exists in the
# driver fixtures); value-checked against DuckDB on the same parquet.
# q05/q07/q08 return 0 rows at sf0.001 (their region/nation literals
# don't exist in the synthetic fixtures) — still a full parse/plan/
# execute equivalence check; q01/q06/q14/q18 carry real rows.
TPCH_CASES = [
    "hive_tpch/q01",
    "hive_tpch/q05",
    "hive_tpch/q06",
    "hive_tpch/q07",
    "hive_tpch/q08",
    "hive_tpch/q14",
    "hive_tpch/q18",
]


def _read_sql(rel: str) -> str:
    with open(os.path.join(TESTCASES, rel + ".sql")) as f:
        text = f.read()
    return "\n".join(
        line for line in text.splitlines() if not line.lstrip().startswith("--")
    ).strip()


def _read_result(rel: str) -> list[list[str]]:
    with open(os.path.join(TESTCASES, rel + ".result")) as f:
        lines = [
            line
            for line in f.read().splitlines()
            if line.strip() and not line.lstrip().startswith("--")
        ]
    rows = []
    for line in lines:
        cells = [c.strip() for c in line.split("|")]
        if cells and cells[-1] == "":  # trailing delimiter
            cells = cells[:-1]
        rows.append(cells)
    return rows


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, str) and v.lower() == "null"):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    try:
        f = float(v)
        return f"{f:.6g}"
    except (TypeError, ValueError):
        return str(v)


def _canon_rows(rows) -> list[tuple]:
    return sorted(tuple(_canon_cell(c) for c in r) for r in rows)


@pytest.mark.parametrize("rel", NO_FROM_CASES)
def test_golden_no_from(spark, rel):
    from presto_copy_spark.engine import Engine

    out = spark.sql(Engine.transpile(_read_sql(rel))).collect()
    got = _canon_rows([list(r) for r in out])
    want = _canon_rows(_read_result(rel))
    assert got == want, f"{rel}: {got} != {want}"


@pytest.mark.parametrize("rel", TPCH_CASES)
def test_golden_tpch_vs_duckdb(spark, rel):
    import duckdb

    from presto_copy_spark.catalog import register_tables
    from presto_copy_spark.engine import Engine

    sf_dir = "/root/testdata/sf0.001"
    register_tables(spark, sf_dir)
    text = _read_sql(rel)
    got = spark.sql(Engine.transpile(text)).toPandas()

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # DuckDB lacks Presto's typed decimal literal; inline the value.
    duck_text = re.sub(r"(?i)decimal\s+'([^']*)'", r"\1", text)
    want = con.sql(duck_text).df()

    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == [c.lower() for c in want.columns]
    g = _canon_rows(got.itertuples(index=False, name=None))
    w = _canon_rows(want.itertuples(index=False, name=None))
    assert g == w, f"{rel}: first diff {next(((a, b) for a, b in zip(g, w) if a != b), None)}"


# Empty-table semantics goldens: aggregates over zero rows (count=0,
# sum/min/max=NULL, GROUP BY emits nothing, scalar projections emit
# nothing) — the edge the reference dedicates a whole testcase dir to.
EMPTY_CASES = [
    "empty_table/countDistinctOnNonPartitioningKey",
    "empty_table/countDistinctOnPartitioningKey",
    "empty_table/minMaxHasRows",
    "empty_table/multiplyOperator",
    "empty_table/runAggrOnColumnWithGroupBy",
    "empty_table/runAggrOnStarWithGroupBy",
    "empty_table/runAggrWithoutGroupBy",
    "empty_table/scalarOnColumn",
    "empty_table/selectCountStar",
    "empty_table/selectStar",
    "empty_table/sumOnSubq",
]


@pytest.mark.parametrize("rel", EMPTY_CASES)
def test_golden_empty_table(spark, rel):
    from presto_copy_spark.engine import Engine

    spark.createDataFrame([], "c1 int, c2 string").createOrReplaceTempView("empty")
    out = spark.sql(Engine.transpile(_read_sql(rel))).collect()
    got = _canon_rows([list(r) for r in out])
    want = _canon_rows(_read_result(rel))
    assert got == want, f"{rel}: {got} != {want}"


# aggregate/ testcases run against the `datatype` table their headers
# declare; the product-tests' table isn't shipped, so both engines get
# an IDENTICAL synthesized one (deterministic expressions over
# range(100), incl. NULLs) and Spark is compared to DuckDB executing
# the same literal SQL.  skewness/kurtosis are excluded: Spark returns
# population moments, DuckDB sample-corrected — a documented semantic
# delta (COVERAGE.md §2.4), not a dialect failure.
AGGREGATE_CASES = [
    "aggregate/aggregateOverFunction",
    "aggregate/average",
    "aggregate/averageDistinct",
    "aggregate/count",
    "aggregate/countDistinct",
    "aggregate/max",
    "aggregate/min",
    "aggregate/mixAggregate",
    "aggregate/stddev_pop",
    "aggregate/stddev_popDistinct",
    "aggregate/stddev_samp",
    "aggregate/stddev_sampDistinct",
    "aggregate/sum",
    "aggregate/sumDistinct",
    "aggregate/var_pop",
    "aggregate/var_popDistinct",
    "aggregate/var_samp",
    "aggregate/var_sampDistinct",
    "aggregate/variance",
    "aggregate/varianceDistinct",
]


def _register_datatype(spark):
    spark.range(100).selectExpr(
        "(id*37) % 83 AS c_bigint",
        "CASE WHEN id % 17 = 0 THEN NULL ELSE CAST((id*7) % 19 AS DOUBLE)/4 END AS c_double",
        "CASE WHEN id % 23 = 0 THEN NULL ELSE concat('s', id % 13) END AS c_string",
        "date_add(DATE '2024-01-01', CAST(id % 30 AS INT)) AS c_date",
        "TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,CAST(id % 50 AS INT),0) AS c_timestamp",
        "id % 3 = 0 AS c_boolean",
    ).createOrReplaceTempView("datatype")


_DUCK_DATATYPE = """
CREATE OR REPLACE VIEW datatype AS
SELECT (i*37) % 83 AS c_bigint,
       CASE WHEN i % 17 = 0 THEN NULL ELSE ((i*7) % 19)::DOUBLE/4 END AS c_double,
       CASE WHEN i % 23 = 0 THEN NULL ELSE 's' || (i % 13) END AS c_string,
       DATE '2024-01-01' + ((i % 30))::INT AS c_date,
       TIMESTAMP '2024-01-01 00:00:00' + to_minutes(i % 50) AS c_timestamp,
       i % 3 = 0 AS c_boolean
FROM range(100) t(i)
"""


@pytest.mark.parametrize("rel", AGGREGATE_CASES)
def test_golden_aggregate_vs_duckdb(spark, rel):
    import duckdb

    from presto_copy_spark.engine import Engine

    _register_datatype(spark)
    text = _read_sql(rel)
    got = [list(r) for r in spark.sql(Engine.transpile(text)).collect()]

    con = duckdb.connect()
    con.sql(_DUCK_DATATYPE)
    want = [list(r) for r in con.sql(text).fetchall()]
    assert _canon_rows(got) == _canon_rows(want), (rel, got, want)
