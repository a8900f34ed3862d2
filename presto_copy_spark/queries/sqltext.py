"""Registry queries implemented THROUGH the Presto-dialect SQL front end.

Each query here is Presto-spelled SQL text executed via ``Engine.sql``
(presto_copy_spark/engine.py -> dialect.py), proving the transpiler on
unit-first datetime functions, MySQL format strings, TRY(), UNNEST WITH
ORDINALITY, and Presto aggregate spellings — the deltas a user porting
reference SQL actually hits.

Reference: presto-parser/src/main/antlr4/.../SqlBase.g4 (the reference's
canonical entry is SQL text); golden files under
presto-product-tests/src/main/resources/sql-tests/testcases/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query


def _via_engine(presto_sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..engine import Engine

        return Engine(spark, sf_dir).sql(presto_sql)

    return run


# ---------------------------------------------------------------------------
# unit-first datetime + MySQL formats + TRY(CAST) — DateTimeFunctions.java
# ---------------------------------------------------------------------------
PRESTO_DATETIME = """
SELECT o_orderkey,
       date_add('day', 7, o_orderdate) AS due_ts,
       date_diff('day', o_orderdate, TIMESTAMP '1998-08-01 00:00:00') AS age_days,
       date_diff('month', o_orderdate, TIMESTAMP '1998-08-01 00:00:00') AS age_months,
       date_trunc('month', o_orderdate) AS order_month,
       date_format(o_orderdate, '%Y-%m-%d') AS order_day,
       day_of_week(o_orderdate) AS dow,
       TRY(CAST(o_orderpriority AS BIGINT)) AS prio_num
FROM orders
WHERE o_orderkey % 5 = 0
"""

_q = query(
    "sql_presto_datetime",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 7 DAY AS due_ts,
       date_diff('day', o_orderdate, TIMESTAMP '1998-08-01 00:00:00') AS age_days,
       -- Presto/Spark month diff is day-aware, truncating TOWARD ZERO;
       -- DuckDB's date_diff counts month-boundary crossings, so spell
       -- it out: whole-month delta, minus one for positive diffs that
       -- haven't completed the last month (end day 1 < start day; the
       -- negative-side correction can never fire with end day = 1)
       CAST((1998 - year(o_orderdate)) * 12 + (8 - month(o_orderdate))
            - CASE WHEN (1998 - year(o_orderdate)) * 12
                        + (8 - month(o_orderdate)) > 0
                    AND 1 < day(o_orderdate) THEN 1 ELSE 0 END AS BIGINT)
         AS age_months,
       date_trunc('month', o_orderdate) AS order_month,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(isodow(o_orderdate) AS INT) AS dow,
       TRY_CAST(o_orderpriority AS BIGINT) AS prio_num
FROM orders
WHERE o_orderkey % 5 = 0
""",
)(_via_engine(PRESTO_DATETIME))


# ---------------------------------------------------------------------------
# TRY(division) + UNNEST WITH ORDINALITY — TryFunction.java, SqlBase.g4
# ---------------------------------------------------------------------------
PRESTO_TRY_UNNEST = """
SELECT d.doc_id, w.word, w.pos,
       TRY(CAST(w.word AS BIGINT)) AS word_num,
       TRY(CAST(100 AS DOUBLE) / (w.pos - 1)) AS inv_prev
FROM documents d
CROSS JOIN UNNEST(split(d.text, ' ')) WITH ORDINALITY AS w(word, pos)
WHERE d.doc_id % 100 = 0
"""

_q = query(
    "sql_presto_try_unnest",
    # DuckDB zips multiple UNNESTs in one lateral projection; its double
    # division by zero yields NULL, same as Spark's try_divide.
    oracle="""
SELECT d.doc_id, u.word, u.pos,
       TRY_CAST(u.word AS BIGINT) AS word_num,
       CAST(100 AS DOUBLE) / (u.pos - 1) AS inv_prev
FROM documents d, LATERAL (
  SELECT UNNEST(string_split(d.text, ' ')) AS word,
         UNNEST(generate_series(1, len(string_split(d.text, ' ')))) AS pos
) u
WHERE d.doc_id % 100 = 0
""",
)(_via_engine(PRESTO_TRY_UNNEST))


# ---------------------------------------------------------------------------
# Presto aggregate spellings — BuiltInTypeAndFunctionNamespaceManager.java
# ---------------------------------------------------------------------------
PRESTO_AGGREGATES = """
SELECT l_returnflag,
       count(*) AS n,
       count_if(l_discount > 0.05) AS n_disc,
       round(variance(l_discount), 9) AS var_disc,
       round(stddev(l_quantity), 9) AS std_qty,
       array_join(array_sort(set_agg(l_linestatus)), ',') AS statuses,
       max_by(l_quantity, (l_orderkey * 8 + l_linenumber) * 64 + CAST(l_quantity AS BIGINT)) AS qty_of_max_key
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------------------
# CREATE VIEW DDL + query-through-view — SqlBase.g4 createView,
# CreateViewTask; logical view expanded at query time
# ---------------------------------------------------------------------------
PRESTO_VIEW_DDL = """
CREATE OR REPLACE VIEW v_order_age SECURITY INVOKER AS
SELECT o_orderkey, o_custkey, o_totalprice,
       date_diff('day', o_orderdate, TIMESTAMP '1998-08-01 00:00:00') AS age_days
FROM orders
WHERE o_orderkey % 3 = 0
"""

PRESTO_VIEW_QUERY = """
SELECT o_custkey % 10 AS bucket,
       count(*) AS n,
       min(age_days) AS min_age,
       max(age_days) AS max_age
FROM v_order_age
GROUP BY o_custkey % 10
"""


def _view_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql(PRESTO_VIEW_DDL)  # Presto-spelled DDL through the dialect shim
    return eng.sql(PRESTO_VIEW_QUERY)


_q = query(
    "sql_presto_view",
    oracle="""
SELECT o_custkey % 10 AS bucket,
       count(*) AS n,
       min(date_diff('day', o_orderdate, TIMESTAMP '1998-08-01 00:00:00')) AS min_age,
       max(date_diff('day', o_orderdate, TIMESTAMP '1998-08-01 00:00:00')) AS max_age
FROM orders
WHERE o_orderkey % 3 = 0
GROUP BY o_custkey % 10
""",
)(_view_roundtrip)


_q = query(
    "sql_presto_aggregates",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
       round(var_samp(l_discount), 9) AS var_disc,
       round(stddev_samp(l_quantity), 9) AS std_qty,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
       arg_max(l_quantity, (l_orderkey * 8 + l_linenumber) * 64 + CAST(l_quantity AS BIGINT)) AS qty_of_max_key
FROM lineitem
GROUP BY l_returnflag
""",
)(_via_engine(PRESTO_AGGREGATES))


# ---------------------------------------------------------------------------
# WITH RECURSIVE (SqlBase.g4:146) — iterative transitive traversal in
# pure SQL.  Spark 4 executes recursive CTEs natively (UnionLoop);
# the parent chain node -> floor(node/2) forms a binary tree over
# doc_ids, so every document walks to the root and the per-depth
# aggregate has one row per tree level — identical in DuckDB's
# recursive CTE implementation.
_RECURSIVE_SQL = """
WITH RECURSIVE walk(doc_id, node, depth) AS (
  SELECT doc_id, doc_id, CAST(0 AS INT) FROM documents
  UNION ALL
  SELECT w.doc_id, CAST(floor(w.node / 2.0) AS BIGINT), w.depth + 1
  FROM walk w WHERE w.node > 0
)
SELECT depth, count(*) AS n_nodes, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM walk GROUP BY depth
"""

query("sql_recursive_cte", oracle=_RECURSIVE_SQL)(_via_engine(_RECURSIVE_SQL))


# ---------------------------------------------------------------------------
# qdigest SQL-name surface through the dialect
# (QuantileDigestFunctions.java value_at_quantile / values_at_quantiles /
# quantile_at_value over qdigest_agg) — the KLL-backed digest model.
# ---------------------------------------------------------------------------
PRESTO_QDIGEST = """
SELECT c_mktsegment,
       value_at_quantile(qdigest_agg(c_acctbal), 0.5) AS med,
       value_at_quantile(qdigest_agg(c_acctbal), 0.9) AS p90,
       array_join(transform(values_at_quantiles(qdigest_agg(c_acctbal), ARRAY[0.25, 0.75]),
                            x -> cast(x AS VARCHAR)), ',') AS quartiles,
       quantile_at_value(qdigest_agg(c_acctbal), 1000.0) AS rank_1k,
       count(*) AS n
FROM customer
WHERE c_custkey % 97 = 0
GROUP BY c_mktsegment
"""

_q = query(
    "func_qdigest_quantile",
    # The KLL sketch stores values exactly below its compaction
    # threshold (k = 200), where get_quantile(q) is the ceil(q*n)-th
    # order statistic and get_rank(v) the inclusive fraction <= v — the
    # oracle spells those order statistics directly.  The % 97 filter
    # keeps every group under the exact-mode threshold at the
    # correctness SFs (measured: exact through n = 200); at larger SFs
    # the digest becomes approximate by design (bench only times it).
    oracle="""
SELECT c_mktsegment,
       list_sort(list(c_acctbal))[CAST(greatest(1, ceil(0.5 * count(*))) AS INT)] AS med,
       list_sort(list(c_acctbal))[CAST(greatest(1, ceil(0.9 * count(*))) AS INT)] AS p90,
       CAST(list_sort(list(c_acctbal))[CAST(greatest(1, ceil(0.25 * count(*))) AS INT)] AS VARCHAR)
         || ',' ||
       CAST(list_sort(list(c_acctbal))[CAST(greatest(1, ceil(0.75 * count(*))) AS INT)] AS VARCHAR)
         AS quartiles,
       CAST(sum(CASE WHEN c_acctbal <= 1000.0 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS rank_1k,
       CAST(count(*) AS BIGINT) AS n
FROM customer
WHERE c_custkey % 97 = 0
GROUP BY c_mktsegment
""",
)(_via_engine(PRESTO_QDIGEST))
