"""Core relational operator coverage (SURVEY §2.3, §2.6-2.8).

One query per operator family, each paired with a DuckDB oracle:
join types (inner/left/right/full/cross-theta/semi/anti), set
operations (UNION [ALL], INTERSECT [ALL], EXCEPT [ALL]), sort/limit/
offset, distinct+limit, VALUES, UNNEST (explode / posexplode), lateral
view, TABLESAMPLE (systematic variant for determinism), and subqueries
(scalar / IN / NOT IN / correlated EXISTS).

Reference operators cited per function.  All implementations are pure
DataFrame compositions — Catalyst picks broadcast vs shuffle join
(AQE), so each would execute identically on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import sql_hash60
from .qutil import exact_sum, sql_exact_sum
from .registry import query

TS = lambda s: F.expr(f"TIMESTAMP '{s}'")  # noqa: E731


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Joins (LookupJoinOperator family, reference operator/LookupJoinOperators.java:61-139)
# ---------------------------------------------------------------------------
@query(
    "join_inner",
    oracle="""
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain over broadcast dims."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS recent_orders
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join with residual ON-condition (probe-outer variant,
    reference operator/LookupJoinOperators.java:87)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderdate >= TS("2001-01-01")), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("recent_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS recent_orders
FROM orders RIGHT JOIN customer
  ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
GROUP BY c_custkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT join (lookup-outer variant, LookupJoinOperators.java:113)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, (c.c_custkey == o.o_custkey) & (o.o_orderdate >= TS("2001-01-01")), "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("recent_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cn.nk, sn.nk) AS nationkey, n_cust, n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated sides
    (LookupJoinOperators.java:139 + LookupOuterOperator.java:32)."""
    c = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    s = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("snk")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.nk == s.snk, "full").select(
        F.coalesce("nk", "snk").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_cross_theta",
    oracle="""
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a, region b
WHERE a.r_name < b.r_name
""",
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta filter (NestedLoopJoinOperator analogue,
    reference operator/NestedLoopJoinOperator.java:39)."""
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("r1") < F.col("r2"))


@query(
    "join_semi",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery -> left-semi (HashSemiJoinOperator.java:35)."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@query(
    "join_anti",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> null-aware anti join (reference rule
    CrossJoinWithArrayNotContainsToAntiJoin.java; keys non-null here)."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= TS("2001-01-01"))
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7; UnionNode/IntersectNode/ExceptNode)
# ---------------------------------------------------------------------------
@query(
    "setop_union_all",
    oracle="""
SELECT nk, count(*) AS n FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey AS nk FROM supplier
) t GROUP BY nk
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count("*").alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000.0
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT (reference lowers to union+group+filter,
    optimizations/ImplementIntersectAndExceptAsUnion.java:104; Spark
    plans a left-semi join natively)."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@query(
    "setop_intersect_all",
    oracle="""
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
INTERSECT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
EXCEPT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# Sort / limit / offset / distinct-limit (SURVEY §2.6)
# ---------------------------------------------------------------------------
@query(
    "sort_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 10
""",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit + offset (OrderByOperator.java:43,
    LimitOperator.java:23, OffsetNode/ImplementOffset rewrite).
    Spark plans TakeOrderedAndProject — no full-sort shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(50)
    )


@query(
    "distinct_limit",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def distinct_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (DistinctLimitOperator.java:40 analogue)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# VALUES / UNNEST / LATERAL (SURVEY §2.1 ValuesOperator, §2.8 UnnestOperator)
# ---------------------------------------------------------------------------
@query(
    "values_inline",
    oracle="""
SELECT t.r_name, t.bonus, r.r_regionkey
FROM (VALUES ('ASIA', 1.5), ('EUROPE', 2.0)) t(r_name, bonus)
JOIN region r ON r.r_name = t.r_name
""",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline literal table (ValuesOperator.java:27) joined to a scan."""
    vals = spark.createDataFrame(
        [Row(r_name="ASIA", bonus=1.5), Row(r_name="EUROPE", bonus=2.0)]
    )
    r = _t(spark, sf_dir, "region")
    return vals.join(r, "r_name").select(vals.r_name, "bonus", "r_regionkey")


@query(
    "unnest_explode",
    oracle="""
SELECT w.word, count(*) AS n
FROM documents, unnest(string_split(text, ' ')) AS w(word)
GROUP BY w.word
ORDER BY n DESC, w.word
LIMIT 20
""",
)
def unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST array column (UnnestOperator.java:47 -> explode)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "unnest_with_ordinality",
    oracle="""
SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS word
FROM documents, unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
WHERE doc_id < 10 AND i <= 5
""",
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (UnnestOperator ordinality channel ->
    posexplode; Presto grammar SqlBase.g4:329)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "word")
        .filter(F.col("pos") <= 5)
    )


@query(
    "lateral_view",
    oracle="""
SELECT lang, w.word, count(*) AS n
FROM documents, unnest(string_split(text, ' ')) AS w(word)
WHERE w.word IN ('spark', 'hash', 'join')
GROUP BY lang, w.word
""",
)
def lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated unnest keeping outer columns (LateralJoinNode)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").isin("spark", "hash", "join"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Sampling (SampleNode; grammar SqlBase.g4:309-315)
# ---------------------------------------------------------------------------
@query(
    "sample_systematic",
    oracle=f"""
SELECT {sql_exact_sum('l_extendedprice', 'sampled_revenue')}, count(*) AS n
FROM lineitem WHERE l_orderkey % 10 = 0
""",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (key mod N) — the reproducible
    stand-in for TABLESAMPLE BERNOULLI (ImplementBernoulliSampleAsFilter
    rewrites sampling to a filter exactly like this; random() is not
    cross-engine deterministic so the oracle uses the same filter)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return l.agg(
        exact_sum(F.col("l_extendedprice"), "sampled_revenue"),
        F.count("*").alias("n"),
    )


@query(
    "sample_bernoulli",
    # identical md5 hash-threshold on the row key, spelled in DuckDB
    # (operators/text.py sql_hash60 — the same cross-engine hash every
    # dedup/sampling oracle uses)
    oracle=f"""
SELECT count(*) AS n, {sql_exact_sum('l_quantity', 'sum_qty')}
FROM (
  SELECT l_quantity
  FROM lineitem
  WHERE ({sql_hash60("'bern42|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")} % 1000) < 100
) t
""",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI(10) as a seeded HASH-threshold filter — the
    deterministic twin of the reference's per-row coin flip
    (ImplementBernoulliSampleAsFilter rewrites BERNOULLI to
    `filter(rand() < p)`; this keeps the identical independent-per-row
    keep probability but draws the "coin" from md5(seed || row key), so
    the sample is reproducible across runs, partitionings, AND engines
    — the deviation from Presto is only that re-running with the same
    seed returns the same rows, which is the property a 100 TB pipeline
    actually wants).  Round 9: was a rows-only df.sample (engine PRNG);
    the hash form makes the last registry entry value-oracled."""
    from ..operators.text import hash60
    from .qutil import exact_sum

    l = _t(spark, sf_dir, "lineitem")
    key = F.concat(
        F.lit("bern42|"),
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        l.filter(hash60(key) % 1000 < 100)
        .agg(F.count("*").alias("n"), exact_sum(F.col("l_quantity"), "sum_qty"))
    )


# ---------------------------------------------------------------------------
# Subqueries (SURVEY §4.2 decorrelation rules)
# ---------------------------------------------------------------------------
@query(
    "subquery_scalar",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > 1.8 * (SELECT avg(p_retailprice) FROM part)
""",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (EnforceSingleRowOperator.java:27).

    avg() feeds a strict > comparison; fixture retail prices are well
    away from the 1.8x boundary so float ulp differences can't flip rows.
    """
    p = _t(spark, sf_dir, "part")
    avg_price = p.agg(F.avg("p_retailprice").alias("a"))
    return (
        p.join(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > 1.8 * F.col("a"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@query(
    "subquery_in",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN -> semi join
    (TransformUncorrelatedInPredicateSubqueryToSemiJoin.java:56)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "subquery_exists_correlated",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey
                AND l_shipdate > TIMESTAMP '2001-10-01')
""",
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TransformExistsApplyToLateralNode + semi join)."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > TS("2001-10-01"))
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Conditional expressions (SURVEY §2.2 FilterAndProjectOperator; TRY/TRY_CAST)
# ---------------------------------------------------------------------------
@query(
    "case_when_buckets",
    oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n,
       coalesce(nullif(min(o_orderstatus), 'F'), '-') AS status_probe
FROM orders
GROUP BY 1
""",
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF projection + agg."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.nullif(F.min("o_orderstatus"), F.lit("F")), F.lit("-")).alias(
                "status_probe"
            ),
        )
    )


@query(
    "try_cast_absorbs",
    oracle="""
SELECT count(*) AS n_rows,
       count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS n_numeric,
       count(TRY_CAST(o_orderstatus AS INTEGER)) AS n_bad
FROM orders
""",
)
def try_cast_absorbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST -> NULL on failure (TryCastFunction analogue)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count(F.substring("o_orderpriority", 1, 1).try_cast("int")).alias("n_numeric"),
        F.count(F.col("o_orderstatus").try_cast("int")).alias("n_bad"),
    )
