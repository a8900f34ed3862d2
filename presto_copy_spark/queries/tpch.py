"""TPC-H-derived queries over the driver fixtures (SURVEY §6, BASELINE.md).

Reference SQL: /root/reference/presto-benchto-benchmarks/src/main/
resources/sql/presto/tpch/q01.sql .. q22.sql — adapted to the fixture
schema (FIXTURES.md: no commitdate/receiptdate/shipmode/partsupp; dates
are timestamps).

Scale design notes (100 TB):
- lineitem is the fact table: every query keeps filters *before* joins
  so Catalyst pushes them into the parquet scan (PushedFilters).
- dimension joins (region/nation/supplier/part/customer) are broadcast —
  explicitly for the tiny dims, via AQE for the mid-size ones.
- aggregates are expressed on DataFrames so Spark plans partial (map-
  side) aggregation before the shuffle — the analogue of Presto's
  PushPartialAggregationThroughExchange.
- money sums use qutil's exact scaled-integer aggregation: deterministic
  at any parallelism (no float-order sensitivity), matching Presto's
  DECIMAL aggregation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .qutil import exact_avg, exact_sum, scaled_sum, sql_exact_avg, sql_exact_sum, sql_scaled_sum
from .registry import query

TS = lambda s: F.expr(f"TIMESTAMP '{s}'")  # noqa: E731

REVENUE = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
@query(
    "tpch_q01",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_exact_sum('l_quantity', 'sum_qty')},
       {sql_exact_sum('l_extendedprice', 'sum_base_price')},
       {sql_exact_sum(REVENUE, 'sum_disc_price')},
       {sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_exact_avg('l_quantity', 'avg_qty')},
       {sql_exact_avg('l_extendedprice', 'avg_price')},
       {sql_exact_avg('l_discount', 'avg_disc')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: scan + filter + hash agg (HashAggregationOperator
    analogue, reference operator/HashAggregationOperator.java:56)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= TS("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), "sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            exact_sum(_revenue(), "sum_disc_price"),
            exact_sum(_revenue() * (1 + F.col("l_tax")), "sum_charge"),
            exact_avg(F.col("l_quantity"), "avg_qty"),
            exact_avg(F.col("l_extendedprice"), "avg_price"),
            exact_avg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q03",
    oracle=f"""
SELECT l_orderkey, {sql_exact_sum(REVENUE, 'revenue')}, o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: 3-way join + agg + top-k
    (LookupJoinOperator + TopNOperator analogues)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < TS("1998-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > TS("1998-03-15"))
    # orders is 97% unfiltered here: without the hint its pruned-column
    # size sneaks under the auto-broadcast threshold at mid scales, and
    # the plan single-thread-builds a fact-table hash relation (round-12
    # floor decomposition: the whole mid-TPC-H sf1x gap was this class).
    # Shuffled hash join, building on the ~3% shipdate-filtered lineitem
    # side, wins at every decade and is the only feasible 100 TB shape.
    return (
        l.hint("shuffle_hash").join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(_revenue(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q04",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order priority: EXISTS -> semi join
    (HashSemiJoinOperator analogue, operator/HashSemiJoinOperator.java:35).

    Formulated as inner-join-then-dedup rather than a literal left-semi:
    with orders pre-filtered to a 3-month slice, the slice is the natural
    build side — the literal ``o.join(l, ..., "left_semi")`` makes Spark
    build a hashed relation over the whole LINEITEM projection (measured
    2x slower at sf0.1, and a fact-table broadcast whenever the 2-column
    projection sneaks under the threshold).  The dedup groupBy touches
    only matched orders (bounded by the slice), and the derived
    ``l_shipdate > slice_start`` predicate reaches the parquet scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1996-04-01"))
    )
    # EXISTS requires l_shipdate > o_orderdate >= 1996-01-01: push the
    # static bound into the lineitem scan
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > TS("1996-01-01"))
    return (
        l.join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            (l.l_orderkey == F.col("o_orderkey")) & (l.l_shipdate > F.col("o_orderdate")),
        )
        .groupBy("o_orderkey")
        .agg(F.first("o_orderpriority").alias("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q05",
    oracle=f"""
SELECT n_name, {sql_exact_sum(REVENUE, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: 6-way star join; dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(_revenue(), "revenue"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q06",
    oracle=f"""
SELECT {sql_exact_sum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: pushed-down filters + global agg
    (AggregationOperator analogue; all predicates reach the parquet scan)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= TS("1996-01-01"))
            & (F.col("l_shipdate") < TS("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, {sql_exact_sum(REVENUE, 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: join + agg + top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(_revenue(), "revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q12",
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shape (fixture lacks l_shipmode): join + conditional agg."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1996-01-01")) & (F.col("l_shipdate") < TS("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # full orders must not broadcast (round-12 re-plan: the auto-chosen
    # broadcast build halved throughput at sf0.1 AND sf1x — 0.30/0.93 s
    # -> 0.17/0.43 s — and cannot exist at 100 TB); build on the
    # year-filtered lineitem side
    return (
        l.hint("shuffle_hash").join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q14",
    oracle=f"""
SELECT 100.0 * {sql_scaled_sum(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0.0 END")}
              / {sql_scaled_sum(REVENUE)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo revenue share: broadcast dim join + conditional global agg."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1996-09-01")) & (F.col("l_shipdate") < TS("1996-10-01"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * scaled_sum(promo).cast("double")
                / scaled_sum(_revenue()).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q18",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       o_totalprice,
       {sql_exact_sum('l_quantity', 'total_qty')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers.

    The textbook form (IN-subquery -> semi join -> re-aggregate) scans
    and shuffles lineitem twice, but the per-order quantity sum the
    HAVING computes IS the query's total_qty: aggregate once, filter
    (result is a handful of orders), then join.  One lineitem shuffle
    total; measured 4x over the semi-join form at 10x sf0.1.

    The orders join is HINTED to a shuffled hash join with the filtered
    aggregate as build side (round 10): without the hint Catalyst
    broadcasts ORDERS (it fits locally), which (a) spends a whole
    broadcast-build job + a 150k-row hashed relation per run — q18 went
    3 jobs -> 2, 0.46 s -> 0.34 s at sf0.1 — and (b) is a plan that
    CANNOT survive scale, since orders grows with SF while the
    aggregate's exceeds-150 side stays the small side.  The big side's
    shuffle is free: the groupBy already hash-partitioned it on
    l_orderkey, so only orders pays an exchange — the standard
    fact-to-fact plan (Presto q18 does the same: the HAVING aggregate
    is the build side of a partitioned join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.hint("shuffle_hash").join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q19",
    oracle=f"""
SELECT {sql_exact_sum(REVENUE, 'revenue')}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: join with OR-of-ANDs residual predicate."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(exact_sum(_revenue(), "revenue"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q22",
    oracle=f"""
SELECT nat, count(*) AS numcust, {sql_exact_sum('c_acctbal', 'totacctbal')}
FROM (
  SELECT c_nationkey AS nat, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT {sql_scaled_sum('c_acctbal')} / 10000.0 / count(*)
                     FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
) t
GROUP BY nat
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: scalar subquery + anti join
    (Presto EnforceSingleRowOperator + null-aware semi-join analogues)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (scaled_sum(F.col("c_acctbal")).cast("double") / 10000.0 / F.count(F.lit(1))).alias("a")
        )
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            # no broadcast hint: the date predicate's selectivity is a
            # DATA property, not a plan invariant — on a dataset whose
            # horizon covers it the anti side is unbounded and a forced
            # broadcast would build it on the driver.  AQE sees the
            # filtered size at runtime and downgrades the shuffle join
            # to broadcast when (and only when) the side is small.
            o.filter(F.col("o_orderdate") >= TS("2000-01-01")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
    )
    return (
        rich.groupBy(F.col("c_nationkey").alias("nat"))
        .agg(
            F.count("*").alias("numcust"),
            exact_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )
