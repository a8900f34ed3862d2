"""TPC-H q02/q07/q08/q09/q11/q13/q15/q16/q17/q20/q21 adapted to the
driver fixtures (no partsupp table, no commit/receipt dates — see
FIXTURES.md), completing 22-of-22 query-shape coverage together with
queries/tpch.py.

Reference SQL: /root/reference/presto-benchto-benchmarks/src/main/
resources/sql/presto/tpch/q02.sql .. q21.sql.  Where the original uses
partsupp, the (l_partkey, l_suppkey) pairs from lineitem stand in as
the supply relation (unit price min() as supply cost); where it uses
receipt/commit dates, lateness is l_shipdate > o_orderdate + 60 days.
The *query shapes* — correlated scalar subqueries, HAVING over a
global-agg subquery, EXISTS/NOT EXISTS pairs, left-join count
distributions, market-share conditional aggregation — are preserved
exactly; those are what exercise the planner.

Scale notes (100 TB): same as tpch.py — filters precede joins (scan
pushdown), dims broadcast, money through qutil's exact scaled-integer
sums.  The correlated-subquery shapes decorrelate to joins in Catalyst
(RewriteCorrelatedScalarSubquery), mirroring Presto's
TransformCorrelatedScalarAggregationToJoin.java:66.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .qutil import exact_sum, scaled_sum, sql_exact_sum, sql_scaled_sum
from .registry import query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
@query(
    "tpch_q02",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT o.l_partkey, o.l_suppkey, o.cost, s.s_name, n.n_name
  FROM offers o
  JOIN supplier s ON s.s_suppkey = o.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT p.p_partkey, p.p_type, e.s_name, e.n_name, e.cost
FROM eligible e
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_size = 15
  AND e.cost = (SELECT min(e2.cost) FROM eligible e2 WHERE e2.l_partkey = e.l_partkey)
""",
)
def tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q02 shape: min-cost supplier per part in a region (correlated
    scalar-min subquery -> groupBy+join decorrelation).  partsupp is
    derived from lineitem unit prices (q02.sql's ps_supplycost)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    # Dims first (map-side): the EUROPE supplier filter commutes with
    # the per-(part, supplier) min, so joining the broadcast dim chain
    # BEFORE the shuffle drops ~4/5 of the rows that would ship.
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    eligible_raw = l.join(
        F.broadcast(eu), l["l_suppkey"] == eu["s_suppkey"]
    ).select(
        "l_partkey",
        "l_suppkey",
        "s_name",
        "n_name",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    # ONE shuffle for agg + window: hash(l_partkey) satisfies BOTH the
    # groupBy's ClusteredDistribution(l_partkey, l_suppkey, ...) (subset
    # partitioning co-locates every group) and the window's
    # partitionBy(l_partkey) — the explicit repartition replaces the two
    # exchanges the default plan inserts.  The (pk, sk) combine factor
    # in lineitem is ~1.2, so shuffling pre-agg rows costs almost the
    # same bytes as the partial-agg shuffle it replaces.  Ties keep all
    # rows, same as the correlated scalar subquery.
    w = Window.partitionBy("l_partkey")
    return (
        eligible_raw.repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min("unit_cost").alias("cost"))
        .withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .select("p_partkey", "p_type", "s_name", "n_name", "cost")
    )


@query(
    "tpch_q07",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_exact_sum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year, {REVENUE} AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q07: bilateral shipping volume between two nations per year."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        # the supplier probe keeps only the two nations' lineitems, so
        # the stream entering the orders join is far smaller than full
        # orders — shuffled hash join building on it (full orders must
        # not broadcast; round-12 floor decomposition)
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .hint("shuffle_hash")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), _revenue().alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(F.col("volume"), "revenue"))
    )


@query(
    "tpch_q08",
    oracle=f"""
SELECT o_year,
       {sql_scaled_sum(f"CASE WHEN nation = 'NATION_7' THEN {REVENUE} ELSE 0 END")}
         / {sql_scaled_sum(REVENUE)} AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year, n2.n_name AS nation,
         l_extendedprice, l_discount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) all_nations
GROUP BY o_year
""",
)
def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q08: national market share within a region for a part type."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nk"))
    )
    rev = _revenue()
    nat_rev = F.when(F.col("nation") == "NATION_7", rev).otherwise(F.lit(0.0))
    return (
        j.select(F.year("o_orderdate").alias("o_year"), F.col("nation"), "l_extendedprice", "l_discount")
        .groupBy("o_year")
        .agg(
            (scaled_sum(nat_rev).cast("double") / scaled_sum(rev).cast("double")).alias("mkt_share")
        )
    )


@query(
    "tpch_q09",
    oracle=f"""
SELECT nation, o_year, {sql_exact_sum('amount', 'sum_profit')}
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year, {REVENUE} AS amount
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q09: product-line profit per nation per year (supply-cost term
    dropped — no partsupp; the 5-way join + agg shape is intact)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = (
        # the %red% part probe keeps ~6% of lineitem, so the stream
        # entering the orders join is far smaller than full orders —
        # shuffled hash join building on it (full orders must not
        # broadcast; round-12 floor decomposition measured the broadcast
        # build at 2x the shuffle at sf1x)
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .hint("shuffle_hash")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), _revenue().alias("amount"))
        .groupBy("nation", "o_year")
        .agg(exact_sum(F.col("amount"), "sum_profit"))
    )


@query(
    "tpch_q11",
    oracle=f"""
WITH v AS (
  SELECT l.l_partkey, {sql_exact_sum(REVENUE, 'value')}
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value FROM v
WHERE value > (SELECT sum(value) * 0.001 FROM v)
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: per-part value with HAVING over a global-agg scalar
    subquery (value = lineitem revenue for one nation's suppliers)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(exact_sum(_revenue(), "value"))
        # v feeds BOTH the output and the HAVING threshold.  Round 16
        # (VERDICT r15 Wrong #2): the localCheckpoint that used to
        # materialize this diamond ALSO persisted the whole lineitem
        # join+agg ACROSS bench runs, leaving only the threshold join in
        # the timed region while DuckDB re-ran the full CTE every run.
        # Re-tested without it: ReuseExchange DOES dedupe the diamond
        # (the plan shows one Exchange feeding both final aggregates as
        # a ReusedExchange — the r10-era "does not dedupe" note was
        # wrong for this shape), so per action the join + partial agg
        # run once and only the |parts|-sized final aggregate runs per
        # branch.  Honest per-action recompute; output unchanged
        # (collect-compare + oracle hash at sf0.001/0.01/0.1).
    )
    total = v.agg((F.sum("value") * 0.001).alias("threshold"))
    return v.join(F.broadcast(total)).filter(F.col("value") > F.col("threshold")).select(
        "l_partkey", "value"
    )


@query(
    "tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: customer order-count distribution (outer join + double agg).

    The per-customer count is pushed BELOW the join: aggregating orders
    first shrinks the join's build side from |orders| rows to
    |customers-with-orders| (map-side combine does most of the work
    before the one shuffle).  count(o_orderkey) over the left join ==
    the pre-aggregated count with 0 for no-match customers.

    The counts side is HINTED to a shuffled hash join (round 12): the
    aggregate is |customers|-sized, so letting it sneak under the
    broadcast threshold single-thread-builds a hash relation that
    scales with the customer table — same class as the q03/q07/q09/q12
    orders fix.  Same-window A/B: 0.321 -> 0.220 s sf0.1,
    0.490 -> 0.468 s sf1x, 1.483 -> 1.277 s sf10x."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    o_counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    per_cust = c.join(
        o_counts.hint("shuffle_hash"), c["c_custkey"] == o_counts["o_custkey"], "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_exact_sum(REVENUE, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: top supplier by 3-month revenue (view + scalar-max subquery).

    total_revenue comes from the exact integer sum, so the max-equality
    match is bit-exact on both engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
        # provable no-op (TPC-H declares l_suppkey NOT NULL) that makes
        # the two diamond branches canonically IDENTICAL: the supplier
        # join pushes isnotnull(l_suppkey) into its branch's scan while
        # the scalar-max branch has no such constraint, which defeated
        # ReuseExchange.  With the filter explicit on the shared input,
        # both branches reuse ONE lineitem aggregate exchange.
        & F.col("l_suppkey").isNotNull()
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(_revenue(), "total_revenue"))
        # same diamond as q11; same round-16 fix: ReuseExchange dedupes
        # it (one shuffle, two final aggregates), so the cross-run
        # localCheckpoint reuse is retired from the timed region
        # (VERDICT r15 Wrong #2) with no per-action double execution.
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        F.broadcast(s)
        .join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16: supplier count per brand/type/size with NOT IN anti-join
    (complaint filter adapted to s_acctbal < 0)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad_supp), l["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17",
    oracle=f"""
SELECT {sql_scaled_sum('l.l_extendedprice')} / 10000.0 / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * ({sql_scaled_sum('l2.l_quantity')} / 10000.0 / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17: small-quantity-order revenue (correlated avg subquery ->
    groupBy+join; threshold via exact integer avg on both engines).

    The per-partkey threshold aggregate is computed ONLY over Brand#1
    partkeys (round 12): the correlated subquery touches a partkey iff
    it survives the part filter, so the Brand#1 keys broadcast-restrict
    lineitem BEFORE the aggregation instead of aggregating all of
    lineitem and joining the filter in afterwards (the old form also
    let the full-lineitem aggregate sneak under the auto-broadcast
    threshold at mid scales — the round-12 fact-broadcast class).
    Same-window A/B: 0.272 -> 0.218 s at sf0.1, 0.584 -> 0.401 s at
    sf1x, 3.62 -> 1.02 s at sf10x — the win GROWS with scale because
    the avoided aggregate is over the whole fact table.  The broadcast
    side is partkey longs only (1/|brands| of part)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pk = F.broadcast(p.select("p_partkey"))
    lb = l.join(pk, l["l_partkey"] == pk["p_partkey"]).drop("p_partkey")
    thr = lb.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2 * (scaled_sum(F.col("l_quantity")).cast("double") / 10000.0 / F.count(F.lit(1)))
        ).alias("qty_thr")
    )
    return (
        lb.join(thr, lb["l_partkey"] == thr["t_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg((scaled_sum(F.col("l_extendedprice")).cast("double") / 10000.0 / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q20",
    oracle="""
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 50)
  AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: nested IN subqueries (semi joins) with HAVING —
    suppliers who moved >50 units of a 'small%' part in 1996."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    big_movers = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(big_movers), s["s_suppkey"] == big_movers["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q21",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, count(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: suppliers who alone were late on multi-supplier orders;
    lateness adapted to l_shipdate > o_orderdate + 60 days (no
    receipt/commit dates).

    The EXISTS/NOT EXISTS pair decorrelates into per-order aggregate
    stats instead of semi+anti self-joins: an order qualifies iff its
    late lines come from exactly ONE distinct supplier (NOT EXISTS other
    late supplier) and the order has >1 distinct suppliers overall
    (EXISTS other supplier).  Since only F-order lineitems matter on
    both sides, ONE join + ONE groupBy(l_orderkey) computes everything.
    Round 11: the cardinality tests need only a THRESHOLD, not a count,
    so min/max replace collect_set — `n_supp > 1` ⟺
    `min(l_suppkey) <> max(l_suppkey)` and `n_late_supp == 1` ⟺
    `any late AND min(late_supp) == max(late_supp)` — which drops the
    ObjectHashAggregate (per-group set state, no whole-stage codegen)
    for a plain codegen'd HashAggregate of four longs; measured
    0.51 -> 0.37 s at sf0.1 with identical results.  (Round 9 had
    folded the separate order_supp aggregation into the same pass —
    one lineitem scan and one lineitem-sized shuffle total.)"""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select("l_orderkey", "l_suppkey", is_late.alias("is_late"))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
            F.min(late_supp).alias("min_late"),
            F.max(late_supp).alias("max_late"),
            F.count(F.when(F.col("is_late"), 1)).alias("n_late_lines"),
        )
    )
    qual = per_order.filter(
        (F.col("n_late_lines") > 0)
        & (F.col("min_late") == F.col("max_late"))
        & (F.col("min_supp") != F.col("max_supp"))
    )
    return (
        qual.join(F.broadcast(s), qual["min_late"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )
