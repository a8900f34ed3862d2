"""Window-function operator coverage (SURVEY §2.5).

Reference: operator/WindowOperator.java:69 (partition + sort + framed
evaluation), specialized forms RowNumberOperator.java:41 and
TopNRowNumberOperator.java:37 (WindowFilterPushDown.java:61 rewrites
``row_number() <= k``), frame spec operator/window/FrameInfo.java:26
(ROWS | RANGE frames), function impls operator/window/*.java.

Spark-first design: ``pyspark.sql.Window`` specs; Spark's WindowExec
hash-partitions on partitionBy keys and sorts within partitions —
exactly WindowOperator's strategy, but distributed by the shuffle
layer.  Spark >=3.3 plans the row_number-filter pattern as
WindowGroupLimit (per-partition top-k without a full sort), matching
TopNRowNumberOperator.

Determinism: every ORDER BY ends in a unique key (total order) so rows,
ranks and frames are reproducible on both engines; windowed sums over
doubles go through qutil's scaled-BIGINT trick so frame-accumulation
order can't flip a bit.

Scale note (100 TB): a window partitioned on a low-cardinality key
(e.g. o_orderpriority, 5 values) puts each group on ONE task — fine for
demos, a skew hazard at scale.  Real pipelines partition on a
high-cardinality key (o_custkey below) or pre-bucket; the TopN pattern
additionally benefits from WindowGroupLimit's partial (map-side) top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .qutil import scaled_long
from .registry import query


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


# ---------------------------------------------------------------------------
@query(
    "win_topn_row_number",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
""",
)
def win_topn_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number filter — TopNRowNumberOperator.java:37.

    Spark 3.3+ plans this as WindowGroupLimit: each task keeps only k rows
    per group before the shuffle, so the exchanged data is O(groups*k), not
    O(rows) — the same partial/final split Presto's
    InMemoryGroupedTopNBuilder does.
    """
    o = _orders(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_ranks",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist()    OVER w AS cdist
FROM orders
WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def win_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist — RankFunction.java et al."""
    o = _orders(spark, sf_dir).filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 10 == 0))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_totalprice, 1, 0.0) OVER w AS prev_price,
       lead(o_orderkey, 2)       OVER w AS next2_key,
       lag(o_orderkey)           OVER w AS prev_key
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offsets and defaults — LagFunction/LeadFunction.java."""
    o = _orders(spark, sf_dir).filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1, 0.0).over(w).alias("prev_price"),
        F.lead("o_orderkey", 2).over(w).alias("next2_key"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(*) OVER w AS n_so_far,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         AS running_spend
FROM orders
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame ROWS UNBOUNDED PRECEDING..CURRENT — FrameInfo.java:26."""
    o = _orders(spark, sf_dir).filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = scaled_long(F.col("o_totalprice"), 100)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_so_far"),
        (F.sum(cents).over(w).cast("double") / 100.0).alias("running_spend"),
    )


@query(
    "win_sliding_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         AS moving_sum3,
       min(o_orderkey) OVER w AS min_key3,
       max(o_orderkey) OVER w AS max_key3
FROM orders
WHERE o_custkey % 50 = 1
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (k PRECEDING..CURRENT) — FrameInfo.java:26."""
    o = _orders(spark, sf_dir).filter(F.col("o_custkey") % 50 == 1)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    cents = scaled_long(F.col("o_totalprice"), 100)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("moving_sum3"),
        F.min("o_orderkey").over(w).alias("min_key3"),
        F.max("o_orderkey").over(w).alias("max_key3"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, cents,
       count(*) OVER w AS n_within_5000,
       CAST(sum(cents) OVER w AS BIGINT) AS sum_within_5000
FROM (SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 20 = 0) t
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
             RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW)
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a value offset (price within $5000 below) —
    WindowFrame.java:28-30 RANGE type."""
    o = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 20 == 0)
    t = o.select(
        "o_orderkey",
        "o_orderpriority",
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents").rangeBetween(-500000, 0)
    return t.select(
        "o_orderkey",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_within_5000"),
        F.sum("cents").over(w).alias("sum_within_5000"),
    )


@query(
    "win_first_last_nth",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey)  OVER w AS last_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WHERE o_custkey % 100 = 3
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over the full-partition frame —
    FirstValueFunction/LastValueFunction/NthValueFunction.java."""
    o = _orders(spark, sf_dir).filter(F.col("o_custkey") % 100 == 3)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "win_ntile",
    oracle="""
SELECT o_orderpriority, tile,
       count(*) AS n,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM (
  SELECT o_orderpriority, o_orderkey,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS tile
  FROM orders
) t
GROUP BY o_orderpriority, tile
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (then aggregated per tile) — NTileFunction.java."""
    o = _orders(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_orderpriority", "o_orderkey", F.ntile(4).over(w).alias("tile"))
        .groupBy("o_orderpriority", "tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@query(
    "win_share_of_partition",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_total_cents,
       count(*) OVER (PARTITION BY o_custkey) AS cust_orders
FROM orders
WHERE o_custkey % 100 = 7
""",
)
def win_share_of_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an unordered partition window (whole-partition frame)
    — AggregateWindowFunction.java."""
    o = _orders(spark, sf_dir).filter(F.col("o_custkey") % 100 == 7)
    cents = scaled_long(F.col("o_totalprice"), 100)
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        cents.alias("cents"),
        F.sum(cents).over(w).alias("cust_total_cents"),
        F.count(F.lit(1)).over(w).alias("cust_orders"),
    )


# ---------------------------------------------------------------------------
# GROUPS frames (WindowFrame.java:28-30 frame type GROUPS).  Spark has no
# native GROUPS mode; the exact rewrite is: materialize the peer-group
# index g = dense_rank() over (partition, order), then run the aggregate
# with RANGE BETWEEN k PRECEDING AND k' FOLLOWING over ORDER BY g —
# integer-valued RANGE distance on g IS peer-group distance.  Both
# windows share the partition key, so Spark plans ONE shuffle + sort.
# ---------------------------------------------------------------------------
def groups_frame_window(
    part_cols: list[str], order_cols: list[str], start: int, end: int
):
    """Return (peer_index_column, window) implementing
    GROUPS BETWEEN |start| PRECEDING AND end FOLLOWING."""
    g = F.dense_rank().over(Window.partitionBy(*part_cols).orderBy(*order_cols))
    w = Window.partitionBy(*part_cols).orderBy("_peer_g").rangeBetween(start, end)
    return g, w


@query(
    "win_groups_frame",
    # DuckDB doesn't implement GROUPS mode either, so the oracle derives
    # the same semantics a DIFFERENT way (stronger check than mirroring
    # our rewrite): aggregate per peer group (priority, date), take
    # lag/lead neighbors, join back to the rows.
    oracle="""
WITH t AS (SELECT o_orderkey, o_orderpriority, o_orderdate,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey % 20 = 0),
d AS (SELECT o_orderpriority, o_orderdate, count(*) AS n, sum(cents) AS s
      FROM t GROUP BY o_orderpriority, o_orderdate),
dd AS (SELECT o_orderpriority, o_orderdate,
              n + coalesce(lag(n) OVER w, 0) + coalesce(lead(n) OVER w, 0) AS n_adj,
              s + coalesce(lag(s) OVER w, 0) + coalesce(lead(s) OVER w, 0) AS s_adj
       FROM d WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
SELECT t.o_orderkey, t.o_orderdate,
       dd.n_adj AS n_adjacent_days,
       CAST(dd.s_adj AS BIGINT) AS sum_adjacent_days
FROM t JOIN dd ON t.o_orderpriority = dd.o_orderpriority
              AND t.o_orderdate = dd.o_orderdate
""",
)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame via the dense_rank->RANGE rewrite above: the frame
    spans the current ORDER-BY peer group plus one whole peer group on
    each side (here: all orders on the same / previous / next distinct
    order date within a priority class).  The oracle derives the same
    frame by per-peer-group aggregation + lag/lead + join-back — an
    independent construction proving the rewrite exact, including tied
    rows sharing one frame, which ROWS frames cannot express."""
    o = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 20 == 0)
    t = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
    )
    g, w = groups_frame_window(["o_orderpriority"], ["o_orderdate"], -1, 1)
    return (
        t.withColumn("_peer_g", g)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.count(F.lit(1)).over(w).alias("n_adjacent_days"),
            F.sum("cents").over(w).alias("sum_adjacent_days"),
        )
    )
