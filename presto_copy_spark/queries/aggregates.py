"""Aggregation operator coverage (SURVEY §2.4).

Covers: global + grouped hash aggregation, DISTINCT aggregates,
statistical aggregates (variance/stddev/corr/covar/skewness/kurtosis),
min_by/max_by, bool/bit aggregates, count_if, exact percentiles,
collect_list/set (array_agg), grouping sets / rollup / cube with
grouping_id, geometric mean, checksum, histogram/map_agg/approx_* .

Reference: operator/HashAggregationOperator.java:56,
AggregationOperator.java:35, GroupIdOperator.java:32, function registry
BuiltInTypeAndFunctionNamespaceManager.java:655-1010.

Cross-engine determinism notes:
- Spark `skewness`/`kurtosis` are population moments (g1, excess g2);
  DuckDB's are sample-corrected — oracles compute g1/g2 from raw
  moments instead of using DuckDB's aggregate.
- checksum uses md5-derived bigints (identical in both engines) rather
  than xxhash64 (engine-specific), summed — order-independent, exactly
  the reference's ChecksumAggregationFunction design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .qutil import exact_avg, exact_sum, scaled_long, sql_exact_avg, sql_exact_sum
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# md5-based 60-bit row hash, bit-identical in Spark and DuckDB.
def spark_row_hash(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def sql_row_hash(e: str) -> str:
    return f"('0x' || substr(md5(CAST(({e}) AS VARCHAR)), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
@query(
    "agg_global",
    oracle=f"""
SELECT count(*) AS n,
       count(DISTINCT l_suppkey) AS n_supp,
       {sql_exact_sum('l_quantity', 'sum_qty')},
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       {sql_exact_avg('l_extendedprice', 'avg_price')}
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no GROUP BY) aggregation — AggregationOperator.java:35."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        exact_sum(F.col("l_quantity"), "sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        exact_avg(F.col("l_extendedprice"), "avg_price"),
    )


@query(
    "agg_distinct_mixed",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS d_supp,
       count(DISTINCT l_partkey) AS d_part,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed DISTINCT aggregates (MarkDistinctOperator.java:35 /
    OptimizeMixedDistinctAggregations — Spark plans Expand natively)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("d_supp"),
        F.countDistinct("l_partkey").alias("d_part"),
        F.count("*").alias("n"),
    )


@query(
    "agg_variance_stddev",
    oracle="""
SELECT l_returnflag,
       round(var_samp(l_discount), 9) AS vs,
       round(var_pop(l_discount), 9) AS vp,
       round(stddev_samp(l_discount), 9) AS ss,
       round(stddev_pop(l_discount), 9) AS sp
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_variance_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variance/stddev family (VarianceAggregation.java).  l_discount is
    small-magnitude so a 9dp round absorbs partial-agg float ordering."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.var_samp("l_discount"), 9).alias("vs"),
        F.round(F.var_pop("l_discount"), 9).alias("vp"),
        F.round(F.stddev_samp("l_discount"), 9).alias("ss"),
        F.round(F.stddev_pop("l_discount"), 9).alias("sp"),
    )


@query(
    "agg_corr_covar",
    oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 6) AS c,
       round(covar_samp(l_quantity, l_discount), 6) AS cvs,
       round(covar_pop(l_quantity, l_discount), 6) AS cvp
FROM lineitem
""",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar (DoubleCorrelationAggregation.java,
    DoubleCovarianceAggregation.java)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cvs"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("cvp"),
    )


@query(
    "agg_skew_kurt",
    oracle="""
WITH mu AS (SELECT avg(l_quantity) AS m, count(*) AS n FROM lineitem)
SELECT round(avg(pow(l_quantity - m, 3)) / pow(avg(pow(l_quantity - m, 2)), 1.5), 6)
         AS skew_g1,
       round(avg(pow(l_quantity - m, 4)) / pow(avg(pow(l_quantity - m, 2)), 2) - 3, 6)
         AS kurt_g2
FROM lineitem, mu
""",
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness/kurtosis (CentralMomentsAggregation.java).  Spark returns
    population g1 / excess g2; DuckDB's aggregates are sample-corrected,
    so the oracle computes the population moments explicitly."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew_g1"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_g2"),
    )


@query(
    "agg_min_max_by",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS biggest_order,
       arg_min(o_orderkey, o_totalprice) AS smallest_order,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (reference minmaxby/ package)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_bool_bit",
    oracle="""
SELECT l_linestatus,
       bool_and(l_quantity > 0) AS all_pos,
       bool_or(l_discount > 0.09) AS any_big_disc,
       bit_and(l_suppkey) AS band,
       bit_or(l_suppkey) AS bor,
       bit_xor(l_suppkey) AS bxor,
       CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_taxed
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or (BooleanAndAggregation.java), bitwise_*_agg
    (BitwiseAndAggregation.java), count_if (CountIfAggregation.java)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.bit_and("l_suppkey").alias("band"),
        F.bit_or("l_suppkey").alias("bor"),
        F.bit_xor("l_suppkey").alias("bxor"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_taxed"),
    )


@query(
    "agg_percentiles",
    oracle="""
WITH expanded AS (
  SELECT l_returnflag, l_quantity
  FROM lineitem, unnest(generate_series(1, CAST(l_linenumber AS BIGINT))) AS g(i)
)
SELECT l.l_returnflag,
       quantile_cont(l.l_quantity, 0.25) AS p25,
       quantile_cont(l.l_quantity, 0.5)  AS p50,
       quantile_cont(l.l_quantity, 0.75) AS p75,
       (SELECT quantile_cont(e.l_quantity, 0.5) FROM expanded e
        WHERE e.l_returnflag = l.l_returnflag) AS wp50
FROM lineitem l
GROUP BY l.l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles plus the WEIGHTED form (Presto
    approx_percentile(x, w, p); oracle expands each row w times — the
    weighted percentile's definition)."""
    from ..functions.presto import approx_percentile_weighted

    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        approx_percentile_weighted("l_quantity", "l_linenumber", 0.5).alias("wp50"),
    )


@query(
    "agg_array_collect",
    oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
       CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg / set_agg -> collect_set, emitted as a sorted joined
    string so the value comparison is representation-stable."""
    l = _t(spark, sf_dir, "lineitem")
    statuses = F.array_sort(F.collect_set("l_linestatus"))
    return l.groupBy("l_returnflag").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(statuses).alias("n_statuses"),
    )


@query(
    "agg_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + grouping_id (GroupIdOperator.java:32; grammar
    SqlBase.g4:261-263)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.grouping_id().alias("gid")
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.grouping_id().alias("gid")
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_geometric_mean",
    oracle="""
SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_mean
FROM lineitem WHERE l_quantity > 0
GROUP BY l_returnflag
""",
)
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometric_mean (GeometricMeanAggregations.java) = exp(avg(ln x))."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return l.groupBy("l_returnflag").agg(
        F.round(F.exp(F.avg(F.log("l_quantity"))), 6).alias("geo_mean")
    )


@query(
    "agg_checksum",
    oracle=f"""
SELECT l_returnflag, bit_xor({sql_row_hash('l_orderkey * 10 + l_linenumber')}) AS chk
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent checksum (ChecksumAggregationFunction analogue)
    over a cross-engine-stable md5-derived row hash.  bit_xor instead of
    sum: commutative, associative, and overflow-free at any row count
    (a sum of 60-bit hashes overflows int64 past ~10^4 rows and Spark
    wraps while DuckDB promotes to int128)."""
    l = _t(spark, sf_dir, "lineitem")
    row_key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return l.groupBy("l_returnflag").agg(F.bit_xor(spark_row_hash(row_key)).alias("chk"))


@query(
    "agg_arbitrary",
    oracle="""
SELECT o_orderstatus, min(o_orderpriority) AS some_priority
FROM orders GROUP BY o_orderstatus
""",
)
def agg_arbitrary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arbitrary()/any_value() — nondeterministic by definition, so the
    checked variant pins the choice with min() (the reference tests do
    the same trick for arbitrary())."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(F.min("o_orderpriority").alias("some_priority"))


# ---- approx / sketch family: tolerance-oracled (round 8; was rows-only).
# The estimates themselves are engine-specific (Spark HLL++ / Datasketches
# vs DuckDB HLL), so the driver-hashable contract is the VERDICT-endorsed
# tolerance oracle: the exact ground truth column is oracled exactly, and
# a boolean "estimate within the documented error bound" column is
# hash-checked TRUE — if any estimate drifts outside its published bound,
# the hash flips and the row goes red.
@query(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_3rsd
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_distinct (HLL++; ApproximateCountDistinctAggregation.java).
    rsd = 0.023 (the reference's default standard error); the oracle
    hash-checks |approx - exact| <= 3 * rsd * exact — the documented
    99.7% bound — alongside the exactly-oracled COUNT(DISTINCT).
    Measured error at the fixture scales is <=1% (probe: 199/200 at
    sf0.001, 2019/2000 at sf0.01, 19793/19998 at sf0.1)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.023)
                - F.countDistinct("l_partkey")
            )
            <= 3 * 0.023 * F.countDistinct("l_partkey")
        ).alias("within_3rsd"),
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
SELECT n_regionkey,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_3rsd
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
""",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_set / merge(HyperLogLog) / cardinality(hll) re-expressed as
    Spark Datasketches HLL (ApproximateSetAggregation.java,
    MergeHyperLogLogAggregation.java, HyperLogLogFunctions.java).

    Two-level sketch rollup, the reference's canonical HLL-type usage:
    partial sketch per nation (approx_set), sketches merged per region
    (merge), estimated at the end (cardinality).  The sketch column is a
    mergeable binary — at 100 TB the per-nation partials are tiny and the
    re-aggregation shuffles only sketch bytes, never raw keys.

    Tolerance oracle (round 8): exact per-region COUNT(DISTINCT) is
    oracled exactly and the merged estimate is hash-checked within
    3 * rsd(lgK=14) ≈ 2.4% of it.  Measured: the Datasketches coupon
    regime is near-exact here (largest observed deviation 1 in 2931 at
    sf0.1 — a single coupon collision), far inside the bound."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    partial = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sketch"),
        F.countDistinct("c_custkey").alias("exact_partial"),
    )
    rsd = 1.04 / (2 ** 7)  # 1.04 / sqrt(2^14)
    return (
        partial.join(F.broadcast(n), partial.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            F.sum("exact_partial").alias("exact_customers"),
            (
                F.abs(
                    F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                    - F.sum("exact_partial")
                )
                <= 3 * rsd * F.sum("exact_partial")
            ).alias("within_3rsd"),
        )
    )


@query(
    "agg_approx_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS approx_median,
       median(l_extendedprice) AS exact_median
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (qdigest/tdigest analogue -> Spark
    percentile_approx with accuracy knob).

    Exact-regime oracle (round 8): Greenwald-Khanna with
    accuracy = 100,000 guarantees rank error <= n / accuracy, which is
    < 1 rank whenever a group holds under 100k rows — true at the
    pytest (sf0.001, ~2k rows/group) and driver (sf0.01, ~20k
    rows/group) gates — so the approx result IS the discrete median,
    byte-equal to DuckDB's quantile_disc.  Beyond the exact regime the
    guarantee degrades gracefully to +-n/100k ranks (probe at sf0.1's
    ~200k rows/group: two of three groups land one element off,
    52803.51 vs 52803.59 — the documented GK slack, not a bug)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 100000).alias("approx_median"),
        F.percentile("l_extendedprice", 0.5).alias("exact_median"),
    )


@query(
    "agg_histogram_map",
    oracle="""
WITH counted AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus,
       array_to_string(
         list_sort(list(o_orderpriority || ':' || CAST(cnt AS VARCHAR))),
         ',') AS priority_histogram,
       CAST(count(*) AS INT) AS n_keys
FROM counted
GROUP BY o_orderstatus
""",
)
def agg_histogram_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram()/map_agg() (Histogram.java:48,
    MapAggregationFunction.java:51) in the distributed 100 TB shape:
    groupBy(key, value).count() (map-side partial combine) then a small
    per-key entry list — never an O(group)-sized collect_list of raw
    rows.  The map is emitted as a sorted joined ``k:v`` string because
    map cells have no stable cross-engine representation (driver r1
    failed with "unhashable type: 'dict'"); identical string sort on
    both engines keeps the value hash comparable."""
    o = _t(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    entry = F.concat_ws(":", F.col("o_orderpriority"), F.col("cnt").cast("string"))
    entries = F.array_sort(F.collect_list(entry))
    return counted.groupBy("o_orderstatus").agg(
        F.array_join(entries, ",").alias("priority_histogram"),
        F.size(entries).alias("n_keys"),
    )


@query(
    "agg_top_k_frequent",
    oracle="""
WITH counted AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS value, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, value, cnt, rnk
FROM (SELECT c.*, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, value) AS rnk
      FROM counted c) t
WHERE rnk <= 3
""",
)
def agg_top_k_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed approx_most_frequent (ApproximateMostFrequent.java:69)
    — exact top-k via groupBy count + WindowGroupLimit; no per-group
    array ever exceeds k (operators/aggregates.py:top_k_values)."""
    from ..operators.aggregates import top_k_values

    l = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return top_k_values(l, ["l_returnflag"], "qty", 3)


@query(
    "agg_numeric_histogram",
    oracle="""
SELECT o_orderpriority,
       CASE WHEN cents < 0 THEN 0
            WHEN cents >= 60000000 THEN 61
            ELSE CAST(floor(cents / 1000000) AS BIGINT) + 1 END AS bucket,
       count(*) AS cnt
FROM (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders) t
GROUP BY 1, 2
""",
)
def agg_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed numeric_histogram (NumericHistogram.java) — one row
    per non-empty width_bucket per group; integer cents keep bucket
    boundaries exact on both engines."""
    from ..operators.aggregates import value_histogram

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", scaled_long(F.col("o_totalprice"), 100).alias("cents")
    )
    out = value_histogram(o, ["o_orderpriority"], F.col("cents"), 60, 0, 60000000)
    return out.select("o_orderpriority", F.col("bucket").cast("long").alias("bucket"), "cnt")


# ---------------------------------------------------------------------------
# Decimal(p,s) exact arithmetic (DecimalType.java, DecimalSumAggregation.java,
# DecimalOperators.java) — VERDICT r1 gap #2.
# ---------------------------------------------------------------------------
@query(
    "agg_decimal_exact",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / 4 AS DOUBLE)
         AS qty_quarter,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(p,s) aggregation — Presto's DecimalSumAggregation /
    DecimalOperators semantics on Spark's DecimalType.

    sum stays DECIMAL (no float drift at any parallelism), the
    DECIMAL(18,2) x DECIMAL(8,4) product is exact at scale 6, and the
    /4 division terminates at scale 4 so both engines' division paths
    (Spark decimal HALF_UP, DuckDB via double) land on the identical
    value.  sum_price stays DECIMAL(38,2) end-to-end; the scale-6
    results are cast to DOUBLE at the very end only because DuckDB's
    pandas bridge converts wide decimals to float (the exact decimal ->
    double conversion is deterministic on both engines).
    """
    l = _t(spark, sf_dir, "lineitem")
    dec2 = F.col("l_extendedprice").cast("decimal(18,2)")
    disc4 = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    qty2 = F.col("l_quantity").cast("decimal(18,2)")
    return l.groupBy("l_returnflag").agg(
        F.sum(dec2).cast("decimal(38,2)").alias("sum_price"),
        F.sum(dec2 * disc4).cast("double").alias("sum_disc_price"),
        (F.sum(qty2) / F.lit(4)).cast("double").alias("qty_quarter"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile digest rollup (QuantileDigestAggregationFunction.java:32,
# TDigestAggregationFunction.java:29) — VERDICT r1 gap #3.
# ---------------------------------------------------------------------------
@query(
    "agg_kll_quantile_rollup",
    # KLL stores values exactly below its compaction threshold (k = 200
    # — the func_qdigest_quantile precedent, measured exact through
    # n = 200 per merged group), where get_quantile(q) is the
    # ceil(q*n)-th order statistic and get_rank(v) the inclusive
    # fraction <= v.  The % 149 filter keeps every merged returnflag
    # group under that threshold at the correctness SFs; at larger SFs
    # the digest becomes approximate by design (bench only times it).
    oracle="""
WITH f AS (
  SELECT l_returnflag, l_extendedprice
  FROM lineitem WHERE l_orderkey % 149 = 0
)
SELECT l_returnflag,
       list_sort(list(l_extendedprice))[CAST(greatest(1, ceil(0.5 * count(*))) AS INT)]
         AS approx_median,
       list_sort(list(l_extendedprice))[CAST(greatest(1, ceil(0.95 * count(*))) AS INT)]
         AS approx_p95,
       CAST(list_sort(list(l_extendedprice))[CAST(greatest(1, ceil(0.1 * count(*))) AS INT)] AS VARCHAR)
         || ',' ||
       CAST(list_sort(list(l_extendedprice))[CAST(greatest(1, ceil(0.5 * count(*))) AS INT)] AS VARCHAR)
         || ',' ||
       CAST(list_sort(list(l_extendedprice))[CAST(greatest(1, ceil(0.9 * count(*))) AS INT)] AS VARCHAR)
         AS approx_deciles,
       CAST(sum(CASE WHEN l_extendedprice <= 50000.0 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS rank_of_50k,
       CAST(count(*) AS BIGINT) AS sketch_n,
       quantile_cont(l_extendedprice, 0.5) AS exact_median,
       quantile_cont(l_extendedprice, 0.95) AS exact_p95
FROM f
GROUP BY l_returnflag
""",
)
def agg_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qdigest/tdigest parity via Spark's Datasketches KLL: build partial
    sketches per (returnflag, linestatus), merge per returnflag, read
    quantiles off the merged sketch — the reference's canonical
    mergeable-digest rollup (qdigest_agg -> merge -> value_at_quantile,
    QuantileDigestFunctions.java).

    The sketch column is mergeable binary: at 100 TB the re-aggregation
    shuffles sketch bytes (KB each), never raw values.  The % 149
    systematic filter bounds each merged group under KLL's exact-mode
    threshold at the correctness SFs, so the DuckDB order-statistics
    oracle holds exactly (round-5 VERDICT ask #1); pytest additionally
    asserts error bounds vs the exact percentiles."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 149 == 0)
    partial = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.kll_merge_agg_double("sk").alias("sk"),
    )
    from ..functions.presto import quantile_at_value, values_at_quantiles

    rolled = merged.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("approx_median"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias("approx_p95"),
        # Presto scalar-accessor parity (QuantileDigestFunctions.java);
        # serialized to one string: the query sits in the 50-slot driver
        # window (round 5) and the driver canonicalizer hashes cell
        # values — array cells are unhashable (driver-contract guard
        # tests/test_queries_vs_oracle.py)
        F.array_join(
            values_at_quantiles("sk", [0.1, 0.5, 0.9]).cast("array<string>"),
            ",",
        ).alias("approx_deciles"),
        quantile_at_value("sk", 50000.0).alias("rank_of_50k"),
        F.kll_sketch_get_n_double("sk").alias("sketch_n"),
    )
    exact = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("exact_median"),
        F.percentile("l_extendedprice", 0.95).alias("exact_p95"),
    )
    return rolled.join(exact, "l_returnflag")


@query(
    "agg_theta_sketch_setops",
    # Theta sketches are EXACT while retained keys stay under the
    # nominal k = 4096 (no sampling happens until the nominal is
    # exceeded): at the correctness SFs distinct custkeys per status
    # (and their union) are well under 4096, so the estimates equal
    # the exact distinct-count set algebra — oracle-able (round-5
    # VERDICT ask #1).  At larger SFs the sketch estimates by design
    # (bench only times it).
    oracle="""
WITH o_k AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     f_k AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT CAST((SELECT count(*) FROM o_k) AS BIGINT) AS n_o,
       CAST((SELECT count(*) FROM f_k) AS BIGINT) AS n_f,
       CAST((SELECT count(*) FROM (SELECT * FROM o_k UNION SELECT * FROM f_k))
            AS BIGINT) AS approx_union,
       CAST((SELECT count(*) FROM (SELECT * FROM o_k INTERSECT SELECT * FROM f_k))
            AS BIGINT) AS approx_intersection
""",
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetDigest / KHLL parity via Datasketches Theta: per-status customer
    sketches, then union / intersection cardinalities across statuses
    (SetDigestFunctions.java intersection_cardinality,
    HyperLogLogFunctions.java merge+cardinality).

    Theta sketches support set INTERSECTION, which plain HLL cannot —
    that's exactly why the reference carries SetDigest alongside HLL.
    In theta's exact regime (distinct keys < nominal k = 4096, which
    holds at the correctness SFs) the estimates are exact, so the
    DuckDB COUNT(DISTINCT) set-algebra oracle applies."""
    o = _t(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.theta_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_n"),
    )
    a = sk.filter(F.col("o_orderstatus") == "O").select(
        F.col("sk").alias("sk_o"), F.col("exact_n").alias("n_o")
    )
    b = sk.filter(F.col("o_orderstatus") == "F").select(
        F.col("sk").alias("sk_f"), F.col("exact_n").alias("n_f")
    )
    return a.crossJoin(b).select(
        "n_o",
        "n_f",
        F.theta_sketch_estimate(F.theta_union(F.col("sk_o"), F.col("sk_f"))).alias(
            "approx_union"
        ),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_o"), F.col("sk_f"))
        ).alias("approx_intersection"),
    )


# ---------------------------------------------------------------------------
# entropy (EntropyAggregation.java) — VERDICT r1 gap #5.
# ---------------------------------------------------------------------------
@query(
    "agg_entropy",
    oracle="""
WITH counted AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus,
       round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 9) AS entropy,
       CAST(count(*) AS BIGINT) AS n_classes
FROM counted
GROUP BY o_orderstatus
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto entropy(bigint) (EntropyAggregation.java): log-2 Shannon
    entropy of an empirical count distribution, as the algebraic
    identity  H = log2(S) - sum(c*log2(c))/S  over per-class counts —
    a pure two-level aggregation (distributed partial-agg shape), no
    collection."""
    from ..functions.presto import entropy_from_counts

    o = _t(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counted.groupBy("o_orderstatus").agg(
        F.round(entropy_from_counts(F.col("cnt")), 9).alias("entropy"),
        F.count(F.lit(1)).alias("n_classes"),
    )


# ---------------------------------------------------------------------------
# classification_* metric aggregates (ClassificationPrecisionAggregation.java
# and siblings; shared ClassificationMetricUtils.java) — VERDICT r1 gap #5.
# ---------------------------------------------------------------------------
_CLS_B = 5


def _cls_oracle() -> str:
    """DuckDB twin of the classification_* family: one conditional sum
    per (threshold, confusion-cell), assembled with list_value."""

    def s(cond: str) -> str:
        return f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE)"

    # One row per (group, threshold) — the driver's canonicalizer can't
    # hash list cells (VERDICT r2 item 1), so the per-threshold metric
    # arrays are UNPIVOTED to scalar rows on both engine and oracle
    # sides.
    rows = []
    for i in range(_CLS_B):
        t = repr(i / _CLS_B)
        pos, neg = f"pred >= {t}", f"pred < {t}"
        tp = s(f"{pos} AND outcome")
        fp = s(f"{pos} AND NOT outcome")
        fn = s(f"{neg} AND outcome")
        tn = s(f"{neg} AND NOT outcome")
        rows.append(
            f"""
SELECT o_orderpriority,
       round({t}, 6) AS threshold,
       round({tp} / ({tp} + {fp}), 6) AS precision_at,
       round({tp} / ({tp} + {fn}), 6) AS recall_at,
       round({fn} / ({tp} + {fn}), 6) AS miss_rate_at,
       round({fp} / ({fp} + {tn}), 6) AS fall_out_at
FROM t
GROUP BY o_orderpriority"""
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH t AS (
  SELECT o_orderpriority,
         (o_orderkey % 97) / 96.0 AS pred,
         o_totalprice > 150000 AS outcome
  FROM orders
)
{union}
"""


@query("agg_classification", oracle=_cls_oracle())
def agg_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """classification_precision/recall/miss_rate/fall_out/thresholds:
    per-threshold confusion-matrix metrics as array<double>.  Every
    array element is a conditional sum, so the whole family runs as
    4*buckets parallel count_ifs in ONE aggregation pass — map-side
    partial aggregation, no per-group state beyond 4*buckets longs.
    The metric arrays are then UNPIVOTED post-agg (posexplode over
    |groups| tiny rows — cost-free) so the driver sees scalar columns
    only (driver hashability contract, VERDICT r2 item 1)."""
    from ..functions.presto import (
        classification_fall_out,
        classification_miss_rate,
        classification_precision,
        classification_recall,
        classification_thresholds,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        ((F.col("o_orderkey") % 97) / 96.0).alias("pred"),
        (F.col("o_totalprice") > 150000).alias("outcome"),
    )
    m = o.groupBy("o_orderpriority").agg(
        classification_thresholds(_CLS_B).alias("th"),
        classification_precision(_CLS_B, "pred", "outcome").alias("p"),
        classification_recall(_CLS_B, "pred", "outcome").alias("r"),
        classification_miss_rate(_CLS_B, "pred", "outcome").alias("mi"),
        classification_fall_out(_CLS_B, "pred", "outcome").alias("fo"),
    )
    z = m.select(
        "o_orderpriority",
        F.posexplode(F.arrays_zip("th", "p", "r", "mi", "fo")).alias("pos", "z"),
    )
    return z.select(
        "o_orderpriority",
        F.round(F.col("z.th"), 6).alias("threshold"),
        F.round(F.col("z.p"), 6).alias("precision_at"),
        F.round(F.col("z.r"), 6).alias("recall_at"),
        F.round(F.col("z.mi"), 6).alias("miss_rate_at"),
        F.round(F.col("z.fo"), 6).alias("fall_out_at"),
    )


# ---------------------------------------------------------------------------
# noisy_* DP aggregates (noisyaggregation/NoisyCountGaussianAggregation.java
# et al.) — VERDICT r1 gap #9.  noise_scale=0 is the exact, oracle-checked
# path (reference semantics: zero noise degenerates to the plain
# aggregate); the seeded-noise path is pytest-verified for determinism
# and distribution shape in tests/test_operators.py.
# ---------------------------------------------------------------------------
@query(
    "agg_noisy_zero_scale",
    oracle="""
SELECT l_returnflag,
       count(*) AS noisy_n,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS noisy_n_disc,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         AS noisy_sum_cents,
       CAST(avg(l_quantity) AS DOUBLE) AS noisy_avg_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_noisy_zero_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """noisy_count/count_if/sum/avg_gaussian with noise_scale=0: the DP
    machinery on its exact path (the only oracle-able one — any real
    noise diverges from DuckDB by construction)."""
    from ..functions.presto import (
        noisy_avg_gaussian,
        noisy_count_gaussian,
        noisy_count_if_gaussian,
        noisy_sum_gaussian,
    )

    l = _t(spark, sf_dir, "lineitem")
    cents = scaled_long(F.col("l_extendedprice"), 100)
    return l.groupBy("l_returnflag").agg(
        noisy_count_gaussian("l_orderkey", 0).alias("noisy_n"),
        noisy_count_if_gaussian(F.col("l_discount") > 0.05, 0).alias("noisy_n_disc"),
        noisy_sum_gaussian(cents, 0).alias("noisy_sum_cents"),
        noisy_avg_gaussian("l_quantity", 0).alias("noisy_avg_qty"),
    )


# ---------------------------------------------------------------------------
# SetDigest (type/setdigest/SetDigest.java, SetDigestFunctions.java):
# make_set_digest / cardinality / jaccard_index / intersection_cardinality
# as the deterministic bottom-k sketch of operators/aggregates.py.
# ---------------------------------------------------------------------------
def _sql_setdigest_parts() -> str:
    from ..operators.aggregates import (
        SET_DIGEST_K,
        sql_digest_cardinality,
        sql_digest_jaccard,
        sql_union_digest,
    )

    jac = sql_digest_jaccard("u", "da", "db")
    return f"""
WITH hashed AS (
  SELECT DISTINCT o_orderpriority AS g, {sql_row_hash('o_custkey')} AS h
  FROM orders
),
ranked AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hashed
),
dig AS (
  SELECT g, list_sort(list(h)) AS digest
  FROM ranked WHERE rn <= {SET_DIGEST_K} GROUP BY g
),
pairs AS (
  SELECT a.g AS d1, b.g AS d2, a.digest AS da, b.digest AS db,
         {sql_union_digest('a.digest', 'b.digest')} AS u
  FROM dig a JOIN dig b ON a.g < b.g
)
SELECT d1, d2,
       {sql_digest_cardinality('da')} AS est1,
       {sql_digest_cardinality('db')} AS est2,
       {jac} AS jaccard,
       CAST(floor(({jac}) * ({sql_digest_cardinality('u')})) AS BIGINT) AS inter_card
FROM pairs
"""


@query("agg_setdigest_jaccard", oracle=_sql_setdigest_parts())
def agg_setdigest_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetDigest parity: per-priority digests of the customer-key set,
    pairwise jaccard_index / intersection_cardinality, and the bottom-k
    cardinality estimator — all accessors on one mergeable sketch.

    The digest build is distinct + WindowGroupLimit bottom-K (bounded
    everywhere — see operators/aggregates.py scale notes); the pair
    stage joins 5 digest rows, so every sketch op is row-local."""
    from ..operators.aggregates import (
        digest_cardinality,
        digest_intersection_cardinality,
        digest_jaccard,
        set_digest,
    )

    o = _t(spark, sf_dir, "orders")
    dig = set_digest(o, ["o_orderpriority"], F.col("o_custkey").cast("string"))
    a = dig.select(F.col("o_orderpriority").alias("d1"), F.col("digest").alias("da"))
    b = dig.select(F.col("o_orderpriority").alias("d2"), F.col("digest").alias("db"))
    pairs = a.join(b, F.col("d1") < F.col("d2"))
    return pairs.select(
        "d1",
        "d2",
        digest_cardinality(F.col("da")).alias("est1"),
        digest_cardinality(F.col("db")).alias("est2"),
        digest_jaccard(F.col("da"), F.col("db")).alias("jaccard"),
        digest_intersection_cardinality(F.col("da"), F.col("db")).alias("inter_card"),
    )


# ---------------------------------------------------------------------------
# KHyperLogLog (type/khyperloglog/KHyperLogLog.java,
# KHyperLogLogFunctions.java): a bottom-K sketch of a field where each
# retained value carries the set of join-key ("UII") values seen with it
# — the uniqueness / reidentification-risk profile.  Deterministic
# re-expression: bottom-K md5 hashes select the sampled field values
# (exactly set_digest's build), a semi join + countDistinct computes each
# sampled value's key cardinality (bounded: K rows), and the accessors
# uniqueness_distribution / reidentification_potential are plain
# aggregations over that K-row table.
# ---------------------------------------------------------------------------
_KHLL_K = 64
_KHLL_HIST = 8  # uniqueness_distribution histogramSize
_KHLL_REID_T = 3  # reidentification_potential threshold


@query(
    "agg_khll_uniqueness",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT o_custkey, {sql_row_hash('o_custkey')} AS h FROM orders
),
sampled AS (
  SELECT o_custkey FROM
    (SELECT o_custkey, row_number() OVER (ORDER BY h) AS rn FROM hashed) t
  WHERE rn <= {_KHLL_K}
),
per_value AS (
  SELECT o.o_custkey, count(DISTINCT o.o_orderkey) AS u
  FROM orders o JOIN sampled s ON o.o_custkey = s.o_custkey
  GROUP BY o.o_custkey
),
k AS (SELECT count(*) AS n FROM per_value)
SELECT least(u, {_KHLL_HIST}) AS uniqueness,
       count(*)::DOUBLE / (SELECT n FROM k) AS weight,
       (SELECT count(*) FROM per_value WHERE u <= {_KHLL_REID_T})::DOUBLE
         / (SELECT n FROM k) AS reid_at_{_KHLL_REID_T}
FROM per_value
GROUP BY 1
""",
)
def agg_khll_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """khyperloglog_agg(o_custkey, o_orderkey) + uniqueness_distribution
    + reidentification_potential as one pipeline: how many customers
    (of a K-sampled sketch) have <=N distinct orders — the join-ability
    / reidentification metric KHLL exists for.

    At 100 TB: the bottom-K sample is orderBy(h).limit(K) ->
    TakeOrderedAndProject (per-partition partial top-K, then a K-row
    merge — the reference's own TopNOperator.java:32 shape).  The
    VERDICT-r2-flagged alternative, row_number() OVER (ORDER BY h) with
    no PARTITION BY, moves EVERY distinct key to one partition; plan
    test test_plans.py::test_khll_sample_avoids_global_window locks the
    fix in.  The per-value cardinality join touches only sampled keys
    (broadcast semi join), and every accessor reads a K-row table."""
    o = _t(spark, sf_dir, "orders")
    hashed = o.select("o_custkey", spark_row_hash(F.col("o_custkey")).alias("h")).distinct()
    sampled = hashed.orderBy("h").limit(_KHLL_K).select("o_custkey")
    per_value = (
        o.join(F.broadcast(sampled), "o_custkey")
        .groupBy("o_custkey")
        .agg(F.countDistinct("o_orderkey").alias("u"))
    )
    k = per_value.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("u") <= _KHLL_REID_T).cast("long")).alias("n_reid"),
    )
    return (
        per_value.groupBy(F.least(F.col("u"), F.lit(_KHLL_HIST)).alias("uniqueness"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(k))
        .select(
            "uniqueness",
            (F.col("cnt").cast("double") / F.col("n")).alias("weight"),
            (F.col("n_reid").cast("double") / F.col("n")).alias(
                f"reid_at_{_KHLL_REID_T}"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KHLL privacy SQL names end-to-end (round 6; KHyperLogLogFunctions.java
# uniquenessDistribution / reidentificationPotential / mergeKhll,
# KHyperLogLog.java:297,312) — VERDICT r5 ask #6.
# ---------------------------------------------------------------------------
_KP_HIST = 8
_KP_T = 3


@query(
    "agg_khll_privacy",
    # The twin's bottom-K selection uses the engine's cross-engine md5
    # 60-bit hash, so DuckDB replicates it bit-for-bit; per-key
    # uniqueness is EXACT in the twin (sorted-distinct uii hashes where
    # the reference keeps an HLL), so at any SF where distinct custkeys
    # per group <= K = 4096 the whole pipeline is exactly oracle-able.
    oracle=f"""
WITH keys AS (
  SELECT o_orderpriority, o_custkey FROM (
    SELECT o_orderpriority, o_custkey,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
    FROM (SELECT DISTINCT o_orderpriority, o_custkey,
                 {sql_row_hash('o_custkey')} AS h FROM orders))
  WHERE rn <= 4096
),
per_key AS (
  SELECT o.o_orderpriority, o.o_custkey,
         count(DISTINCT {sql_row_hash('o.o_orderkey')}) AS u
  FROM orders o
  JOIN keys k ON o.o_orderpriority = k.o_orderpriority
             AND o.o_custkey = k.o_custkey
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       concat_ws(',',
         {", ".join(
             f"CAST(CAST(round(CAST(sum(CASE WHEN least(u, {_KP_HIST}) = {i}"
             f" THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9)"
             " AS DECIMAL(12,9)) AS VARCHAR)"
             for i in range(1, _KP_HIST + 1)
         )}) AS udist,
       round(CAST(sum(CASE WHEN u <= {_KP_T} THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*), 9) AS reid,
       CAST(count(*) AS BIGINT) AS k_keys
FROM per_key
GROUP BY o_orderpriority
""",
)
def agg_khll_privacy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """khyperloglog_agg + uniqueness_distribution +
    reidentification_potential through their SQL NAMES (the round-6
    twins; functions/compat.py): per order priority, how join-able /
    re-identifying is o_custkey against o_orderkey — the privacy gate a
    training-data pipeline runs before releasing a join key.

    At 100 TB: the twin aggregate is a single groupBy whose state is
    capped by the bottom-K construction (K = 4096 keys per group, each
    carrying its distinct-uii set); the accessors are row-local HOFs
    over that bounded map.  Groups whose distinct-pair count exceeds
    the documented cap raise — the two-level shape
    (agg_khll_uniqueness) is the unbounded-cardinality path."""
    from ..dialect import transpile
    from ..functions import register_all

    register_all(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_khllp_orders")
    buckets = ", ".join(
        f"CAST(CAST(round(element_at(ud, CAST({i} AS BIGINT)), 9)"
        " AS DECIMAL(12,9)) AS STRING)"
        for i in range(1, _KP_HIST + 1)
    )
    return spark.sql(
        transpile(
            f"""
WITH sk AS (
  SELECT o_orderpriority, khyperloglog_agg(o_custkey, o_orderkey) AS khll
  FROM _khllp_orders
  GROUP BY o_orderpriority
),
acc AS (
  SELECT o_orderpriority,
         uniqueness_distribution(khll, {_KP_HIST}) AS ud,
         reidentification_potential(khll, {_KP_T}) AS rp,
         size(map_keys(khll)) AS nk
  FROM sk
)
SELECT o_orderpriority,
       concat_ws(',', {buckets}) AS udist,
       round(rp, 9) AS reid,
       CAST(nk AS BIGINT) AS k_keys
FROM acc
"""
        )
    )
