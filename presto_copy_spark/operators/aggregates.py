"""Distributed aggregate operators for per-group value statistics.

These are the scale-out forms of the collect_list-based helpers in
functions/presto.py: instead of materializing a group's values into one
array (bounded by executor memory), they push the counting into a
groupBy (map-side partial aggregation, spillable) and take top-k with a
WindowGroupLimit — the same PARTIAL/FINAL + grouped-TopN structure
Presto plans for approx_most_frequent / histogram
(operator/aggregation/approxmostfrequent/ApproximateMostFrequent.java:69,
operator/aggregation/histogram/Histogram.java:48,
InMemoryGroupedTopNBuilder.java:61).

At 100 TB: two shuffles — (group, value) count, then top-k per group —
both on high-cardinality composite keys; no per-group array ever
exceeds k entries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_values", "value_histogram"]


def top_k_values(
    df: DataFrame, group_cols: list[str], value_col: str, k: int
) -> DataFrame:
    """Exact per-group top-k most frequent values (deterministic
    tie-break on value) -> (group_cols..., value, cnt, rnk).

    The distributed approx_most_frequent: exact because counting is a
    full groupBy; 'approx' in Presto only buys bounded memory, which the
    two-shuffle shape already guarantees.
    """
    counted = (
        df.groupBy(*group_cols, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("cnt").desc(), F.col("value"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def value_histogram(
    df: DataFrame, group_cols: list[str], value_expr: Column, buckets: int, lo: float, hi: float
) -> DataFrame:
    """Fixed-bucket numeric histogram per group -> one row per non-empty
    bucket (numeric_histogram's distributed form; NumericHistogram.java).
    """
    b = F.width_bucket(value_expr, F.lit(lo), F.lit(hi), F.lit(buckets))
    return (
        df.groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
