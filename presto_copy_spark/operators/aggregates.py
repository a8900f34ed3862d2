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

__all__ = [
    "top_k_values",
    "value_histogram",
    "SET_DIGEST_K",
    "set_digest",
    "merge_set_digests",
    "union_digest",
    "digest_cardinality",
    "digest_jaccard",
    "digest_intersection_cardinality",
]


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


# ---- SetDigest (bottom-k MinHash sketch) ----------------------------------
# Presto's SetDigest type (presto-main type/setdigest/SetDigest.java,
# scalar/aggregation SetDigestFunctions.java) pairs an HLL with a MinHash
# sketch to support make_set_digest / merge / cardinality /
# intersection_cardinality / jaccard_index.  This is the deterministic
# re-expression: a digest is the sorted array of the K smallest distinct
# 60-bit md5-derived hashes (a bottom-k sketch, Cohen/Kaplan "Summarizing
# data using bottom-k sketches", PODC'07).  Arrays of <=K longs are
# mergeable (union -> K smallest), give the classic (K-1)/v_K cardinality
# estimator, and — unlike HLL registers — are bit-identical across
# engines, so every accessor below has a literal DuckDB oracle twin.
#
# At 100 TB: the build is distinct(group, h) -> per-group bottom-K via
# row_number (Spark plans a WindowGroupLimit: each map task keeps only K
# rows per group before the exchange), then one bounded collect_list of
# <=K values; merges flatten <=K-long arrays.  No unbounded per-group
# state anywhere.
SET_DIGEST_K = 32
_HASH_SPACE = float(1 << 60)  # hash60 values are uniform on [0, 2^60)


def set_digest(
    df: DataFrame, group_cols: list[str], value: Column, k: int = SET_DIGEST_K
) -> DataFrame:
    """make_set_digest(value) GROUP BY group_cols -> (group..., digest)."""
    from .text import hash60

    hashed = df.select(*group_cols, hash60(value).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("digest"))
    )


def merge_set_digests(
    df: DataFrame, group_cols: list[str], digest_col: str = "digest", k: int = SET_DIGEST_K
) -> DataFrame:
    """merge(setdigest) rollup to a coarser grouping (bounded: inputs <=K)."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(digest_col)))), 1, k
    )
    return df.groupBy(*group_cols).agg(merged.alias("digest"))


def union_digest(a: Column, b: Column, k: int = SET_DIGEST_K) -> Column:
    """Digest of the union of two digested sets (row-local merge)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def digest_cardinality(d: Column, k: int = SET_DIGEST_K) -> Column:
    """cardinality(setdigest): exact below K, else the bottom-k estimator
    (K-1) * 2^60 / v_K with v_K the largest retained hash."""
    n = F.size(d)
    est = F.floor(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.element_at(d, k).cast("double")
    ).cast("long")
    return F.when(n < k, n.cast("long")).otherwise(est)


def digest_jaccard(a: Column, b: Column, k: int = SET_DIGEST_K) -> Column:
    """jaccard_index(a, b): fraction of the union's bottom-k sketch present
    in both input sketches — the standard bottom-k Jaccard estimator."""
    u = union_digest(a, b, k)
    inter = F.size(F.array_intersect(F.array_intersect(u, a), b))
    return inter.cast("double") / F.size(u).cast("double")


def digest_intersection_cardinality(
    a: Column, b: Column, k: int = SET_DIGEST_K
) -> Column:
    """intersection_cardinality(a, b) = floor(jaccard * |a U b| estimate)."""
    u = union_digest(a, b, k)
    return F.floor(digest_jaccard(a, b, k) * digest_cardinality(u, k).cast("double")).cast(
        "long"
    )


def sql_digest_cardinality(d: str, k: int = SET_DIGEST_K) -> str:
    """DuckDB twin of digest_cardinality."""
    return (
        f"CASE WHEN len({d}) < {k} THEN len({d}) "
        f"ELSE CAST(floor({float(k - 1)} * {_HASH_SPACE} / CAST({d}[{k}] AS DOUBLE)) AS BIGINT) END"
    )


def sql_union_digest(a: str, b: str, k: int = SET_DIGEST_K) -> str:
    return f"list_slice(list_sort(list_distinct({a} || {b})), 1, {k})"


def sql_digest_jaccard(u: str, a: str, b: str) -> str:
    """DuckDB twin of digest_jaccard over a precomputed union sketch u."""
    return (
        f"len(list_intersect(list_intersect({u}, {a}), {b}))::DOUBLE / len({u})::DOUBLE"
    )
