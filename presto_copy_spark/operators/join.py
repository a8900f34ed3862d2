"""Skew-mitigation join operators.

Spark's AQE skew-join (enabled in session.py) splits oversized shuffle
partitions at runtime, but only for sort-merge joins and only after the
skewed partition materializes.  Explicit salting is the planned-ahead
form a pipeline uses when it KNOWS a key is hot (null-heavy foreign
keys, celebrity users, stop-shingles): spread the fact side across
``n_salt`` sub-keys and replicate the dimension side once per sub-key,
so the hot key's rows land on ``n_salt`` tasks instead of one.

Reference analogue: Presto handles this with bucketed execution and
``spark.pushdown_filter``-era skewed-bucket hints; the reference's
presto-spark runner relies on the same explicit repartitioning idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_join", "asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols``
    from the latest right row with ``right.on <= left.on`` within the
    same ``by`` group (NULLs when no prior right row exists) — the
    time-series lookup DuckDB spells ``ASOF JOIN`` and kdb calls aj.

    NOT a join in the plan: both inputs union into one stream, ONE
    shuffle on ``by`` sorts each group by (on, side), and
    ``last_value(ignoreNulls)`` over an unbounded-preceding frame
    carries the latest right values forward onto left rows.  Compare
    the naive range self-join, which explodes to O(|L|·|R|) per group
    before taking max(ts): this is O(|L|+|R|) rows through exactly one
    exchange at any scale.  Right rows sort BEFORE left rows at equal
    ``on`` so ties match (>= semantics, like ASOF's default).
    """
    rc = [f"{c}{suffix}" for c in right_cols]
    l_tag = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n) for c, n in zip(right_cols, rc)],
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, rc)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*", *[F.last(n, ignorenulls=True).over(w).alias(f"_c_{n}") for n in rc]
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side", *rc)
        .select(
            *by, on,
            *[F.col(c) for c in left.columns if c not in by and c != on],
            *[F.col(f"_c_{n}").alias(n) for n in rc],
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` and ``dim`` on column ``on`` with an ``n_salt``-way
    salt: fact rows get a deterministic salt in [0, n_salt), dim rows
    are replicated once per salt value, and the equi-join runs on
    (on, salt) — identical results to the plain join, but a key with f
    rows shuffles into n_salt partitions of f/n_salt instead of one.

    Cost model: dim is replicated n_salt times through the shuffle, so
    pick n_salt ~ (hot-key rows / target partition rows) and keep the
    dim side the smaller input.  Supports inner and left joins (outer
    dim replication would need de-dup on the probe side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    # xxhash64 over the key plus a per-row spread column would collapse
    # for a single hot key — spread must be row-local randomness that is
    # still reproducible: rand(seed) is seeded per-partition.
    fact_s = fact.withColumn("_salt", F.floor(F.rand(42) * n_salt).cast("int"))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    out = fact_s.join(dim_s, [on, "_salt"], how)
    return out.drop("_salt")
