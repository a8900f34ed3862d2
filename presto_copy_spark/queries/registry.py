"""Central query registry: every implemented operator/query from
SURVEY §2 registers (name, spark_fn, oracle_sql) here.

- spark_fn(spark, sf_dir) -> DataFrame — the Spark-first implementation.
- oracle_sql — equivalent ANSI SQL for the DuckDB oracle (None for ops
  not SQL-expressible; the driver then records a weaker rows-only check).

Determinism contract (driver hashes sorted values): every aggregate /
computed column is aliased identically on both sides; floating-point
aggregates are rounded (sums to 2dp, ratios to 6dp) so partial-agg
ordering differences between Spark and DuckDB can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query implementation + its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all query modules so their registrations run."""
    from . import (  # noqa: F401
        aggregates,
        events,
        functions_sql,
        multimodal,
        relational,
        similarity,
        text,
        tpch,
        tpch_extra,
        windows,
    )
