"""Catalog bootstrap: register the driver's Parquet fixtures as tables.

Reference analogue: Presto's connector metadata + ``TableScanOperator``
(presto-main/.../operator/TableScanOperator.java:51) pulling splits from a
connector.  On Spark the scan is ``spark.read.parquet`` — predicate
pushdown, column pruning and partition pruning are Catalyst-native, so
registering a temp view over the Parquet path is the whole connector.

At 100 TB these would be external tables over partitioned directories
(ideally with collected stats for CBO); the API shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "default_sf_dir", "register_tables", "load_table"]

# All driver fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing types Spark can't scan natively.

    events.parquet carries TIMESTAMP(NANOS) which the Spark parquet reader
    rejects (PARQUET_TYPE_ILLEGAL); read nanos as long (runtime-settable
    conf, works on any SparkSession incl. the driver's) and convert to a
    proper TimestampType in the plan.

    Plans are cached per (session, sf_dir, table) — DataFrames are
    immutable logical plans, so handing the same object to every query is
    safe and skips the repeated parquet footer read + py4j round-trips
    (~0.1-0.3 s of fixed cost per query at bench time).  The cache dict
    lives on the Python session object, so it dies with the session.
    """
    cache: dict[tuple[str, str], DataFrame] = spark.__dict__.setdefault(
        "_pcs_plan_cache", {}
    )
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and field.dataType.simpleString() == "bigint":
            from pyspark.sql import functions as F

            # integer div: double division would lose precision (nanos ~1.7e18 > 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    cache[key] = df
    return df


def register_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the DataFrames."""
    sf_dir = sf_dir or default_sf_dir()
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
