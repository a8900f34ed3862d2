"""Presto-compatibility function layer (SURVEY §2.9).

- compat.py — Presto-named scalar functions as Spark SQL UDFs (inlined
  into Catalyst plans; JVM-side).
- presto.py — Column helpers for functions whose argument conventions
  need build-time translation (datetime unit-first args, MySQL formats)
  and Presto-named aggregates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .compat import SQL_UDFS, register_sql_udfs
from .geometry import register_geometry_sql
from .ml_sql import register_ml_sql
from . import presto

__all__ = ["register_all", "SQL_UDFS", "presto"]


def register_all(spark: SparkSession) -> None:
    register_sql_udfs(spark)
    register_ml_sql(spark)
    register_geometry_sql(spark)
