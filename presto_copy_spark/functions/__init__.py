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
    _register_normalize(spark)


def _register_normalize(spark: SparkSession) -> None:
    """SQL-invocable normalize(string[, form]) (StringFunctions.java
    normalize): Unicode normalization has no JVM-side Spark builtin, so
    the four forms register as Arrow-batched pandas UDFs
    (normalize = NFC default; the dialect rewrites the 2-arg
    literal-form call to the per-form name)."""
    from pyspark.sql import functions as F

    def make(form: str):
        # no parameter type hints: `from __future__ import annotations`
        # stringifies them and pandas_udf's hint inference then rejects
        # the signature; the explicit returnType carries the schema
        @F.pandas_udf("string")
        def _norm(s):
            import unicodedata

            return s.map(
                lambda x: None if x is None else unicodedata.normalize(form, x)
            )

        return _norm

    spark.udf.register("normalize", make("NFC"))
    for form in ("nfc", "nfd", "nfkc", "nfkd"):
        spark.udf.register(f"__normalize_{form}", make(form.upper()))
