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
from .stats import register_stats_sql
from . import presto

__all__ = ["register_all", "SQL_UDFS", "presto"]


def register_all(spark: SparkSession) -> None:
    register_sql_udfs(spark)
    register_ml_sql(spark)
    register_geometry_sql(spark)
    register_stats_sql(spark)
    _register_normalize(spark)
    _register_binary_py(spark)


def _register_binary_py(spark: SparkSession) -> None:
    """Binary functions with no JVM-side Spark expression
    (BinaryFunctions.java to/fromIEEE754, hmacSha*/hmacMd5;
    IpPrefixFunctions.java isPrivateIp): Arrow-batched pandas UDFs over
    stdlib struct/hmac/ipaddress — off the hot path by design."""
    from pyspark.sql import functions as F

    def _pdudf(ret, fn):
        @F.pandas_udf(ret)
        def _udf(*cols):
            import pandas as pd

            return pd.Series(
                [
                    None if any(v is None for v in vals) else fn(*vals)
                    for vals in zip(*cols)
                ]
            )

        return _udf

    import hmac as _hmac
    import ipaddress as _ip
    import struct as _struct

    spark.udf.register(
        "to_ieee754_64", _pdudf("binary", lambda x: _struct.pack(">d", float(x)))
    )
    spark.udf.register(
        "from_ieee754_64", _pdudf("double", lambda b: _struct.unpack(">d", bytes(b))[0])
    )
    spark.udf.register(
        "to_ieee754_32", _pdudf("binary", lambda x: _struct.pack(">f", float(x)))
    )
    spark.udf.register(
        "from_ieee754_32", _pdudf("double", lambda b: float(_struct.unpack(">f", bytes(b))[0]))
    )
    for alg in ("md5", "sha1", "sha256", "sha512"):
        spark.udf.register(
            f"hmac_{alg}",
            _pdudf(
                "binary",
                lambda b, k, _alg=alg: _hmac.new(bytes(k), bytes(b), _alg).digest(),
            ),
        )
    spark.udf.register(
        "is_private_ip",
        _pdudf(
            "boolean",
            # RFC1918/4193 + loopback + link-local, both families — the
            # range list IpPrefixFunctions.java carries is what stdlib
            # ipaddress classifies via is_private/is_loopback/is_link_local
            lambda s: (lambda a: a.is_private or a.is_loopback or a.is_link_local)(
                _ip.ip_address(s)
            ),
        ),
    )


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
