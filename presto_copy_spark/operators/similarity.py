"""Vector-similarity primitives over ``array<float>`` embedding columns.

Everything is expressed with Spark higher-order functions
(``zip_with``/``aggregate``/``transform``) so the math runs JVM-side
inside whole-stage codegen — no Python UDFs, no driver-side collection;
at 100 TB the vectors never leave the executors.

Cross-engine determinism: dot products / norms are accumulated as
**quantized integers** — ``floor(x*y*1e9)`` per element, summed as
BIGINT — so accumulation order can't change a bit (float sums are
order-dependent; Spark's partial aggregation vs DuckDB's serial loop
would diverge in the last ulp).  floor (not round) avoids tie-breaking
ambiguity between engines.  With unit-norm 64-dim vectors the
quantization error on cosine is <1e-7.

Reference analogue: Presto's cosine_similarity(map,map) scalar
(presto-main/.../scalar/MathFunctions.java cosineSimilarity); the ANN /
IVF / LSH operators are the §"beyond the reference" training-pipeline
surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QSCALE = 1_000_000_000  # dot-product quantization
CSCALE = 1_000_000  # centroid-coordinate quantization


def qdot(a: Column, b: Column) -> Column:
    """Quantized dot product: sum of floor(a_i*b_i*1e9) as BIGINT."""
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * QSCALE).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_qdot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> CAST(floor(z[1]::DOUBLE * z[2]::DOUBLE * {QSCALE}) AS BIGINT))) AS BIGINT)"
    )


def cosine_from_q(dotq: Column, n1q: Column, n2q: Column) -> Column:
    """Cosine from quantized dot + self-dots (all BIGINT, scale 1e9)."""
    s = float(QSCALE)
    return dotq.cast("double") / s / (
        F.sqrt(n1q.cast("double") / s) * F.sqrt(n2q.cast("double") / s)
    )


def sql_cosine_from_q(dotq: str, n1q: str, n2q: str) -> str:
    s = f"{QSCALE}.0"
    return (
        f"(({dotq})::DOUBLE / {s}) / "
        f"(sqrt(({n1q})::DOUBLE / {s}) * sqrt(({n2q})::DOUBLE / {s}))"
    )


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket: bit b = sign of coordinate b (axis-aligned
    hyperplanes — deterministic, engine-portable; production would use
    seeded random hyperplanes via a stored projection matrix)."""
    out = F.lit(0)
    for b in range(n_bits):
        out = out + F.when(F.element_at(vec, b + 1) >= 0, F.lit(1 << b)).otherwise(0)
    return out


def sql_sign_bucket(vec: str, n_bits: int = 8) -> str:
    return (
        "("
        + " + ".join(f"CASE WHEN {vec}[{b + 1}] >= 0 THEN {1 << b} ELSE 0 END" for b in range(n_bits))
        + ")"
    )
