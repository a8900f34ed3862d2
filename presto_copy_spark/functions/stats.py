"""Statistical CDF scalar family (MathFunctions.java:225-1020):
{normal, beta, cauchy, chi_squared, f, gamma, laplace, poisson,
weibull, binomial}_cdf and the inverse_* forms, registered as
SQL-invocable vectorized pandas UDFs.

The reference delegates to Apache Commons Math distributions; no JVM
twin exists in Spark, so the special functions are implemented here
from the standard public algorithms (regularized incomplete gamma via
series + Lentz continued fraction, regularized incomplete beta via the
Lentz continued fraction — the textbook formulations, e.g. Numerical
Recipes §6.2, DLMF 8.9/8.17) on top of stdlib ``math``.  Accuracy is
~1e-12 relative in the tested domain (tests/test_stats_functions.py checks
identities: CDF/inverse round-trips, symmetry, closed-form cases).

These are Arrow-batched Python UDFs — OFF the hot path by design
(statistical post-analysis, not per-row ETL); everything operates on
pandas Series per batch, never per row on the driver.
"""

from __future__ import annotations

import math

__all__ = ["register_stats_sql", "CDF_IMPLS"]

_EPS = 1e-15
_MAX_ITER = 300


# ---- special functions ----------------------------------------------------
def _gammainc_lower_reg(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 0.0
    if x < a + 1:
        # series expansion
        term = 1.0 / a
        total = term
        n = a
        for _ in range(_MAX_ITER):
            n += 1
            term *= x / n
            total += term
            if abs(term) < abs(total) * _EPS:
                break
        return total * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q(a, x) (modified Lentz)
    b = x + 1.0 - a
    c = 1.0 / 1e-30
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < 1e-30:
            d = 1e-30
        c = b + an / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


def _betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the Lentz continued
    fraction (converges fast for x < (a+1)/(a+b+2); symmetry otherwise)."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1) / (a + b + 2):
        return front * _beta_cf(a, b, x) / a
    return 1.0 - front * _beta_cf(b, a, 1 - x) / b


def _beta_cf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-30:
        d = 1e-30
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def _bisect(f, lo: float, hi: float, p: float, iters: int = 200) -> float:
    """Monotone-CDF inversion by bisection (robust, ~1e-15 after 200)."""
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if mid == lo or mid == hi:
            break
        if f(mid) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


# ---- CDFs (Presto argument orders, MathFunctions.java) --------------------
def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def normal_cdf(mean: float, sd: float, value: float) -> float:
    _check(sd > 0, "standardDeviation must be > 0")
    return 0.5 * (1.0 + math.erf((value - mean) / (sd * math.sqrt(2.0))))


def inverse_normal_cdf(mean: float, sd: float, p: float) -> float:
    _check(0 < p < 1, "p must be 0 > p > 1")
    _check(sd > 0, "standardDeviation must be > 0")
    # bisection on erf around mean +- 20 sd covers all representable p
    return _bisect(lambda x: normal_cdf(mean, sd, x), mean - 40 * sd, mean + 40 * sd, p)


def beta_cdf(a: float, b: float, value: float) -> float:
    _check(a > 0 and b > 0, "alpha and beta must be > 0")
    _check(0 <= value <= 1, "value must be in the interval [0, 1]")
    return _betainc_reg(a, b, value)


def inverse_beta_cdf(a: float, b: float, p: float) -> float:
    _check(a > 0 and b > 0, "alpha and beta must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    return _bisect(lambda x: _betainc_reg(a, b, x), 0.0, 1.0, p)


def cauchy_cdf(median: float, scale: float, value: float) -> float:
    _check(scale > 0, "scale must be > 0")
    return 0.5 + math.atan((value - median) / scale) / math.pi


def inverse_cauchy_cdf(median: float, scale: float, p: float) -> float:
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    _check(scale > 0, "scale must be > 0")
    return median + scale * math.tan(math.pi * (p - 0.5))


def chi_squared_cdf(df: float, value: float) -> float:
    _check(df > 0, "df must be > 0")
    _check(value >= 0, "value must non-negative")
    return _gammainc_lower_reg(df / 2.0, value / 2.0)


def inverse_chi_squared_cdf(df: float, p: float) -> float:
    _check(df > 0, "df must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    hi = max(10.0, df) * 100
    return _bisect(lambda x: chi_squared_cdf(df, x), 0.0, hi, p)


def f_cdf(df1: float, df2: float, value: float) -> float:
    _check(df1 > 0 and df2 > 0, "numerator and denominator df must be > 0")
    _check(value >= 0, "value must non-negative")
    return _betainc_reg(df1 / 2.0, df2 / 2.0, df1 * value / (df1 * value + df2))


def inverse_f_cdf(df1: float, df2: float, p: float) -> float:
    _check(df1 > 0 and df2 > 0, "numerator and denominator df must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    return _bisect(lambda x: f_cdf(df1, df2, x), 0.0, 1e8, p)


def gamma_cdf(shape: float, scale: float, value: float) -> float:
    _check(shape > 0 and scale > 0, "shape and scale must be > 0")
    _check(value >= 0, "value must be >= 0")
    return _gammainc_lower_reg(shape, value / scale)


def inverse_gamma_cdf(shape: float, scale: float, p: float) -> float:
    _check(shape > 0 and scale > 0, "shape and scale must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    hi = scale * max(10.0, shape) * 100
    return _bisect(lambda x: gamma_cdf(shape, scale, x), 0.0, hi, p)


def laplace_cdf(mean: float, scale: float, value: float) -> float:
    _check(scale > 0, "scale must be > 0")
    z = (value - mean) / scale
    return 0.5 * math.exp(z) if z <= 0 else 1.0 - 0.5 * math.exp(-z)


def inverse_laplace_cdf(mean: float, scale: float, p: float) -> float:
    _check(scale > 0, "scale must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    if p == 0:
        return float("-inf")
    if p == 1:
        return float("inf")
    return (
        mean + scale * math.log(2 * p)
        if p <= 0.5
        else mean - scale * math.log(2 * (1 - p))
    )


def poisson_cdf(lam: float, value: int) -> float:
    _check(lam > 0, "lambda must be greater than 0")
    _check(value >= 0, "value must be a non-negative integer")
    # P(X <= k) = Q(k+1, lambda) (regularized upper incomplete gamma)
    return 1.0 - _gammainc_lower_reg(value + 1.0, lam)


def inverse_poisson_cdf(lam: float, p: float) -> int:
    _check(lam > 0, "lambda must be greater than 0")
    _check(0 <= p < 1, "p must be in the interval [0, 1)")
    k = 0
    while poisson_cdf(lam, k) < p:
        k += 1
    return k


def weibull_cdf(a: float, b: float, value: float) -> float:
    _check(a > 0 and b > 0, "a and b must be > 0")
    if value <= 0:
        return 0.0
    return 1.0 - math.exp(-((value / b) ** a))


def inverse_weibull_cdf(a: float, b: float, p: float) -> float:
    _check(a > 0 and b > 0, "a and b must be > 0")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    return b * (-math.log1p(-p)) ** (1.0 / a)


def inverse_binomial_cdf(trials: int, success_p: float, p: float) -> int:
    _check(0 <= success_p <= 1, "successProbability must be in the interval [0, 1]")
    _check(0 <= p <= 1, "p must be in the interval [0, 1]")
    _check(trials > 0, "numberOfTrials must be greater than 0")
    k = 0
    while k < trials and binomial_cdf(trials, success_p, k) < p:
        k += 1
    return k


def binomial_cdf(trials: int, success_p: float, value: int) -> float:
    _check(0 <= success_p <= 1, "successProbability must be in the interval [0, 1]")
    _check(trials > 0, "numberOfTrials must be greater than 0")
    if value < 0:
        return 0.0
    if value >= trials:
        return 1.0
    # P(X <= k) = I_{1-p}(n-k, k+1)
    return _betainc_reg(trials - value, value + 1.0, 1.0 - success_p)


# name -> (python impl, spark arg types, return type)
CDF_IMPLS = {
    "normal_cdf": (normal_cdf, ("double", "double", "double"), "double"),
    "inverse_normal_cdf": (inverse_normal_cdf, ("double", "double", "double"), "double"),
    "beta_cdf": (beta_cdf, ("double", "double", "double"), "double"),
    "inverse_beta_cdf": (inverse_beta_cdf, ("double", "double", "double"), "double"),
    "cauchy_cdf": (cauchy_cdf, ("double", "double", "double"), "double"),
    "inverse_cauchy_cdf": (inverse_cauchy_cdf, ("double", "double", "double"), "double"),
    "chi_squared_cdf": (chi_squared_cdf, ("double", "double"), "double"),
    "inverse_chi_squared_cdf": (inverse_chi_squared_cdf, ("double", "double"), "double"),
    "f_cdf": (f_cdf, ("double", "double", "double"), "double"),
    "inverse_f_cdf": (inverse_f_cdf, ("double", "double", "double"), "double"),
    # the reference's annotation spells this one WITHOUT the underscore
    # (StatisticalFunctions.java inverseFCdf -> "inverse_fcdf"); both
    # names register to the same implementation
    "inverse_fcdf": (inverse_f_cdf, ("double", "double", "double"), "double"),
    "gamma_cdf": (gamma_cdf, ("double", "double", "double"), "double"),
    "inverse_gamma_cdf": (inverse_gamma_cdf, ("double", "double", "double"), "double"),
    "laplace_cdf": (laplace_cdf, ("double", "double", "double"), "double"),
    "inverse_laplace_cdf": (inverse_laplace_cdf, ("double", "double", "double"), "double"),
    "poisson_cdf": (poisson_cdf, ("double", "long"), "double"),
    "inverse_poisson_cdf": (inverse_poisson_cdf, ("double", "double"), "long"),
    "weibull_cdf": (weibull_cdf, ("double", "double", "double"), "double"),
    "inverse_weibull_cdf": (inverse_weibull_cdf, ("double", "double", "double"), "double"),
    "binomial_cdf": (binomial_cdf, ("long", "double", "long"), "double"),
    "inverse_binomial_cdf": (
        inverse_binomial_cdf,
        ("long", "double", "double"),
        "long",
    ),
}


def register_stats_sql(spark) -> None:
    """Register the CDF family as vectorized pandas UDFs (one Arrow
    batch per call; per-element math is C-speed stdlib)."""
    from pyspark.sql import functions as F

    def make(fn, ret):
        @F.pandas_udf(ret)
        def _udf(*cols):
            import pandas as pd

            # literal args arrive as decimal.Decimal through Arrow;
            # the math is double-domain (Presto signatures), so coerce
            out = [
                None
                if any(v is None for v in vals)
                else fn(*[float(v) for v in vals])
                for vals in zip(*cols)
            ]
            return pd.Series(out)

        return _udf

    for name, (fn, _args, ret) in CDF_IMPLS.items():
        spark.udf.register(name, make(fn, ret))
