"""Unit invariants for operator-level primitives (no Spark needed)."""

import itertools

from presto_copy_spark.operators.similarity import SIGN_BITS, _sign_matrix


def test_sign_matrix_rows_distinct_and_balanced():
    """Regression for the power-of-two-LCG low-bit trap: x & 1 alternates
    with period 2, which made all 16 hyperplane rows identical and
    collapsed the 2^16 bucket space to {0, 65535}."""
    m = _sign_matrix()
    assert len({tuple(r) for r in m}) == SIGN_BITS  # all rows distinct
    for row in m:
        assert abs(sum(row)) <= len(row) // 2  # roughly balanced +/-
    # hyperplanes should be near-orthogonal, not copies of each other
    for a, b in itertools.combinations(m, 2):
        corr = abs(sum(x * y for x, y in zip(a, b))) / len(a)
        assert corr < 0.6
