"""Round-8 sketch-introspection scalars: sketch_theta_summary
(ThetaSketchFunctions.java:57) and hash_counts
(type/setdigest/SetDigestFunctions.java:81) over the engine's
Datasketches compact-theta twins.

The layout parser (functions/sketch_layout.py) is validated
ENTRY-FOR-ENTRY against the JVM datasketches library itself
(CompactSketch.wrap via py4j on the driver) across every regime the
writer emits: v3 single-item, v4 exact, v4 at the nominal-entries
boundary, v4 estimation mode.  The exact regime is the oracled
contract; estimation-mode bounds use the documented normal
approximation of BinomialBoundsN (asserted within 0.2% of the JVM's
own getUpperBound/getLowerBound at n=100k).
"""

from __future__ import annotations

import pytest

from presto_copy_spark.functions.sketch_layout import (
    parse_compact_theta,
    theta_hash_counts,
    theta_summary,
)


def _jvm_truth(spark, raw: bytes):
    jvm = spark.sparkContext._jvm
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytes(raw))
    sk = jvm.org.apache.datasketches.theta.CompactSketch.wrap(mem)
    it = sk.iterator()
    hashes = []
    while it.next():
        hashes.append(it.get())
    return (
        sk.getEstimate(),
        sk.getTheta(),
        sk.getUpperBound(1),
        sk.getLowerBound(1),
        sk.getRetainedEntries(),
        sorted(hashes),
    )


@pytest.mark.parametrize(
    "n,regime",
    [(1, "v3-single"), (3, "v4-tiny"), (100, "v4-exact"),
     (4096, "v4-boundary"), (100000, "v4-estimation")],
)
def test_theta_parser_matches_jvm_library(spark, n, regime):
    raw = bytes(
        spark.sql(f"SELECT theta_sketch_agg(x) s FROM range({n}) t(x)")
        .collect()[0]
        .s
    )
    est, theta, ub, lb, ret, jvm_hashes = _jvm_truth(spark, raw)
    p_theta, p_hashes = parse_compact_theta(raw)
    assert sorted(p_hashes) == jvm_hashes
    assert abs(p_theta - theta) < 1e-12
    s_est, s_theta, s_ub, s_lb, s_ret = theta_summary(raw)
    assert s_ret == ret and abs(s_est - est) < 1e-6 * max(est, 1)
    if theta >= 1.0:
        # exact regime: the full summary row is EXACTLY the JVM's
        assert (s_est, s_ub, s_lb) == (est, ub, lb)
    else:
        # estimation: documented normal approximation of BinomialBoundsN
        assert abs(s_ub - ub) / ub < 0.002
        assert abs(s_lb - lb) / lb < 0.002
    hc = theta_hash_counts(raw)
    assert sorted(hc) == jvm_hashes
    assert set(hc.values()) <= {1}


def test_sketch_introspection_sql_surface(spark):
    """End-to-end through the registered UDFs: hash_counts keys must be
    exactly the retained set (so jaccard over hash_counts keys equals
    the reference's minhash-set semantics), and the summary row in the
    exact regime must read (n, 1.0, n, n, n)."""
    row = spark.sql(
        "SELECT sketch_theta_summary(s) AS summ, hash_counts(s) AS hc"
        " FROM (SELECT theta_sketch_agg(x) AS s FROM range(100) t(x))"
    ).collect()[0]
    assert row.summ.estimate == 100.0
    assert row.summ.theta == 1.0
    assert row.summ.upper_bound_std == 100.0
    assert row.summ.lower_bound_std == 100.0
    assert row.summ.retained_entries == 100
    assert len(row.hc) == 100 and set(row.hc.values()) == {1}

    # exact-regime set semantics over the hash map: |keys(A) ∩ keys(B)|
    # equals the true overlap — SetDigest's hash_counts contract.
    # (conditional aggregation, not two range() scalar subqueries: a
    # range() scalar subquery under an ArrowEvalPython consumer hits a
    # Spark RangeExec.numSlices NPE on the task thread)
    r = spark.sql(
        "SELECT map_keys(hash_counts(a)) AS ka, map_keys(hash_counts(b)) AS kb"
        " FROM (SELECT"
        "  theta_sketch_agg(CASE WHEN id < 1000 THEN id END) AS a,"
        "  theta_sketch_agg(CASE WHEN id >= 500 THEN id END) AS b"
        " FROM range(0, 1500))"
    ).collect()[0]
    assert len(set(r.ka) & set(r.kb)) == 500

    # null in -> null map / all-null struct row
    nulls = spark.sql(
        "SELECT hash_counts(CAST(NULL AS BINARY)) AS hc,"
        " sketch_theta_summary(CAST(NULL AS BINARY)) AS summ"
    ).collect()[0]
    assert nulls.hc is None
    assert nulls.summ is None or nulls.summ.estimate is None


def test_sketch_names_transpile(spark):
    """The two names must no longer raise PrestoFeatureUnsupportedError
    (round-8 removal from _SKETCH_UNSUPPORTED) and must survive the
    dialect pass-through to the registered UDFs."""
    from presto_copy_spark import dialect

    assert "sketch_theta_summary" not in dialect._SKETCH_UNSUPPORTED
    assert "hash_counts" not in dialect._SKETCH_UNSUPPORTED
    t = dialect.transpile("SELECT sketch_theta_summary(x), hash_counts(x) FROM t")
    assert "sketch_theta_summary" in t.lower()
    assert "hash_counts" in t.lower()
