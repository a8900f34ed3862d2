"""Cluster-posture parity: AQE + runtime bloom filters ON must produce
the same results as the local-off default.

session.py defaults spark.sql.adaptive.enabled and the runtime bloom
filter OFF on local[...] masters (their per-stage job materialization
dominates sub-second runs) while any cluster master keeps both ON —
which means the shipped cluster posture would otherwise never be
exercised by the suite.  Both flags are runtime-settable, so this test
runs one representative query per plan family under each posture and
asserts row-for-row equality: runtime re-planning (join-strategy
switch, partition coalescing, skew splitting, semi-join reduction) must
be a pure physical concern.
"""

from __future__ import annotations

import pytest

from presto_copy_spark.queries import registry

registry.load_all()

# one per family: multi-join + agg (broadcast/shuffle choices), big
# two-sided join (SMJ/SHJ/AQE switch), distinct-heavy agg, LSH
# band-join dedup, window
_REPRESENTATIVE = [
    "tpch_q05",
    "tpch_q18",
    "tpch_q16",
    "dedup_minhash_lsh",
    "win_topn_row_number",
]

_TOGGLES = [
    "spark.sql.adaptive.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
]


def _rows(spark, name, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_aqe_on_matches_local_default(spark, sf_dir, name):
    prev = {k: spark.conf.get(k) for k in _TOGGLES}
    try:
        baseline = _rows(spark, name, sf_dir)
        for k in _TOGGLES:
            spark.conf.set(k, "true")
        adaptive = _rows(spark, name, sf_dir)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert adaptive == baseline and baseline
