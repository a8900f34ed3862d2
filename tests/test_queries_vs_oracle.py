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


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
