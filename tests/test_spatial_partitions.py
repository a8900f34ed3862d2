"""Round-8 spatial_partitions twin (GeoFunctions.java:1195/:1210,
KdbTree.findIntersectingLeaves, KdbTreeType.java) + the KdbTree-
partitioned distance join (ExtractSpatialJoins.java:655 shape).

The test tree is a hand-built 2-level KdbTree over [0,10]x[0,5]:

    root ── left  (x < 5) ── leaf0 (0,0,5,2.5)
        │                └── leaf1 (0,2.5,5,5)
        └── right (x >= 5) ── leaf2 (5,0,10,2.5)
                          └── leaf3 (5,2.5,10,5)

Expected outputs are hand-derived from the reference's two rules:
leaf extents EXCLUDE their top/right boundaries (xMin <= env.xMax AND
xMax > env.xMin AND ...), and leaves are emitted in the findLeaves
stack order (left pushed before right => right subtree first =>
[3, 2, 1, 0])."""

from __future__ import annotations

import json

import pytest

from presto_copy_spark.dialect import transpile
from presto_copy_spark.functions.geometry import kdb_tree_leaves


def _node(x0, y0, x1, y1, leaf=None, left=None, right=None):
    n = {"extent": {"xMin": x0, "yMin": y0, "xMax": x1, "yMax": y1}}
    if leaf is not None:
        n["leafId"] = leaf
    else:
        n["left"], n["right"] = left, right
    return n


TREE = json.dumps(
    {
        "root": _node(
            0, 0, 10, 5,
            left=_node(
                0, 0, 5, 5,
                left=_node(0, 0, 5, 2.5, leaf=0),
                right=_node(0, 2.5, 5, 5, leaf=1),
            ),
            right=_node(
                5, 0, 10, 5,
                left=_node(5, 0, 10, 2.5, leaf=2),
                right=_node(5, 2.5, 10, 5, leaf=3),
            ),
        )
    }
)


def test_kdb_tree_leaves_traversal_order():
    leaves = kdb_tree_leaves(TREE)
    assert [l[0] for l in leaves] == [3, 2, 1, 0]
    assert leaves[3] == (0, 0.0, 0.0, 5.0, 2.5)


def _sp(spark, wkt, distance=None):
    d = "" if distance is None else f", {distance}"
    sql = transpile(
        f"SELECT spatial_partitions(CAST('{TREE}' AS KdbTree),"
        f" ST_GeometryFromText('{wkt}'){d}) AS p"
    )
    return spark.sql(sql + " FROM (SELECT 1)").collect()[0].p


def test_spatial_partitions_reference_semantics(spark):
    # interior point -> its single leaf
    assert _sp(spark, "POINT (1 1)") == [0]
    # point exactly on the shared corner: open top/right boundaries
    # put it in leaf3 ONLY (the reference's corner-point rule)
    assert _sp(spark, "POINT (5 2.5)") == [3]
    # envelope spanning all four leaves, reference traversal order
    assert _sp(spark, "MULTIPOINT (3 2, 8 3)") == [3, 2, 1, 0]
    # envelope within the right half
    assert _sp(spark, "MULTIPOINT (6 0.5, 7 2)") == [2]
    # outside this (bounded) tree -> empty array
    assert _sp(spark, "POINT (20 20)") == []
    # distance form: expansion pulls in neighbors
    assert _sp(spark, "POINT (4.9 2.4)", 0.0) == [0]
    assert _sp(spark, "POINT (4.9 2.4)", 0.2) == [3, 2, 1, 0]
    # empty geometry -> NULL (GeoFunctions.java:1197)
    assert _sp(spark, "POINT EMPTY") is None


def test_spatial_partitions_distance_validation(spark):
    for bad, msg in [
        ("CAST('NaN' AS DOUBLE)", "NaN"),
        ("CAST('Infinity' AS DOUBLE)", "infinite"),
        ("-1.0", "negative"),
    ]:
        with pytest.raises(Exception, match=msg):
            _sp(spark, "POINT (1 1)", bad)


def test_spatial_partitions_requires_literal_tree():
    from presto_copy_spark.dialect import PrestoFeatureUnsupportedError

    with pytest.raises(PrestoFeatureUnsupportedError, match="literal KdbTree"):
        transpile("SELECT spatial_partitions(x, y) FROM t")


def test_kdb_partitioned_join_matches_grid_join_and_plan(spark):
    """The KdbTree-partitioned join must return EXACTLY the pairs the
    grid-cell join returns, and its physical plan must be an equi-join
    on the partition id: no cartesian product, no Python eval — the
    pure-Catalyst ExtractSpatialJoins shape."""
    import random

    from presto_copy_spark.functions.geo import st_point
    from presto_copy_spark.operators.spatial import (
        distance_join,
        kdb_distance_join,
    )
    from pyspark.sql import functions as F

    rng = random.Random(8)
    pts = [(i, rng.uniform(0, 10), rng.uniform(0, 5)) for i in range(120)]
    df = (
        spark.createDataFrame(pts, "id long, x double, y double")
        .withColumn("pt", st_point("x", "y"))
        .select("id", "pt")
    )
    a = df.select(F.col("id").alias("aid"), F.col("pt").alias("pa"))
    b = df.select(F.col("id").alias("bid"), F.col("pt").alias("pb"))

    kdb = kdb_distance_join(a, b, "pa", "pb", 0.7, TREE)
    grid = distance_join(a, b, "pa", "pb", 0.7)
    kp = {(r.aid, r.bid) for r in kdb.collect()}
    gp = {(r.aid, r.bid) for r in grid.collect()}
    assert kp == gp and kp  # same pair set, non-empty

    plan = kdb._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "Python" not in plan  # pure Catalyst, no Arrow/Python stage
    assert "_pid" in plan  # the equi-join key IS the partition id


def test_spatial_partitions_distance_validated_before_empty_check(spark):
    """GeoFunctions.java:1212 validates the distance BEFORE the :1197
    empty-geometry check — spatial_partitions(tree, empty, NaN) must
    RAISE, not short-circuit to NULL (ADVICE r8)."""
    import pytest

    for bad, msg in [
        ("CAST('NaN' AS DOUBLE)", "NaN"),
        ("CAST('Infinity' AS DOUBLE)", "infinite"),
        ("-1.0", "negative"),
    ]:
        with pytest.raises(Exception, match=msg):
            _sp(spark, "POINT EMPTY", bad)
    # and a VALID distance on an empty geometry still yields NULL
    assert _sp(spark, "POINT EMPTY", 0.5) is None


def test_kdb_join_uncovered_probe_raises_by_default(spark):
    """A probe point outside the tree's coverage must RAISE under the
    default uncovered='error' (the reference's trees make the state
    impossible — border leaves extend unbounded) and silently DROP only
    under the explicit uncovered='drop' opt-in (ADVICE r8)."""
    import pytest

    from presto_copy_spark.functions.geo import st_point
    from presto_copy_spark.operators.spatial import kdb_distance_join
    from pyspark.sql import functions as F

    pts = [(0, 1.0, 1.0), (1, 50.0, 50.0)]  # id 1 is outside [0,10]x[0,5]
    df = (
        spark.createDataFrame(pts, "id long, x double, y double")
        .withColumn("pt", st_point("x", "y"))
        .select("id", "pt")
    )
    a = df.select(F.col("id").alias("aid"), F.col("pt").alias("pa"))
    b = df.filter(F.col("id") == 0).select(
        F.col("id").alias("bid"), F.col("pt").alias("pb")
    )
    with pytest.raises(Exception, match="outside KdbTree coverage"):
        kdb_distance_join(a, b, "pa", "pb", 0.7, TREE).collect()
    dropped = kdb_distance_join(
        a, b, "pa", "pb", 0.7, TREE, uncovered="drop"
    ).collect()
    assert {(r.aid, r.bid) for r in dropped} == {(0, 0)}
    with pytest.raises(ValueError, match="uncovered"):
        kdb_distance_join(a, b, "pa", "pb", 0.7, TREE, uncovered="bogus")
