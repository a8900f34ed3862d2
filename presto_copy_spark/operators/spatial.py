"""Distributed spatial join — grid-cell bucketing + exact verify.

Reference analogue: operator/SpatialJoinOperator.java:40 (+
PagesRTreeIndex): the reference builds an R-tree over the build side and
probes per row — a single-node index strategy.  The Spark-first
equivalent is a GRID-PARTITIONED join (the design Sedona/Magellan use):

1. quantize each point to a cell of side >= radius;
2. the probe side keeps its own cell, the build side is duplicated into
   its 3x3 neighborhood (one explode, 9 rows per point — bounded,
   shuffle-friendly);
3. equi-join on cell id (ONE hash shuffle, co-partitioned);
4. exact distance predicate verifies candidates row-locally.

Every true pair (distance <= radius <= cell side) differs by at most one
cell in each axis, so it appears in EXACTLY one (probe-cell = build-
neighbor-cell) bucket — no dedup pass needed.  At 100 TB: shuffle is
O(9 * build + probe) rows, candidates are bounded by local density (the
skew hazard is a dense cell — mitigate by shrinking the cell side below
the radius and widening the neighborhood, trading duplication factor for
bucket size; `cell` is a parameter for exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geo import st_distance, st_within_distance

__all__ = ["distance_join", "kdb_distance_join"]


def _cell(p: Column, axis: str, cell: float) -> Column:
    return F.floor(p[axis] / cell).cast("long")


def distance_join(
    probe: DataFrame,
    build: DataFrame,
    probe_point: str,
    build_point: str,
    radius: float,
    cell: float | None = None,
) -> DataFrame:
    """All (probe, build) pairs with Euclidean distance <= radius.

    Returns probe.* x build.* plus a `dist` column.  `cell` (default
    `radius`) is the grid side; it must be >= radius for the 3x3
    neighborhood to be complete.
    """
    side = float(cell if cell is not None else radius)
    if side < radius:
        raise ValueError("cell side must be >= radius (3x3 neighborhood)")

    p = probe.withColumn("_cx", _cell(F.col(probe_point), "x", side)).withColumn(
        "_cy", _cell(F.col(probe_point), "y", side)
    )
    neighbors = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    b = (
        build.withColumn("_n", F.explode(neighbors))
        .withColumn("_cx", _cell(F.col(build_point), "x", side) + F.col("_n")["dx"])
        .withColumn("_cy", _cell(F.col(build_point), "y", side) + F.col("_n")["dy"])
        .drop("_n")
    )
    joined = p.join(b, ["_cx", "_cy"]).filter(
        st_within_distance(F.col(probe_point), F.col(build_point), radius)
    )
    return joined.withColumn(
        "dist", st_distance(F.col(probe_point), F.col(build_point))
    ).drop("_cx", "_cy")


def _point_geom_sql(point_col: str) -> str:
    """struct<x,y> point column -> the GEOM_T literal form
    spatial_partitions consumes (functions/geometry.py GEOM_T)."""
    return (
        "named_struct('gtype', 'POINT', 'rings', array(array("
        f"named_struct('x', CAST({point_col}.x AS DOUBLE),"
        f" 'y', CAST({point_col}.y AS DOUBLE)))))"
    )


def kdb_distance_join(
    probe: DataFrame,
    build: DataFrame,
    probe_point: str,
    build_point: str,
    radius: float,
    tree_json: str,
    uncovered: str = "error",
) -> DataFrame:
    """Distance join partitioned by a KdbTree — the reference's
    distributed spatial-join shape (ExtractSpatialJoins.java:655
    addPartitioningNodes): each side computes
    ``spatial_partitions(kdbTree, geometry[, radius])``, explodes the
    partition array, and the join runs as an EQUI-JOIN on partition id
    with the exact distance predicate verifying candidates row-locally.

    - probe side: its own leaf (a point falls in exactly ONE leaf —
      KdbTree extents exclude their top/right boundaries);
    - build side: every leaf within `radius` (the 3-arg distance form),
      mirroring which side the reference expands;
    - dedup rule: a pair is kept only in the SMALLEST partition id the
      two arrays share (row-local array_intersect/array_min — no second
      shuffle), so boundary pairs emit exactly once.

    ``uncovered`` (ADVICE r8): a probe point OUTSIDE the tree's extent
    gets an empty partition array.  In the reference this state is
    impossible (KdbTreeUtils border leaves extend unbounded), so the
    default ``"error"`` raises on the first uncovered row (row-local
    null check, no extra shuffle) instead of silently diverging from
    distance_join; pass ``"drop"`` to accept partial-coverage trees and
    drop those probe rows knowingly.

    At 100 TB this is ONE hash shuffle on partition id per side with
    per-leaf skew governed by the KdbTree build (the reference samples
    the data to balance leaves; leaves here come from the caller's
    tree)."""
    from ..functions.geometry import sql_spatial_partitions

    if uncovered not in ("error", "drop"):
        raise ValueError("uncovered must be 'error' or 'drop'")
    p = probe.withColumn(
        "_pa",
        F.expr(sql_spatial_partitions(tree_json, _point_geom_sql(probe_point), None)),
    )
    if uncovered == "error":
        covered = F.when(
            F.col("_pa").isNull() | (F.size("_pa") > 0), F.col("_pa")
        ).otherwise(
            F.expr(
                "raise_error('kdb_distance_join: probe point outside"
                " KdbTree coverage (build the tree over the data"
                " domain, or pass uncovered=\"drop\")')"
            )
        )
        p = p.withColumn("_pa", covered)
    p = p.withColumn("_pid", F.explode("_pa"))
    b = build.withColumn(
        "_pb",
        F.expr(
            sql_spatial_partitions(
                tree_json, _point_geom_sql(build_point), repr(float(radius))
            )
        ),
    ).withColumn("_pid", F.explode("_pb"))
    joined = (
        p.join(b, "_pid")
        .filter(st_within_distance(F.col(probe_point), F.col(build_point), radius))
        .filter(
            F.col("_pid")
            == F.array_min(F.array_intersect(F.col("_pa"), F.col("_pb")))
        )
    )
    return joined.withColumn(
        "dist", st_distance(F.col(probe_point), F.col(build_point))
    ).drop("_pid", "_pa", "_pb")
