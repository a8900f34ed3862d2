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

__all__ = ["distance_join"]


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
