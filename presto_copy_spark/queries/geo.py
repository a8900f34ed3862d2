"""Geospatial queries: ST_* point subset, Bing tiles, grid distance join.

Reference: geospatial/GeoFunctions.java + BingTileFunctions.java +
operator/SpatialJoinOperator.java (see functions/geo.py and
operators/spatial.py for the Spark-first designs).  Coordinates are
derived deterministically from customer/supplier keys (the fixtures have
no geo columns), with the identical arithmetic spelled in the oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.geo import (
    bing_tile_at,
    bing_tile_quadkey,
    st_contains,
    st_distance,
    st_envelope_struct,
    st_point,
    st_x,
    st_y,
)
from ..operators.spatial import distance_join
from .qutil import compile_once, compile_once_scalar
from .registry import query

# synthetic planar coords in [0, 100): key * prime % 1000 / 10
_X = "CAST(({k} * 37) % 1000 AS DOUBLE) / 10.0"
_Y = "CAST(({k} * 101) % 1000 AS DOUBLE) / 10.0"


def _pt(key):
    return st_point((key * 37) % 1000 / F.lit(10.0), (key * 101) % 1000 / F.lit(10.0))


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Fan a starved dimension scan across all cores before CPU-heavy
    row-local geometry (the macro-inlined geometry CASE trees evaluate
    interpreted, ~0.5-1 ms/row — compute-bound, not IO-bound).

    Delegates to qutil.spread_scan, which is a structural NO-OP whenever
    the scan already splits (ADVICE r9: the old local copy repartitioned
    unconditionally, paying an exchange even on an already-parallel
    production scan).  Same contract as Presto's split enumeration
    (presto-spi ConnectorSplitManager)."""
    from .qutil import spread_scan

    return spread_scan(spark, df)


# ---------------------------------------------------------------------------
@query(
    "geo_point_functions",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         {_X.format(k='c_custkey')} AS x,
         {_Y.format(k='c_custkey')} AS y
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, x, y,
       sqrt((x - 50.0) * (x - 50.0) + (y - 50.0) * (y - 50.0)) AS dist_center,
       (x >= 20.0 AND x <= 60.0 AND y >= 30.0 AND y <= 70.0) AS in_region
FROM pts
""",
)
def geo_point_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Point / ST_X / ST_Y / ST_Distance / ST_Contains(envelope) —
    GeoFunctions.java stPoint/stX/stY/stDistance/stContains on the
    planar-point subset.  Pure Column arithmetic: identical IEEE ops on
    both engines, bit-reproducible at any parallelism."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    p = _pt(F.col("c_custkey"))
    center = st_point(F.lit(50.0), F.lit(50.0))
    region = st_envelope_struct(F.lit(20.0), F.lit(30.0), F.lit(60.0), F.lit(70.0))
    return compile_once_scalar(c.select(
        "c_custkey",
        st_x(p).alias("x"),
        st_y(p).alias("y"),
        st_distance(p, center).alias("dist_center"),
        st_contains(region, p).alias("in_region"),
    ))


# ---------------------------------------------------------------------------
_ZOOM = 8


@query(
    "geo_bing_tiles",
    # Identical Web-Mercator arithmetic spelled in DuckDB; quadkey digits
    # unrolled with the same literal shifts as functions/geo.py.
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         CAST((c_custkey * 13) % 160 AS DOUBLE) - 80.0 + 0.5 AS lat,
         CAST((c_custkey * 29) % 360 AS DOUBLE) - 180.0 + 0.5 AS lon
  FROM customer WHERE c_custkey % 10 = 0
),
tiles AS (
  SELECT c_custkey, lat, lon,
         GREATEST(0, LEAST(CAST(floor((lon + 180.0) / 360.0 * {1 << _ZOOM}) AS BIGINT), {(1 << _ZOOM) - 1})) AS tile_x,
         GREATEST(0, LEAST(CAST(floor((0.5 - ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat)))) / (4.0 * pi())) * {1 << _ZOOM}) AS BIGINT), {(1 << _ZOOM) - 1})) AS tile_y
  FROM pts
)
SELECT c_custkey, tile_x, tile_y,
       {' || '.join(f"CAST(CAST(floor(tile_y / {1 << i}) % 2 AS INT) * 2 + CAST(floor(tile_x / {1 << i}) % 2 AS INT) AS VARCHAR)" for i in range(_ZOOM - 1, -1, -1))}
         AS quadkey,
       count(*) OVER (PARTITION BY tile_x, tile_y) AS tile_density
FROM tiles
""",
)
def geo_bing_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bing_tile_at + quadkey + per-tile density rollup
    (BingTileFunctions.java bingTileAt/toQuadKey) — the tile-grid
    aggregation pattern the reference uses for map workloads."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    lat = ((F.col("c_custkey") * 13) % 160).cast("double") - 80.0 + 0.5
    lon = ((F.col("c_custkey") * 29) % 360).cast("double") - 180.0 + 0.5
    t = c.select(
        "c_custkey", bing_tile_at(lat, lon, _ZOOM).alias("tile")
    ).select(
        "c_custkey",
        F.col("tile")["tile_x"].alias("tile_x"),
        F.col("tile")["tile_y"].alias("tile_y"),
        bing_tile_quadkey(F.col("tile"), _ZOOM).alias("quadkey"),
    )
    from pyspark.sql import Window

    return t.withColumn(
        "tile_density", F.count(F.lit(1)).over(Window.partitionBy("tile_x", "tile_y"))
    )


# ---------------------------------------------------------------------------
_RADIUS = 1.5


@query(
    "geo_distance_join",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey,
         {_X.format(k='c_custkey')} AS x,
         {_Y.format(k='c_custkey')} AS y
  FROM customer
),
supp AS (
  SELECT s_suppkey,
         {_X.format(k='(s_suppkey * 7 + 3)')} AS x,
         {_Y.format(k='(s_suppkey * 7 + 3)')} AS y
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) AS dist
FROM cust c, supp s
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
      <= {_RADIUS} * {_RADIUS}
""",
)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance join customer x supplier within radius — the
    SpatialJoinOperator workload on the grid-partitioned plan
    (operators/spatial.py): one cell-id shuffle + row-local verify; the
    oracle is the exhaustive cross join, proving the grid plan finds
    exactly the same pairs."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _pt(F.col("c_custkey")).alias("cp")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", _pt(F.col("s_suppkey") * 7 + 3).alias("sp")
    )
    return distance_join(c, s, "cp", "sp", _RADIUS).select(
        "c_custkey", "s_suppkey", "dist"
    )


def _kdb_grid_tree(lo: float, hi: float, depth: int) -> dict:
    """Balanced KdbTree JSON over [lo,hi)^2: alternate x/y median splits
    to 2^depth leaves — the layout the reference's KdbTreeUtils builds
    from a balanced sample (KdbTree.java buildTree)."""
    counter = [0]

    def node(x0, y0, x1, y1, d):
        ext = {"xMin": x0, "yMin": y0, "xMax": x1, "yMax": y1}
        if d == depth:
            leaf = {"extent": ext, "leafId": counter[0]}
            counter[0] += 1
            return leaf
        if d % 2 == 0:
            mx = (x0 + x1) / 2
            return {"extent": ext,
                    "left": node(x0, y0, mx, y1, d + 1),
                    "right": node(mx, y0, x1, y1, d + 1)}
        my = (y0 + y1) / 2
        return {"extent": ext,
                "left": node(x0, y0, x1, my, d + 1),
                "right": node(x0, my, x1, y1, d + 1)}

    return {"root": node(lo, lo, hi, hi, 0)}


# 16 leaves of 25x25 over the synthetic [0,100) coordinate domain —
# leaf side 25 >> radius 1.5, so the build side lands in <= 4 leaves.
_KDB_TREE = __import__("json").dumps(_kdb_grid_tree(0.0, 100.0, 4))


@query(
    "geo_kdb_partition_join",
    # Same exhaustive cross-join oracle as geo_distance_join: the
    # KdbTree-partitioned plan must find EXACTLY the same pairs.
    oracle=f"""
WITH cust AS (
  SELECT c_custkey,
         {_X.format(k='c_custkey')} AS x,
         {_Y.format(k='c_custkey')} AS y
  FROM customer
),
supp AS (
  SELECT s_suppkey,
         {_X.format(k='(s_suppkey * 7 + 3)')} AS x,
         {_Y.format(k='(s_suppkey * 7 + 3)')} AS y
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) AS dist
FROM cust c, supp s
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
      <= {_RADIUS} * {_RADIUS}
""",
)
def geo_kdb_partition_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KdbTree-partitioned distance join customer x supplier — the
    reference's distributed spatial-join shape
    (ExtractSpatialJoins.java:655 addPartitioningNodes +
    GeoFunctions.java:1195 spatial_partitions): both sides explode to
    KdbTree leaf ids, equi-join on partition id, exact distance verify,
    smallest-shared-leaf dedup — all row-local except the ONE
    partition-id shuffle (operators/spatial.py kdb_distance_join).  The
    oracle is the exhaustive cross join, proving leaf routing + boundary
    dedup lose and duplicate nothing."""
    from ..operators.spatial import kdb_distance_join

    # Round 15 (stage profile): the supplier side broadcasts, so the
    # whole leaf-explode + equi-join + distance-verify chain ran as ONE
    # map task over the single-row-group customer scan (0.246 s of
    # single-threaded CPU measured).  Spreading the probe side is the
    # standard starved-scan fix (qutil.spread_scan — structural no-op
    # on a naturally-split production scan).
    c = _spread(spark, load_table(spark, sf_dir, "customer")).select(
        "c_custkey", _pt(F.col("c_custkey")).alias("cp")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", _pt(F.col("s_suppkey") * 7 + 3).alias("sp")
    )
    return kdb_distance_join(c, s, "cp", "sp", _RADIUS, _KDB_TREE).select(
        "c_custkey", "s_suppkey", "dist"
    )


@query(
    "geo_wkt_polygon_ops",
    oracle="""
WITH params AS (
  SELECT s_suppkey,
         CAST(s_suppkey % 10 AS DOUBLE) AS cx,
         CAST(s_suppkey % 7 AS DOUBLE)  AS cy,
         CAST(1 + s_suppkey % 3 AS DOUBLE) AS r
  FROM supplier
)
SELECT s_suppkey,
       2 * r * r - 2 * (r / 2) * (r / 2) AS area,
       round(cx, 6) AS centroid_x,
       round(cy, 6) AS centroid_y,
       CAST(1 AS BOOLEAN) AS ring_has,
       CAST(0 AS BOOLEAN) AS hole_has,
       CAST(10 AS BIGINT) AS n_points,
       cx - r AS xmin, cy + r AS ymax
FROM params
""",
)
def geo_wkt_polygon_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full WKT-geometry pipeline vs an ANALYTIC oracle
    (functions/geometry.py; GeoFunctions.java stGeometryFromText /
    stArea / stCentroid / stContains / envelope).

    Each supplier row constructs a WKT diamond (rhombus radius r at
    (cx,cy)) with a half-radius diamond HOLE, as a STRING — then the
    engine must parse the text and compute area / centroid /
    containment / envelope.  The oracle never parses anything: the
    diamond's properties are closed-form (area 2r^2 - 2(r/2)^2,
    centroid = center, center point inside the hole => not contained,
    midpoint between hole and shell => contained), so agreement proves
    the parser + planar math end-to-end on 10k distinct shapes.
    Containment probes: ring_has at (cx + 3r/4, cy) (between hole and
    shell on the x-axis), hole_has at the center (inside the hole =>
    false)."""
    from ..functions.geometry import (
        st_area,
        st_centroid,
        st_envelope_of,
        st_geometry_from_text,
        st_num_points,
        st_polygon_contains_point,
    )

    s = _spread(spark, load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        (F.col("s_suppkey") % 10).cast("double").alias("cx"),
        (F.col("s_suppkey") % 7).cast("double").alias("cy"),
        (1 + F.col("s_suppkey") % 3).cast("double").alias("r"),
    )

    def num(c):
        return c.cast("string")

    cx, cy, r = F.col("cx"), F.col("cy"), F.col("r")
    h = r / 2

    def diamond(cx, cy, rr):
        return F.concat_ws(
            ", ",
            F.concat_ws(" ", num(cx + rr), num(cy)),
            F.concat_ws(" ", num(cx), num(cy + rr)),
            F.concat_ws(" ", num(cx - rr), num(cy)),
            F.concat_ws(" ", num(cx), num(cy - rr)),
            F.concat_ws(" ", num(cx + rr), num(cy)),
        )

    wkt = F.concat(
        F.lit("POLYGON (("), diamond(cx, cy, r), F.lit("), ("),
        diamond(cx, cy, h), F.lit("))"),
    )

    # Let-bind the parsed geometry as its OWN projection column: each of
    # the 8 outputs references it as a plain attribute (CollapseProject
    # keeps multi-referenced non-cheap expressions un-inlined, so the
    # regexp+transform parse runs once per row).  The centroid is also
    # staged once — st_centroid builds the polygon AND linestring branch
    # trees, so calling it per axis doubled ~40% of the plan (measured:
    # optimize 0.19 -> 0.09 s, warm exec 0.25 -> 0.17 s at sf0.1).
    parsed = s.select(
        "s_suppkey", "cx", "cy", "r",
        st_geometry_from_text(wkt).alias("g"),
    )
    g = F.col("g")
    env = st_envelope_of(g)
    staged = parsed.select(
        "s_suppkey",
        st_area(g).alias("area"),
        st_centroid(g).alias("centroid"),
        st_polygon_contains_point(
            g, F.col("cx") + 3 * F.col("r") / 4, F.col("cy")
        ).alias("ring_has"),
        st_polygon_contains_point(g, F.col("cx"), F.col("cy")).alias("hole_has"),
        st_num_points(g).cast("long").alias("n_points"),
        env["xmin"].alias("xmin"),
        env["ymax"].alias("ymax"),
    )
    return compile_once(staged.select(
        "s_suppkey",
        "area",
        F.round(F.col("centroid")["x"], 6).alias("centroid_x"),
        F.round(F.col("centroid")["y"], 6).alias("centroid_y"),
        "ring_has",
        "hole_has",
        "n_points",
        "xmin",
        "ymax",
    ))


@query(
    "geo_polygon_predicates",
    # Closed-form truth: mode governs the construction, so the oracle
    # never parses a geometry.  mode 0/1 place the small diamond inside
    # the big one (offset 0 / r/4 — offset + r/2 < r), mode 2 at
    # offset r (partial overlap with proper edge crossings), mode 3 at
    # offset 3r (disjoint).  The big diamond can never sit inside the
    # small one.
    oracle="""
SELECT s_suppkey,
       (s_suppkey % 4) IN (0, 1, 2) AS intersects,
       (s_suppkey % 4) IN (0, 1) AS b_within_a,
       CAST(0 AS BOOLEAN) AS a_within_b,
       (s_suppkey % 4) IN (0, 1, 2) AS intersects_sql
FROM supplier
""",
)
def geo_polygon_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Intersects / ST_Within polygon-polygon (GeoFunctions.java
    stIntersects/stWithin) over WKT parsed at query time — the round-4
    geometry-predicate addition (orientation-sign segment crossing +
    vertex ray-cast containment, functions/geometry.py).

    Each supplier builds TWO WKT diamonds whose spatial relation is
    decided by s_suppkey % 4 (see oracle note), then the engine must
    parse both and agree with the closed-form truth on all ~10k rows.
    Both surfaces are exercised: the Column helpers AND the registered
    SQL twins (intersects_sql).  All predicate math is row-local
    zip_with/exists over the coordinate arrays — no joins, no shuffles;
    at 100 TB this composes with the grid-cell bucketing of
    geo_distance_join for the pair-generation stage."""
    from ..functions import register_all
    from ..functions.geometry import (
        _shells_cross,
        st_geometry_from_text,
        st_polygon_contains_point,
    )

    register_all(spark)  # SQL twins; no-op when already registered

    s = _spread(spark, load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        (F.col("s_suppkey") % 10).cast("double").alias("cx"),
        (F.col("s_suppkey") % 7).cast("double").alias("cy"),
        (1 + F.col("s_suppkey") % 3).cast("double").alias("r"),
        (F.col("s_suppkey") % 4).alias("mode"),
    )
    cx, cy, r = F.col("cx"), F.col("cy"), F.col("r")
    d = (
        F.when(F.col("mode") == 0, F.lit(0.0))
        .when(F.col("mode") == 1, r / 4)
        .when(F.col("mode") == 2, r)
        .otherwise(3 * r)
    )

    def num(c):
        return c.cast("string")

    def diamond_wkt(px, py, rr):
        body = F.concat_ws(
            ", ",
            F.concat_ws(" ", num(px + rr), num(py)),
            F.concat_ws(" ", num(px), num(py + rr)),
            F.concat_ws(" ", num(px - rr), num(py)),
            F.concat_ws(" ", num(px), num(py - rr)),
            F.concat_ws(" ", num(px + rr), num(py)),
        )
        return F.concat(F.lit("POLYGON (("), body, F.lit("))"))

    parsed = s.select(
        "s_suppkey",
        st_geometry_from_text(diamond_wkt(cx, cy, r)).alias("ga"),
        st_geometry_from_text(diamond_wkt(cx + d, cy, r / 2)).alias("gb"),
    )
    # Compute the shared row-local primitives ONCE: naive composition of
    # st_intersects + 2x st_within evaluates the O(|A|x|B|) segment
    # crossing test three times per row (it's symmetric) and rebuilds
    # the segment arrays per predicate.  Staging cross / forall-contains
    # / single-vertex tests as their own projection columns lets every
    # output reference them as cheap attributes (CollapseProject keeps
    # multi-referenced non-cheap expressions un-inlined), roughly
    # halving both the optimizer tree size and the per-row work.  The
    # exact predicate definitions are unchanged from
    # functions/geometry.py st_intersects/st_within.
    ga, gb = F.col("ga"), F.col("gb")
    va = F.element_at(F.element_at(ga["rings"], 1), 1)
    vb = F.element_at(F.element_at(gb["rings"], 1), 1)
    prims = parsed.select(
        "s_suppkey",
        "ga",
        "gb",
        _shells_cross(ga, gb).alias("crossed"),
        F.forall(
            F.element_at(gb["rings"], 1),
            lambda p: st_polygon_contains_point(ga, p["x"], p["y"]),
        ).alias("b_all_in_a"),
        F.forall(
            F.element_at(ga["rings"], 1),
            lambda p: st_polygon_contains_point(gb, p["x"], p["y"]),
        ).alias("a_all_in_b"),
        st_polygon_contains_point(gb, va["x"], va["y"]).alias("va_in_b"),
        st_polygon_contains_point(ga, vb["x"], vb["y"]).alias("vb_in_a"),
    )
    crossed = F.col("crossed")
    return compile_once(prims.select(
        "s_suppkey",
        (crossed | F.col("va_in_b") | F.col("vb_in_a")).alias("intersects"),
        (F.col("b_all_in_a") & ~crossed).alias("b_within_a"),
        (F.col("a_all_in_b") & ~crossed).alias("a_within_b"),
        F.expr("st_intersects(ga, gb)").alias("intersects_sql"),
    ))


# ---------------------------------------------------------------------------
def _sql_vertex_boundary_dist(vx: str, vy: str, x0: str, x1: str, y0: str, y1: str) -> str:
    """SQL: distance from vertex (vx, vy) to the BOUNDARY of the
    axis-aligned rectangle [x0,x1]x[y0,y1] — inside rows take the min
    side clearance, outside rows the clamped-projection distance (the
    engine's geometry_nearest_points candidate set: vertex-to-segment)."""
    inside = f"({vx} >= {x0} AND {vx} <= {x1} AND {vy} >= {y0} AND {vy} <= {y1})"
    return (
        f"CASE WHEN {inside}"
        f" THEN LEAST({vx} - {x0}, {x1} - {vx}, {vy} - {y0}, {y1} - {vy})"
        f" ELSE sqrt(power(GREATEST({x0} - {vx}, {vx} - {x1}, 0), 2)"
        f" + power(GREATEST({y0} - {vy}, {vy} - {y1}, 0), 2)) END"
    )


def _sql_hull_corner_cuts() -> str:
    """SQL: the 4 right-triangle corner cuts of the two-rectangle convex
    hull (hull = bbox minus these).  At each bbox corner, the leg along
    x runs from the corner to the nearest rect attaining that y-extreme,
    and the leg along y to the nearest rect attaining that x-extreme."""
    top_min_x0 = ("CASE WHEN ay1 = Y1 AND by1 = Y1 THEN LEAST(ax0, bx0)"
                  " WHEN ay1 = Y1 THEN ax0 ELSE bx0 END")
    top_max_x1 = ("CASE WHEN ay1 = Y1 AND by1 = Y1 THEN GREATEST(ax1, bx1)"
                  " WHEN ay1 = Y1 THEN ax1 ELSE bx1 END")
    bot_min_x0 = ("CASE WHEN ay0 = Y0 AND by0 = Y0 THEN LEAST(ax0, bx0)"
                  " WHEN ay0 = Y0 THEN ax0 ELSE bx0 END")
    bot_max_x1 = ("CASE WHEN ay0 = Y0 AND by0 = Y0 THEN GREATEST(ax1, bx1)"
                  " WHEN ay0 = Y0 THEN ax1 ELSE bx1 END")
    left_max_y1 = ("CASE WHEN ax0 = X0 AND bx0 = X0 THEN GREATEST(ay1, by1)"
                   " WHEN ax0 = X0 THEN ay1 ELSE by1 END")
    left_min_y0 = ("CASE WHEN ax0 = X0 AND bx0 = X0 THEN LEAST(ay0, by0)"
                   " WHEN ax0 = X0 THEN ay0 ELSE by0 END")
    right_max_y1 = ("CASE WHEN ax1 = X1 AND bx1 = X1 THEN GREATEST(ay1, by1)"
                    " WHEN ax1 = X1 THEN ay1 ELSE by1 END")
    right_min_y0 = ("CASE WHEN ax1 = X1 AND bx1 = X1 THEN LEAST(ay0, by0)"
                    " WHEN ax1 = X1 THEN ay0 ELSE by0 END")
    cuts = [
        f"GREATEST(({top_min_x0}) - X0, 0) * GREATEST(Y1 - ({left_max_y1}), 0) / 2",
        f"GREATEST(X1 - ({top_max_x1}), 0) * GREATEST(Y1 - ({right_max_y1}), 0) / 2",
        f"GREATEST(({bot_min_x0}) - X0, 0) * GREATEST(({left_min_y0}) - Y0, 0) / 2",
        f"GREATEST(X1 - ({bot_max_x1}), 0) * GREATEST(({right_min_y0}) - Y0, 0) / 2",
    ]
    return " + ".join(cuts)


_HULL_NEAR = "LEAST(" + ", ".join(
    [_sql_vertex_boundary_dist(vx, vy, "bx0", "bx1", "by0", "by1")
     for vx, vy in (("ax0", "ay0"), ("ax1", "ay0"), ("ax1", "ay1"), ("ax0", "ay1"))]
    + [_sql_vertex_boundary_dist(vx, vy, "ax0", "ax1", "ay0", "ay1")
       for vx, vy in (("bx0", "by0"), ("bx1", "by0"), ("bx1", "by1"), ("bx0", "by1"))]
) + ")"

_POLY_RE = (
    "'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+),"
    " (-?[0-9.]+) (-?[0-9.]+)'"
)


@query(
    "geo_hull_union",
    # REAL-WORK oracle (round 9; VERDICT r8 ask #5): build the two square
    # WKTs + line + probe-point WKTs exactly as the engine does, regexp-
    # parse every coordinate back out of the TEXT, then compute all seven
    # outputs with GENERIC two-rectangle geometry on the parsed bounds
    # (no mode dispatch below the WKT build):
    #   hull_area: bbox minus the 4 corner right-triangle cuts
    #   union_gtype/area: POLYGON + inclusion-exclusion when the rects
    #     meet, MULTIPOLYGON/-1 sentinel when disjoint
    #   near_dist: argmin over vertex-to-boundary candidates (the
    #     engine's geometry_nearest_points candidate set)
    #   interp_x/locate_f: parametric point + clamped projection on the
    #     parsed segment; gj_area: width x height of the parsed square
    # All parsed values are exact small doubles -> bit-equal to Spark.
    oracle=f"""
WITH params AS (
  SELECT s_suppkey,
         CAST(s_suppkey % 10 AS DOUBLE) AS cx,
         CAST(s_suppkey % 7 AS DOUBLE)  AS cy,
         CAST(1 + s_suppkey % 4 AS DOUBLE) AS r,
         s_suppkey % 3 AS mode
  FROM supplier
),
wkt AS (
  SELECT s_suppkey,
         'POLYGON ((' || (cx-r) || ' ' || (cy-r) || ', ' || (cx+r) || ' '
           || (cy-r) || ', ' || (cx+r) || ' ' || (cy+r) || ', ' || (cx-r)
           || ' ' || (cy+r) || ', ' || (cx-r) || ' ' || (cy-r) || '))' AS wa,
         'POLYGON ((' || (bx-br) || ' ' || (by-br) || ', ' || (bx+br) || ' '
           || (by-br) || ', ' || (bx+br) || ' ' || (by+br) || ', ' || (bx-br)
           || ' ' || (by+br) || ', ' || (bx-br) || ' ' || (by-br) || '))' AS wb,
         'LINESTRING (' || (cx-r) || ' ' || cy || ', ' || (cx+r) || ' '
           || cy || ')' AS wl,
         'POINT (' || (cx + r/2) || ' ' || (cy + 1) || ')' AS wp
  FROM (SELECT *,
          CASE mode WHEN 0 THEN cx + r WHEN 1 THEN cx + 4*r ELSE cx END AS bx,
          CASE mode WHEN 0 THEN cy + r ELSE cy END AS by,
          CASE mode WHEN 2 THEN r/2 ELSE r END AS br
        FROM params) p
),
parsed AS (
  SELECT s_suppkey,
    CAST(regexp_extract(wa, {_POLY_RE}, 1) AS DOUBLE) AS ax0,
    CAST(regexp_extract(wa, {_POLY_RE}, 2) AS DOUBLE) AS ay0,
    CAST(regexp_extract(wa, {_POLY_RE}, 5) AS DOUBLE) AS ax1,
    CAST(regexp_extract(wa, {_POLY_RE}, 6) AS DOUBLE) AS ay1,
    CAST(regexp_extract(wb, {_POLY_RE}, 1) AS DOUBLE) AS bx0,
    CAST(regexp_extract(wb, {_POLY_RE}, 2) AS DOUBLE) AS by0,
    CAST(regexp_extract(wb, {_POLY_RE}, 5) AS DOUBLE) AS bx1,
    CAST(regexp_extract(wb, {_POLY_RE}, 6) AS DOUBLE) AS by1,
    CAST(regexp_extract(wl, 'LINESTRING \\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)\\)', 1) AS DOUBLE) AS lx0,
    CAST(regexp_extract(wl, 'LINESTRING \\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)\\)', 3) AS DOUBLE) AS lx1,
    CAST(regexp_extract(wl, 'LINESTRING \\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)\\)', 2) AS DOUBLE) AS ly,
    CAST(regexp_extract(wp, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 1) AS DOUBLE) AS qx,
    CAST(regexp_extract(wp, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 2) AS DOUBLE) AS qy
  FROM wkt
),
rel AS (
  SELECT *,
         LEAST(ax0, bx0) AS X0, GREATEST(ax1, bx1) AS X1,
         LEAST(ay0, by0) AS Y0, GREATEST(ay1, by1) AS Y1,
         LEAST(ax1, bx1) - GREATEST(ax0, bx0) AS iw,
         LEAST(ay1, by1) - GREATEST(ay0, by0) AS ih
  FROM parsed
)
SELECT s_suppkey,
       (X1 - X0) * (Y1 - Y0) - ({_sql_hull_corner_cuts()}) AS hull_area,
       CASE WHEN iw < 0 OR ih < 0 THEN 'MULTIPOLYGON' ELSE 'POLYGON' END
         AS union_gtype,
       CASE WHEN iw < 0 OR ih < 0 THEN -1.0
            ELSE (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0)
                 - GREATEST(iw, 0) * GREATEST(ih, 0) END AS union_area_poly,
       {_HULL_NEAR} AS near_dist,
       lx0 + 0.25 * (lx1 - lx0) AS interp_x,
       GREATEST(0, LEAST(1, (qx - lx0) / (lx1 - lx0))) AS locate_f,
       (ax1 - ax0) * (ay1 - ay0) AS gj_area
FROM rel
""",
)
def geo_hull_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 OGC closures end-to-end (GeoFunctions.java stConvexHull /
    geometryUnion / geometryNearestPoints / lineInterpolatePoint /
    lineLocatePoint / GeoJSON): per supplier build two axis-aligned
    squares whose spatial relation is decided by s_suppkey % 3, then
    the registered pure-Catalyst macros must agree with the closed-form
    truth on every row.  All math is row-local HOFs over the coordinate
    arrays — no joins, no shuffles; composes with grid-cell bucketing
    for pair generation at scale (geo_distance_join)."""
    from ..functions import register_all

    register_all(spark)

    s = _spread(spark, load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        (F.col("s_suppkey") % 10).cast("double").alias("cx"),
        (F.col("s_suppkey") % 7).cast("double").alias("cy"),
        (1 + F.col("s_suppkey") % 4).cast("double").alias("r"),
        (F.col("s_suppkey") % 3).alias("mode"),
    )
    cx, cy, r = F.col("cx"), F.col("cy"), F.col("r")
    # B's center per mode: 0 -> diagonal overlap, 1 -> disjoint,
    # 2 -> concentric (half-size)
    bx = (
        F.when(F.col("mode") == 0, cx + r)
        .when(F.col("mode") == 1, cx + 4 * r)
        .otherwise(cx)
    )
    by = F.when(F.col("mode") == 0, cy + r).otherwise(cy)
    br = F.when(F.col("mode") == 2, r / 2).otherwise(r)

    def num(c):
        return c.cast("string")

    def square_wkt(px, py, rr):
        body = F.concat_ws(
            ", ",
            F.concat_ws(" ", num(px - rr), num(py - rr)),
            F.concat_ws(" ", num(px + rr), num(py - rr)),
            F.concat_ws(" ", num(px + rr), num(py + rr)),
            F.concat_ws(" ", num(px - rr), num(py + rr)),
            F.concat_ws(" ", num(px - rr), num(py - rr)),
        )
        return F.concat(F.lit("POLYGON (("), body, F.lit("))"))

    line_wkt = F.concat(
        F.lit("LINESTRING ("),
        F.concat_ws(" ", num(cx - r), num(cy)),
        F.lit(", "),
        F.concat_ws(" ", num(cx + r), num(cy)),
        F.lit(")"),
    )
    probe_wkt = F.concat(
        F.lit("POINT ("), F.concat_ws(" ", num(cx + r / 2), num(cy + 1)), F.lit(")")
    )
    parsed = s.select(
        "s_suppkey",
        square_wkt(cx, cy, r).alias("wa"),
        square_wkt(bx, by, br).alias("wb"),
        line_wkt.alias("wl"),
        probe_wkt.alias("wp"),
    ).select(
        "s_suppkey",
        F.expr("st_geometryfromtext(wa)").alias("ga"),
        F.expr("st_geometryfromtext(wb)").alias("gb"),
        F.expr("st_geometryfromtext(wl)").alias("gl"),
        F.expr("st_geometryfromtext(wp)").alias("gp"),
    )
    # stage the union once (multi-referenced for gtype + area)
    staged = parsed.select(
        "s_suppkey",
        "ga",
        "gl",
        "gp",
        F.expr("st_union(ga, gb)").alias("u"),
        F.expr(
            "st_convexhull(named_struct('gtype', 'MULTIPOINT',"
            " 'rings', concat(ga.rings, gb.rings)))"
        ).alias("hull"),
        F.expr("geometry_nearest_points(ga, gb)").alias("np"),
    )
    return compile_once(staged.select(
        "s_suppkey",
        F.expr("st_area(hull)").alias("hull_area"),
        F.col("u")["gtype"].alias("union_gtype"),
        F.expr(
            "CASE WHEN u.gtype = 'POLYGON' THEN st_area(u) ELSE -1.0D END"
        ).alias("union_area_poly"),
        F.expr(
            "sqrt(power(np[1].rings[0][0].x - np[0].rings[0][0].x, 2)"
            " + power(np[1].rings[0][0].y - np[0].rings[0][0].y, 2))"
        ).alias("near_dist"),
        F.expr("line_interpolate_point(gl, 0.25D).rings[0][0].x").alias(
            "interp_x"
        ),
        F.expr("line_locate_point(gl, gp)").alias("locate_f"),
        F.expr(
            "st_area(from_geojson_geometry(to_geojson_geometry(ga)))"
        ).alias("gj_area"),
    ))


@query(
    "geo_relate_ops",
    # REAL-WORK oracle (round 9; VERDICT r8 ask #5 — the old closed-form
    # constant table made this row's bench denominator a no-op): DuckDB
    # now pays the same pipeline shape the engine does — build the two
    # square WKT strings + the probe-point WKT exactly as the Spark side
    # concatenates them, regexp-parse the corner/point coordinates back
    # out of the TEXT, then decide every output with GENERIC
    # axis-aligned-rectangle algebra on the parsed bounds (no
    # s_suppkey-mod dispatch anywhere below the WKT build):
    #   overlap widths  iw = min(ax1,bx1) - max(ax0,bx0),
    #                   ih = min(ay1,by1) - max(ay0,by0)
    #   itype: iw>0&ih>0 -> POLYGON; one zero -> LINESTRING;
    #          both zero -> POINT; any negative -> EMPTY
    #   touches: non-empty intersection with zero area
    #   iarea = iw*ih when POLYGON else 0
    #   pt_touches: parsed probe point lies ON A's boundary
    # All parsed values are exact small doubles, so the generic algebra
    # reproduces the engine's IEEE results bit-exactly.
    oracle="""
WITH params AS (
  SELECT s_suppkey,
         CAST(s_suppkey % 10 AS DOUBLE) AS cx,
         CAST(s_suppkey % 7 AS DOUBLE)  AS cy,
         CAST(1 + s_suppkey % 4 AS DOUBLE) AS r,
         s_suppkey % 4 AS mode
  FROM supplier
),
wkt AS (  -- the identical strings the engine is fed
  SELECT s_suppkey,
         'POLYGON ((' || (cx-r) || ' ' || (cy-r) || ', ' || (cx+r) || ' '
           || (cy-r) || ', ' || (cx+r) || ' ' || (cy+r) || ', ' || (cx-r)
           || ' ' || (cy+r) || ', ' || (cx-r) || ' ' || (cy-r) || '))' AS wa,
         'POLYGON ((' || (bx-r) || ' ' || (by-r) || ', ' || (bx+r) || ' '
           || (by-r) || ', ' || (bx+r) || ' ' || (by+r) || ', ' || (bx-r)
           || ' ' || (by+r) || ', ' || (bx-r) || ' ' || (by-r) || '))' AS wb,
         'POINT (' || (cx + (s_suppkey % 2) * r) || ' ' || cy || ')' AS wp,
         'POINT (' || cx || ' ' || cy || ')' AS ww
  FROM (SELECT *,
          CASE mode WHEN 0 THEN cx + r WHEN 1 THEN cx + 2*r
               WHEN 2 THEN cx + 2*r ELSE cx + 5*r END AS bx,
          CASE mode WHEN 0 THEN cy + r WHEN 2 THEN cy + 2*r
               ELSE cy END AS by
        FROM params) p
),
parsed AS (  -- coordinates recovered from the TEXT, not from params
  SELECT s_suppkey,
    CAST(regexp_extract(wa, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 1) AS DOUBLE) AS ax0,
    CAST(regexp_extract(wa, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 2) AS DOUBLE) AS ay0,
    CAST(regexp_extract(wa, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 5) AS DOUBLE) AS ax1,
    CAST(regexp_extract(wa, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 6) AS DOUBLE) AS ay1,
    CAST(regexp_extract(wb, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 1) AS DOUBLE) AS bx0,
    CAST(regexp_extract(wb, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 2) AS DOUBLE) AS by0,
    CAST(regexp_extract(wb, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 5) AS DOUBLE) AS bx1,
    CAST(regexp_extract(wb, 'POLYGON \\(\\((-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+), (-?[0-9.]+) (-?[0-9.]+)', 6) AS DOUBLE) AS by1,
    CAST(regexp_extract(wp, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 1) AS DOUBLE) AS px,
    CAST(regexp_extract(wp, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 2) AS DOUBLE) AS py,
    CAST(regexp_extract(ww, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 1) AS DOUBLE) AS wx,
    CAST(regexp_extract(ww, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 2) AS DOUBLE) AS wy
  FROM wkt
),
rel AS (
  SELECT *,
         LEAST(ax1, bx1) - GREATEST(ax0, bx0) AS iw,
         LEAST(ay1, by1) - GREATEST(ay0, by0) AS ih
  FROM parsed
)
SELECT s_suppkey,
       (iw >= 0 AND ih >= 0 AND iw * ih = 0) AS touches_ab,
       CASE WHEN iw < 0 OR ih < 0 THEN 'EMPTY'
            WHEN iw > 0 AND ih > 0 THEN 'POLYGON'
            WHEN iw = 0 AND ih = 0 THEN 'POINT'
            ELSE 'LINESTRING' END AS itype,
       CASE WHEN iw > 0 AND ih > 0 THEN iw * ih ELSE 0.0 END AS iarea,
       (((px = ax0 OR px = ax1) AND py >= ay0 AND py <= ay1)
        OR ((py = ay0 OR py = ay1) AND px >= ax0 AND px <= ax1))
         AS pt_touches,
       wx AS wkb_x,
       wy AS wkb_y
FROM rel
""",
)
def geo_relate_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 relate-class end-to-end (GeoFunctions.java stTouches:1142,
    stIntersection:986, stGeomFromBinary:250): per supplier build two
    axis-aligned squares whose relation is decided by s_suppkey % 4 and
    check st_touches / st_intersection (convex-convex hull-of-candidates)
    / st_geomfrombinary (pure-SQL NDR WKB decode) against closed-form
    truth.  Row-local HOFs only — no joins, no shuffles; the WKB decode
    path is the ingestion shape a 100 TB geo pipeline needs (parquet
    binary column -> geometry struct, never leaving the executors)."""
    import struct

    from ..functions import register_all

    register_all(spark)

    s = _spread(spark, load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        (F.col("s_suppkey") % 10).cast("double").alias("cx"),
        (F.col("s_suppkey") % 7).cast("double").alias("cy"),
        (1 + F.col("s_suppkey") % 4).cast("double").alias("r"),
        (F.col("s_suppkey") % 4).alias("mode"),
    )
    cx, cy, r = F.col("cx"), F.col("cy"), F.col("r")
    bx = (
        F.when(F.col("mode") == 0, cx + r)
        .when(F.col("mode") == 1, cx + 2 * r)
        .when(F.col("mode") == 2, cx + 2 * r)
        .otherwise(cx + 5 * r)
    )
    by = (
        F.when(F.col("mode") == 0, cy + r)
        .when(F.col("mode") == 2, cy + 2 * r)
        .otherwise(cy)
    )

    def num(c):
        return c.cast("string")

    def square_wkt(px, py, rr):
        body = F.concat_ws(
            ", ",
            F.concat_ws(" ", num(px - rr), num(py - rr)),
            F.concat_ws(" ", num(px + rr), num(py - rr)),
            F.concat_ws(" ", num(px + rr), num(py + rr)),
            F.concat_ws(" ", num(px - rr), num(py + rr)),
            F.concat_ws(" ", num(px - rr), num(py - rr)),
        )
        return F.concat(F.lit("POLYGON (("), body, F.lit("))"))

    # literal int -> little-endian IEEE-754 hex of the double value
    # (cx in 0..9, cy in 0..6) — the WKB bytes are assembled in-plan
    ieee = {i: struct.pack("<d", float(i)).hex() for i in range(10)}
    hexmap = F.create_map(
        *[F.lit(v) for kv in ieee.items() for v in kv]
    )
    parsed = s.select(
        "s_suppkey",
        "mode",
        "r",
        square_wkt(cx, cy, r).alias("wa"),
        square_wkt(bx, by, r).alias("wb"),
        F.concat_ws(
            " ",
            num(cx + (F.col("s_suppkey") % 2) * r),
            num(cy),
        ).alias("probe_body"),
        F.unhex(
            F.concat(
                F.lit("0101000000"),
                hexmap[F.col("s_suppkey") % 10],
                hexmap[F.col("s_suppkey") % 7],
            )
        ).alias("wkb"),
    ).select(
        "s_suppkey",
        F.expr("st_geometryfromtext(wa)").alias("ga"),
        F.expr("st_geometryfromtext(wb)").alias("gb"),
        F.expr(
            "st_geometryfromtext(concat('POINT (', probe_body, ')'))"
        ).alias("gp"),
        F.expr("st_geomfrombinary(wkb)").alias("gw"),
    )
    # stage the intersection once (multi-referenced for gtype + area)
    staged = parsed.select(
        "s_suppkey",
        "ga",
        "gb",
        "gp",
        "gw",
        F.expr("st_intersection(ga, gb)").alias("ab"),
    )
    return compile_once(staged.select(
        "s_suppkey",
        F.expr("st_touches(ga, gb)").alias("touches_ab"),
        F.expr("coalesce(ab.gtype, 'EMPTY')").alias("itype"),
        F.expr("st_area(ab)").alias("iarea"),
        F.expr("st_touches(gp, ga)").alias("pt_touches"),
        F.expr("st_x(gw)").alias("wkb_x"),
        F.expr("st_y(gw)").alias("wkb_y"),
    ))
