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
from .registry import query

# synthetic planar coords in [0, 100): key * prime % 1000 / 10
_X = "CAST(({k} * 37) % 1000 AS DOUBLE) / 10.0"
_Y = "CAST(({k} * 101) % 1000 AS DOUBLE) / 10.0"


def _pt(key):
    return st_point((key * 37) % 1000 / F.lit(10.0), (key * 101) % 1000 / F.lit(10.0))


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
    return c.select(
        "c_custkey",
        st_x(p).alias("x"),
        st_y(p).alias("y"),
        st_distance(p, center).alias("dist_center"),
        st_contains(region, p).alias("in_region"),
    )


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

    s = load_table(spark, sf_dir, "supplier").select(
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
    return staged.select(
        "s_suppkey",
        "area",
        F.round(F.col("centroid")["x"], 6).alias("centroid_x"),
        F.round(F.col("centroid")["y"], 6).alias("centroid_y"),
        "ring_has",
        "hole_has",
        "n_points",
        "xmin",
        "ymax",
    )


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

    s = load_table(spark, sf_dir, "supplier").select(
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
    return prims.select(
        "s_suppkey",
        (crossed | F.col("va_in_b") | F.col("vb_in_a")).alias("intersects"),
        (F.col("b_all_in_a") & ~crossed).alias("b_within_a"),
        (F.col("a_all_in_b") & ~crossed).alias("a_within_b"),
        F.expr("st_intersects(ga, gb)").alias("intersects_sql"),
    )


# ---------------------------------------------------------------------------
@query(
    "geo_hull_union",
    # Closed-form truth (mode = s % 3, r = 1 + s % 4, cx = s % 10,
    # cy = s % 7; squares A = [cx-r, cx+r]^2-ish, B per mode):
    #   mode 0 (diagonal overlap, B at (cx+r, cy+r)):   hull 8r^2,
    #     union POLYGON 7r^2, boundary-nearest r
    #   mode 1 (disjoint, B at (cx+4r, cy)):            hull vertices
    #     span a 6r x 2r rectangle = 12r^2, union MULTIPOLYGON (-1
    #     sentinel area), boundary gap 2r
    #   mode 2 (contained, B centered, half-size r/2):  hull = A = 4r^2,
    #     union POLYGON 4r^2, boundary-nearest r/2
    # line_interpolate_point(0.25) of LINESTRING (cx-r cy, cx+r cy) is
    # x = cx - r/2; line_locate_point of POINT (cx + r/2, cy + 1) is
    # 0.75; the GeoJSON round-trip reproduces A's area.  All values are
    # exact doubles (r in 1..4, halves representable).
    oracle="""
SELECT s_suppkey,
       CASE s_suppkey % 3
         WHEN 0 THEN 8.0 * r * r
         WHEN 1 THEN 12.0 * r * r
         ELSE 4.0 * r * r END AS hull_area,
       CASE s_suppkey % 3 WHEN 1 THEN 'MULTIPOLYGON' ELSE 'POLYGON' END
         AS union_gtype,
       CASE s_suppkey % 3
         WHEN 0 THEN 7.0 * r * r
         WHEN 1 THEN -1.0
         ELSE 4.0 * r * r END AS union_area_poly,
       CASE s_suppkey % 3
         WHEN 0 THEN r
         WHEN 1 THEN 2.0 * r
         ELSE r / 2.0 END AS near_dist,
       CAST(s_suppkey % 10 AS DOUBLE) - r / 2.0 AS interp_x,
       0.75 AS locate_f,
       4.0 * r * r AS gj_area
FROM (SELECT s_suppkey, CAST(1 + s_suppkey % 4 AS DOUBLE) AS r
      FROM supplier) t
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

    s = load_table(spark, sf_dir, "supplier").select(
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
    return staged.select(
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
    )


@query(
    "geo_relate_ops",
    # Closed-form truth (r = 1 + s % 4, cx = s % 10, cy = s % 7,
    # A = [cx-r, cx+r]^2-ish square, B placed by mode = s % 4):
    #   mode 0 (diagonal overlap, B center (cx+r, cy+r)):
    #     touches false, A intersect B = [cx, cx+r] x [cy, cy+r]
    #     POLYGON of area r^2
    #   mode 1 (edge contact, B center (cx+2r, cy)): touches true,
    #     intersection LINESTRING (the shared edge), area 0
    #   mode 2 (corner contact, B center (cx+2r, cy+2r)): touches
    #     true, intersection POINT, area 0
    #   mode 3 (disjoint, B center (cx+5r, cy)): touches false,
    #     intersection EMPTY, area 0
    # The boundary probe POINT(cx + (s%2)*r, cy) touches A iff s is odd
    # (right-edge midpoint) — even keys put it at the center (inside,
    # not touching).  The WKB column is POINT(cx, cy) encoded to NDR
    # bytes via a literal int->IEEE-754 hex map, read back bit-exactly
    # by st_geomfrombinary.  All values are exact doubles.
    oracle="""
SELECT s_suppkey,
       (s_suppkey % 4) IN (1, 2) AS touches_ab,
       CASE s_suppkey % 4 WHEN 0 THEN 'POLYGON' WHEN 1 THEN 'LINESTRING'
            WHEN 2 THEN 'POINT' ELSE 'EMPTY' END AS itype,
       CASE s_suppkey % 4 WHEN 0 THEN r * r ELSE 0.0 END AS iarea,
       (s_suppkey % 2) = 1 AS pt_touches,
       CAST(s_suppkey % 10 AS DOUBLE) AS wkb_x,
       CAST(s_suppkey % 7 AS DOUBLE) AS wkb_y
FROM (SELECT s_suppkey, CAST(1 + s_suppkey % 4 AS DOUBLE) AS r
      FROM supplier) t
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

    s = load_table(spark, sf_dir, "supplier").select(
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
    return staged.select(
        "s_suppkey",
        F.expr("st_touches(ga, gb)").alias("touches_ab"),
        F.expr("coalesce(ab.gtype, 'EMPTY')").alias("itype"),
        F.expr("st_area(ab)").alias("iarea"),
        F.expr("st_touches(gp, ga)").alias("pt_touches"),
        F.expr("st_x(gw)").alias("wkb_x"),
        F.expr("st_y(gw)").alias("wkb_y"),
    )
