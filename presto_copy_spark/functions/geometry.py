"""WKT geometry subset — polygons, linestrings, multipoint — as pure
Catalyst expressions.

Reference: presto-main/.../geospatial/GeoFunctions.java (1,344 LoC over
Esri geometries).  The container ships no geometry library, so this
module implements the planar-geometry core directly with Spark SQL
primitives: WKT parsing via regexp + split, and area / centroid /
point-in-polygon / length / envelope via higher-order functions over
the coordinate arrays.  Everything stays JVM-side (interpreted HOFs —
off the codegen fast path but no Python round-trip, no driver
collection; at 100 TB geometry columns never leave the executors).

Representation (documented engine type, like functions/geo.py points):

    geometry := struct<
        gtype  string,                     -- POINT|LINESTRING|POLYGON|MULTIPOINT
        rings  array<array<struct<x double, y double>>>
    >

POINT/LINESTRING/MULTIPOINT carry one ring; POLYGON carries shell +
holes (WKT order; shell first).  Polygon rings follow WKT's closed-ring
convention (first point repeated last).

Semantics parity notes vs GeoFunctions.java:
- ST_Area: |shoelace(shell)| - sum |shoelace(hole)| (planar, like the
  reference's default planar geometry).
- ST_Contains here is polygon-contains-POINT (even-odd ray cast, holes
  subtract).  Boundary points are implementation-defined in the
  reference too (Esri relate); tests avoid exact-boundary probes.
- ST_Centroid: area-weighted polygon centroid over the shell; POINT ->
  itself; LINESTRING -> length-weighted segment midpoint average.
- ST_Length: LINESTRING only (the reference raises on polygons too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "st_geometry_from_text",
    "st_as_text",
    "st_area",
    "st_centroid",
    "st_polygon_contains_point",
    "st_length",
    "st_num_points",
    "st_envelope_of",
    "st_geometry_type",
]


def _col(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _parse_rings(wkt: Column) -> Column:
    """array of '(x y, x y, ...)' ring bodies -> array<array<point>>."""
    # innermost paren groups = ring bodies (the [^()]+ class can't cross
    # a nested paren, so POLYGON ((..),(..)) yields exactly its rings)
    ring_bodies = F.regexp_extract_all(wkt, F.lit(r"\(([^()]+)\)"), 1)
    return F.transform(
        ring_bodies,
        lambda body: F.transform(
            F.split(body, ","),
            lambda pair: F.struct(
                F.element_at(F.split(F.trim(pair), "\\s+"), 1)
                .cast("double")
                .alias("x"),
                F.element_at(F.split(F.trim(pair), "\\s+"), 2)
                .cast("double")
                .alias("y"),
            ),
        ),
    )


def st_geometry_from_text(wkt) -> Column:
    """GeoFunctions.java stGeometryFromText subset: POINT, LINESTRING,
    POLYGON (with holes), MULTIPOINT.  Unknown types yield NULL gtype
    (callers can filter), matching TRY(ST_GeometryFromText(...)) use."""
    w = F.upper(F.trim(_col(wkt)))
    gtype = F.regexp_extract(w, "^(POINT|LINESTRING|POLYGON|MULTIPOINT)", 1)
    # POINT (1 2) has no nested parens; normalize to ring form
    rings = _parse_rings(w)
    return F.struct(
        F.when(gtype != "", gtype).alias("gtype"),
        rings.alias("rings"),
    )


def st_geometry_type(g) -> Column:
    """Presto returns ST_<Type> (GeometryType.java)."""
    t = _col(g)["gtype"]
    return F.concat(
        F.lit("ST_"), F.initcap(F.lower(t))
    )


def st_as_text(g) -> Column:
    """Round-trippable WKT (coordinate text via double->string cast)."""
    g = _col(g)
    fmt_pt = lambda p: F.concat_ws(" ", p["x"].cast("string"), p["y"].cast("string"))  # noqa: E731
    ring_txt = F.transform(
        g["rings"],
        lambda ring: F.concat(
            F.lit("("), F.array_join(F.transform(ring, fmt_pt), ", "), F.lit(")")
        ),
    )
    body = F.array_join(ring_txt, ", ")
    return F.when(
        g["gtype"] == "POINT",
        # POINT uses bare parens: POINT (x y)
        F.concat(F.lit("POINT "), body),
    ).otherwise(F.concat(g["gtype"], F.lit(" ("), body, F.lit(")")))


def _ring_shoelace2(ring: Column) -> Column:
    """2x signed shoelace area of a closed ring (sum over consecutive
    pairs; the WKT closing point makes the wrap-around edge explicit)."""
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    cross = F.zip_with(a, b, lambda p, q: p["x"] * q["y"] - q["x"] * p["y"])
    return F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)


def st_area(g) -> Column:
    """|shell| - sum |holes| (planar shoelace)."""
    g = _col(g)
    areas = F.transform(g["rings"], lambda r: F.abs(_ring_shoelace2(r)) / 2.0)
    shell = F.element_at(areas, 1)
    holes = F.aggregate(
        F.slice(areas, 2, F.greatest(F.size(areas) - 1, F.lit(0))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(g["gtype"] == "POLYGON", shell - holes).otherwise(F.lit(0.0))


def st_centroid(g) -> Column:
    """POINT -> itself; POLYGON -> area-weighted centroid of the shell;
    LINESTRING -> length-weighted midpoint average."""
    g = _col(g)
    first_pt = F.element_at(F.element_at(g["rings"], 1), 1)
    shell = F.element_at(g["rings"], 1)
    n = F.size(shell)
    a = F.slice(shell, 1, n - 1)
    b = F.slice(shell, 2, n - 1)
    cross = F.zip_with(a, b, lambda p, q: p["x"] * q["y"] - q["x"] * p["y"])
    cx_terms = F.zip_with(
        a, b, lambda p, q: (p["x"] + q["x"]) * (p["x"] * q["y"] - q["x"] * p["y"])
    )
    cy_terms = F.zip_with(
        a, b, lambda p, q: (p["y"] + q["y"]) * (p["x"] * q["y"] - q["x"] * p["y"])
    )
    twice_area = F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)
    poly_c = F.struct(
        (F.aggregate(cx_terms, F.lit(0.0), lambda acc, v: acc + v) / (3 * F.nullif(twice_area, F.lit(0.0)))).alias("x"),
        (F.aggregate(cy_terms, F.lit(0.0), lambda acc, v: acc + v) / (3 * F.nullif(twice_area, F.lit(0.0)))).alias("y"),
    )
    seg_len = F.zip_with(
        a, b, lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"]) + (q["y"] - p["y"]) * (q["y"] - p["y"])
        )
    )
    total_len = F.aggregate(seg_len, F.lit(0.0), lambda acc, v: acc + v)
    mid_x = F.zip_with(a, b, lambda p, q: (p["x"] + q["x"]) / 2.0)
    mid_y = F.zip_with(a, b, lambda p, q: (p["y"] + q["y"]) / 2.0)
    line_c = F.struct(
        (
            F.aggregate(
                F.zip_with(mid_x, seg_len, lambda m, w: m * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.nullif(total_len, F.lit(0.0))
        ).alias("x"),
        (
            F.aggregate(
                F.zip_with(mid_y, seg_len, lambda m, w: m * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.nullif(total_len, F.lit(0.0))
        ).alias("y"),
    )
    return (
        F.when(g["gtype"] == "POINT", F.struct(first_pt["x"].alias("x"), first_pt["y"].alias("y")))
        .when(g["gtype"] == "POLYGON", poly_c)
        .otherwise(line_c)
    )


def _ring_crossings(ring: Column, px: Column, py: Column) -> Column:
    """Even-odd ray-cast parity (0/1) of point (px,py) vs one ring."""
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    crossed = F.zip_with(
        a,
        b,
        lambda p, q: F.when(
            ((p["y"] > py) != (q["y"] > py))
            & (px < (q["x"] - p["x"]) * (py - p["y"]) / (q["y"] - p["y"]) + p["x"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(crossed, F.lit(0), lambda acc, v: acc + v) % 2


def st_polygon_contains_point(g, px, py) -> Column:
    """Even-odd containment incl. holes: XOR of all ring parities."""
    g, px, py = _col(g), _col(px).cast("double"), _col(py).cast("double")
    parities = F.transform(g["rings"], lambda r: _ring_crossings(r, px, py))
    total = F.aggregate(parities, F.lit(0), lambda acc, v: acc + v)
    return (g["gtype"] == "POLYGON") & (total % 2 == 1)


def _segments(ring: Column) -> Column:
    """Consecutive point pairs of a ring as array<struct<p, q>>."""
    n = F.size(ring)
    return F.zip_with(
        F.slice(ring, 1, n - 1),
        F.slice(ring, 2, n - 1),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )


def _orient(p: Column, q: Column, r: Column) -> Column:
    """Sign of the cross product (q-p) x (r-p): +1 left turn, -1 right,
    0 collinear."""
    return F.signum(
        (q["x"] - p["x"]) * (r["y"] - p["y"])
        - (q["y"] - p["y"]) * (r["x"] - p["x"])
    )


def _proper_cross(sa: Column, sb: Column) -> Column:
    """Segments properly cross (straddle each other; endpoints touching
    or collinear overlap excluded — boundary contact is
    implementation-defined in the reference's Esri relate too)."""
    o1 = _orient(sa["p"], sa["q"], sb["p"])
    o2 = _orient(sa["p"], sa["q"], sb["q"])
    o3 = _orient(sb["p"], sb["q"], sa["p"])
    o4 = _orient(sb["p"], sb["q"], sa["q"])
    return (o1 * o2 < 0) & (o3 * o4 < 0)


def _shells_cross(a: Column, b: Column) -> Column:
    """Any proper edge crossing between the two SHELL rings (O(|A|*|B|)
    per row over the coordinate arrays — rings are small; the pairwise
    loop stays inside one JVM expression, row-local at any scale)."""
    segs_a = _segments(F.element_at(a["rings"], 1))
    segs_b = _segments(F.element_at(b["rings"], 1))
    return F.exists(
        segs_a, lambda sa: F.exists(segs_b, lambda sb: _proper_cross(sa, sb))
    )


def st_intersects(a, b) -> Column:
    """GeoFunctions.java stIntersects for POLYGON/POLYGON (shells):
    true iff an edge of A properly crosses an edge of B, or either
    polygon contains a vertex of the other (covers containment without
    crossings).  Holes are ignored (a geometry living entirely inside
    the other's hole still reports true) — documented subset."""
    a, b = _col(a), _col(b)
    va = F.element_at(F.element_at(a["rings"], 1), 1)
    vb = F.element_at(F.element_at(b["rings"], 1), 1)
    return (
        _shells_cross(a, b)
        | st_polygon_contains_point(b, va["x"], va["y"])
        | st_polygon_contains_point(a, vb["x"], vb["y"])
    )


def st_within(a, b) -> Column:
    """GeoFunctions.java stWithin for POLYGON-in-POLYGON (shells):
    every vertex of A's shell strictly inside B and no proper edge
    crossings.  Boundary-touching cases are implementation-defined
    (same caveat as ST_Contains above)."""
    a, b = _col(a), _col(b)
    shell_a = F.element_at(a["rings"], 1)
    all_in = F.forall(
        shell_a, lambda p: st_polygon_contains_point(b, p["x"], p["y"])
    )
    return all_in & ~_shells_cross(a, b)


def st_length(g) -> Column:
    """LINESTRING length (sum of segment lengths)."""
    g = _col(g)
    ring = F.element_at(g["rings"], 1)
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    seg = F.zip_with(
        a, b, lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"]) + (q["y"] - p["y"]) * (q["y"] - p["y"])
        )
    )
    return F.when(
        g["gtype"] == "LINESTRING",
        F.aggregate(seg, F.lit(0.0), lambda acc, v: acc + v),
    ).otherwise(F.lit(0.0))


def st_num_points(g) -> Column:
    g = _col(g)
    return F.aggregate(
        F.transform(g["rings"], F.size), F.lit(0), lambda acc, v: acc + v
    )


def st_envelope_of(g) -> Column:
    """Bounding box struct<xmin,ymin,xmax,ymax> of any geometry."""
    g = _col(g)
    xs = F.flatten(F.transform(g["rings"], lambda r: F.transform(r, lambda p: p["x"])))
    ys = F.flatten(F.transform(g["rings"], lambda r: F.transform(r, lambda p: p["y"])))
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


# ---------------------------------------------------------------------------
# SQL-invocable twins: the same formulas as the Column helpers above,
# registered as CREATE TEMPORARY FUNCTION bodies so SQL text can call
# ST_GeometryFromText / ST_Area / ... directly (Catalyst inlines them).
# ---------------------------------------------------------------------------

GEOM_T = (
    "STRUCT<gtype: STRING, rings: ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>"
)


def _sql_ring_shoelace2(r: str) -> str:
    return (
        f"aggregate(zip_with(slice({r}, 1, size({r}) - 1),"
        f" slice({r}, 2, size({r}) - 1),"
        " (p, q) -> p.x * q.y - q.x * p.y), 0D, (a, v) -> a + v)"
    )


_SQL_AREAS = f"transform(g.rings, r -> abs({_sql_ring_shoelace2('r')}) / 2)"

SQL_GEOMETRY_UDFS: dict[str, tuple[str, str, str]] = {
    "st_geometryfromtext": (
        "w STRING",
        GEOM_T,
        "named_struct("
        " 'gtype', nullif(regexp_extract(upper(trim(w)),"
        " '^(POINT|LINESTRING|POLYGON|MULTIPOINT)', 1), ''),"
        " 'rings', transform("
        r"   regexp_extract_all(upper(trim(w)), '\\(([^()]+)\\)', 1),"
        "   body -> transform(split(body, ','),"
        r"     pair -> named_struct("
        r"       'x', CAST(element_at(split(trim(pair), '\\s+'), 1) AS DOUBLE),"
        r"       'y', CAST(element_at(split(trim(pair), '\\s+'), 2) AS DOUBLE)))))",
    ),
    "st_area": (
        f"g {GEOM_T}",
        "DOUBLE",
        "CASE WHEN g.gtype = 'POLYGON' THEN"
        f" element_at({_SQL_AREAS}, 1)"
        f" - aggregate(slice({_SQL_AREAS}, 2,"
        f"     greatest(size(g.rings) - 1, 0)), 0D, (a, v) -> a + v)"
        " ELSE 0D END",
    ),
    "st_numpoints": (
        f"g {GEOM_T}",
        "INT",
        "aggregate(transform(g.rings, r -> size(r)), 0, (a, v) -> a + v)",
    ),
    "st_length": (
        f"g {GEOM_T}",
        "DOUBLE",
        "CASE WHEN g.gtype = 'LINESTRING' THEN"
        " aggregate(zip_with("
        "   slice(element_at(g.rings, 1), 1, size(element_at(g.rings, 1)) - 1),"
        "   slice(element_at(g.rings, 1), 2, size(element_at(g.rings, 1)) - 1),"
        "   (p, q) -> sqrt((q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y))),"
        "   0D, (a, v) -> a + v)"
        " ELSE 0D END",
    ),
    "st_contains_point": (
        f"g {GEOM_T}, px DOUBLE, py DOUBLE",
        "BOOLEAN",
        "g.gtype = 'POLYGON' AND aggregate(transform(g.rings,"
        " r -> aggregate(zip_with(slice(r, 1, size(r) - 1), slice(r, 2, size(r) - 1),"
        "   (p, q) -> CASE WHEN ((p.y > py) != (q.y > py))"
        "     AND (px < (q.x - p.x) * (py - p.y) / (q.y - p.y) + p.x)"
        "     THEN 1 ELSE 0 END), 0, (a, v) -> a + v) % 2),"
        " 0, (a, v) -> a + v) % 2 = 1",
    ),
    "st_point": (
        "x DOUBLE, y DOUBLE",
        GEOM_T,
        "named_struct('gtype', 'POINT',"
        " 'rings', array(array(named_struct('x', x, 'y', y))))",
    ),
    # Presto signature: ST_Contains(geometry, geometry) — supported for
    # a POINT probe (the reference's spatial-join workload shape);
    # non-point probes return NULL rather than a wrong answer.
    "st_contains": (
        f"g {GEOM_T}, p {GEOM_T}",
        "BOOLEAN",
        "CASE WHEN p.gtype = 'POINT' THEN st_contains_point(g,"
        " element_at(element_at(p.rings, 1), 1).x,"
        " element_at(element_at(p.rings, 1), 1).y) END",
    ),
    "st_geometrytype": (
        f"g {GEOM_T}",
        "STRING",
        "concat('ST_', initcap(lower(g.gtype)))",
    ),
    "st_x": (
        f"g {GEOM_T}",
        "DOUBLE",
        "CASE WHEN g.gtype = 'POINT'"
        " THEN element_at(element_at(g.rings, 1), 1).x END",
    ),
    "st_y": (
        f"g {GEOM_T}",
        "DOUBLE",
        "CASE WHEN g.gtype = 'POINT'"
        " THEN element_at(element_at(g.rings, 1), 1).y END",
    ),
    # polygon-polygon predicates (GeoFunctions.java stIntersects /
    # stWithin) — same orientation-sign segment test as the Column
    # helpers above; bodies reference st_contains_point, which registers
    # earlier in this dict's order
    "st_intersects": (
        f"a {GEOM_T}, b {GEOM_T}",
        "BOOLEAN",
        "__CROSS__"
        " OR __B_HAS_AV__ OR __A_HAS_BV__",
    ),
    # NOTE: the containment test is INLINED (not a st_contains_point
    # call): a SQL-UDF call inside a higher-order lambda cannot
    # reference the lambda variable (Spark wraps UDF args in a Project
    # that the lambda var cannot cross), so st_within generates the
    # ray-cast directly into the forall body.
    "st_within": (
        f"a {GEOM_T}, b {GEOM_T}",
        "BOOLEAN",
        "forall(element_at(a.rings, 1), vp -> __B_HAS_VP__)"
        " AND NOT (__CROSS__)",
    ),
}


def _sql_contains_point(g: str, px: str, py: str) -> str:
    """Even-odd ray-cast containment as inlinable SQL text (the same
    formula as the st_contains_point macro, parameterized so it can sit
    inside another expression's lambda)."""
    return (
        f"(({g}.gtype = 'POLYGON') AND aggregate(transform({g}.rings,"
        f" r9 -> aggregate(zip_with(slice(r9, 1, size(r9) - 1), slice(r9, 2, size(r9) - 1),"
        f"   (p9, q9) -> CASE WHEN ((p9.y > {py}) != (q9.y > {py}))"
        f"     AND ({px} < (q9.x - p9.x) * ({py} - p9.y) / (q9.y - p9.y) + p9.x)"
        f"     THEN 1 ELSE 0 END), 0, (a9, v9) -> a9 + v9) % 2),"
        f" 0, (a8, v8) -> a8 + v8) % 2 = 1)"
    )


def _sql_segs(r: str) -> str:
    return (
        f"zip_with(slice({r}, 1, size({r}) - 1), slice({r}, 2, size({r}) - 1),"
        " (sp, sq) -> named_struct('p', sp, 'q', sq))"
    )


def _sql_orient(p: str, q: str, r: str) -> str:
    return (
        f"sign(({q}.x - {p}.x) * ({r}.y - {p}.y)"
        f" - ({q}.y - {p}.y) * ({r}.x - {p}.x))"
    )


_SQL_PROPER_CROSS = (
    f"({_sql_orient('sa.p', 'sa.q', 'sb.p')} * {_sql_orient('sa.p', 'sa.q', 'sb.q')} < 0)"
    f" AND ({_sql_orient('sb.p', 'sb.q', 'sa.p')} * {_sql_orient('sb.p', 'sb.q', 'sa.q')} < 0)"
)

_SQL_SHELLS_CROSS = (
    f"exists({_sql_segs('element_at(a.rings, 1)')},"
    f" sa -> exists({_sql_segs('element_at(b.rings, 1)')},"
    f" sb -> {_SQL_PROPER_CROSS}))"
)

for _name in ("st_intersects", "st_within"):
    _sig, _ret, _body = SQL_GEOMETRY_UDFS[_name]
    _body = (
        _body.replace("__CROSS__", _SQL_SHELLS_CROSS)
        .replace(
            "__B_HAS_AV__",
            _sql_contains_point(
                "b",
                "element_at(element_at(a.rings, 1), 1).x",
                "element_at(element_at(a.rings, 1), 1).y",
            ),
        )
        .replace(
            "__A_HAS_BV__",
            _sql_contains_point(
                "a",
                "element_at(element_at(b.rings, 1), 1).x",
                "element_at(element_at(b.rings, 1), 1).y",
            ),
        )
        .replace("__B_HAS_VP__", _sql_contains_point("b", "vp.x", "vp.y"))
    )
    SQL_GEOMETRY_UDFS[_name] = (_sig, _ret, _body)


def register_geometry_sql(spark) -> None:
    """Register the SQL-invocable ST_* twins (idempotent per session)."""
    marker = "spark.sql.prestoCompat.geometryRegistered"
    try:
        if spark.conf.get(marker, "false") == "true":
            return
    except Exception:
        pass
    for name, (sig, ret, body) in SQL_GEOMETRY_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig})"
            f" RETURNS {ret} RETURN {body}"
        )
    spark.conf.set(marker, "true")
