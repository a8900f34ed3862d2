"""Geospatial function subset — points, envelopes, Bing tiles.

Reference: presto-main/.../geospatial/GeoFunctions.java (1,344 LoC, 107
functions over full OGC geometries via Esri) and BingTileFunctions.java.
Full geometry (polygons, WKT parsing, geodesic math) needs a geometry
library the container doesn't ship; this module implements the POINT +
axis-aligned-envelope + tile subset as pure Catalyst expressions — the
shapes that cover point-in-region joins, distance joins, and tile-grid
rollups, which is what the reference's SpatialJoinOperator workloads
actually run.  Everything is JVM-side codegen; no UDFs.

Representation: a point is ``struct<x double, y double>`` (planar
coordinates); an envelope is ``struct<xmin,ymin,xmax,ymax>``.  Distances
are Euclidean — like the reference's ST_Distance on its default planar
geometry type (great-circle lives in a separate fn there too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "st_point",
    "st_x",
    "st_y",
    "st_distance",
    "st_envelope_struct",
    "st_contains",
    "st_intersects_envelopes",
    "st_within_distance",
    "bing_tile_at",
    "bing_tile_quadkey",
]


def _col(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def st_point(x, y) -> Column:
    """GeoFunctions.java stPoint: construct a point."""
    return F.struct(_col(x).cast("double").alias("x"), _col(y).cast("double").alias("y"))


def st_x(p) -> Column:
    return _col(p)["x"]


def st_y(p) -> Column:
    return _col(p)["y"]


def st_distance(a, b) -> Column:
    """Euclidean point distance (GeoFunctions.java stDistance, planar)."""
    pa, pb = _col(a), _col(b)
    dx = pa["x"] - pb["x"]
    dy = pa["y"] - pb["y"]
    return F.sqrt(dx * dx + dy * dy)


def st_envelope_struct(xmin, ymin, xmax, ymax) -> Column:
    """Axis-aligned envelope (GeoFunctions.java stEnvelope yields one)."""
    return F.struct(
        _col(xmin).cast("double").alias("xmin"),
        _col(ymin).cast("double").alias("ymin"),
        _col(xmax).cast("double").alias("xmax"),
        _col(ymax).cast("double").alias("ymax"),
    )


def st_contains(env, p) -> Column:
    """Envelope contains point (boundary inclusive, like OGC contains on
    envelopes in GeoFunctions.java stContains for rectangles)."""
    e, pt = _col(env), _col(p)
    return (
        (pt["x"] >= e["xmin"])
        & (pt["x"] <= e["xmax"])
        & (pt["y"] >= e["ymin"])
        & (pt["y"] <= e["ymax"])
    )


def st_intersects_envelopes(a, b) -> Column:
    """Envelope-envelope intersection test (separating-axis)."""
    ea, eb = _col(a), _col(b)
    return (
        (ea["xmin"] <= eb["xmax"])
        & (eb["xmin"] <= ea["xmax"])
        & (ea["ymin"] <= eb["ymax"])
        & (eb["ymin"] <= ea["ymax"])
    )


def st_within_distance(a, b, r: float) -> Column:
    """ST_Distance(a,b) <= r without the sqrt (compare squared)."""
    pa, pb = _col(a), _col(b)
    dx = pa["x"] - pb["x"]
    dy = pa["y"] - pb["y"]
    return (dx * dx + dy * dy) <= float(r) * float(r)


# ---------------------------------------------------------------------------
# Bing tiles (BingTileFunctions.java bingTileAt / toQuadKey): Web-Mercator
# tile of a lat/lon at a zoom level, and the interleaved-bit quadkey.
# ---------------------------------------------------------------------------
def bing_tile_at(lat, lon, zoom: int) -> Column:
    """(tile_x, tile_y) struct of the Web-Mercator tile containing the
    point.  Formula per the public Bing tile system spec (the same one
    BingTileFunctions.java implements); clamped to the valid tile range
    so the pole singularity can't produce out-of-range tiles."""
    la, lo = _col(lat).cast("double"), _col(lon).cast("double")
    n = float(1 << zoom)
    x = F.floor((lo + 180.0) / 360.0 * n)
    sin_lat = F.sin(F.radians(la))
    y = F.floor(
        (0.5 - F.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * 3.141592653589793)) * n
    )
    clamp = lambda c: F.greatest(F.lit(0).cast("long"), F.least(c.cast("long"), F.lit(int(n) - 1).cast("long")))  # noqa: E731
    return F.struct(clamp(x).alias("tile_x"), clamp(y).alias("tile_y"))


def bing_tile_quadkey(tile, zoom: int) -> Column:
    """Quadkey string: zoom digits, MSB first; digit i =
    2*bit_i(tile_y) + bit_i(tile_x) (BingTileFunctions.java toQuadKey).
    Unrolled per zoom level with literal shifts — identical arithmetic
    is spelled in the DuckDB oracles."""
    t = _col(tile)
    digits = []
    for i in range(zoom - 1, -1, -1):
        bx = F.floor(t["tile_x"] / (1 << i)) % 2
        by = F.floor(t["tile_y"] / (1 << i)) % 2
        digits.append((by * 2 + bx).cast("int").cast("string"))
    return F.concat(*digits)
