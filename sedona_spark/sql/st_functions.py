"""``from sedona_spark.sql.st_functions import ST_Area, ...`` — the
reference's python DataFrame-API spellings (``python/sedona/spark/sql/
st_functions.py``, 31+ constructor/measure/predicate defs) over this
engine's columnar model.

Each name is a thin callable over the corresponding ``functions/st*``
Column implementation. Usage rule: materialize UDF-backed constructors
(``ST_GeomFromWKT``/``ST_AsText``) in their own ``select`` before
feeding the result to lambda-based measures — Spark cannot nest a
python UDF INSIDE a higher-order-function lambda within one projection
(two chained selects are fine; the optimizer splits them correctly).

The geometry argument is the engine's packed
ring ``array<double>`` (a point is the 2-element ring) rather than a
GeometryType UDT — the one deliberate model difference (see
``geopandas_api`` for the rationale). Names that return geometry return
a packed ring; names the reference defines on two point geometries take
the point rings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sedona_spark.functions import st as _st
from sedona_spark.functions import st_accessors as _acc
from sedona_spark.functions import st_measures as _m


def _px(g: Column) -> Column:
    return F.element_at(g, 1)


def _py(g: Column) -> Column:
    return F.element_at(g, 2)


# --- constructors / IO -----------------------------------------------------

def ST_Point(x: Column, y: Column) -> Column:
    return F.array(x, y)


def ST_GeomFromWKT(wkt: Column) -> Column:
    """Outer ring of the parsed geometry (full ring LIST via
    ``functions.st.st_geom_rings_from_wkt`` for holed/multi input).
    ``F.get`` (0-based, null-safe) rather than ``element_at``: EMPTY
    geometries parse to an empty ring list, and ANSI ``element_at``
    would abort the job instead of yielding null."""
    return F.get(_st.st_geom_rings_from_wkt(wkt), 0)


def ST_AsText(geom: Column) -> Column:
    return _st.st_rings_as_wkt(F.array(geom))


def ST_AsBinary(geom: Column) -> Column:
    return _st.st_rings_as_wkb(F.array(geom))


# --- accessors -------------------------------------------------------------

def ST_X(point: Column) -> Column:
    return _px(point)


def ST_Y(point: Column) -> Column:
    return _py(point)


def ST_NPoints(geom: Column) -> Column:
    return _acc.st_npoints(geom)


def ST_IsClosed(geom: Column) -> Column:
    return _acc.st_is_closed(geom)


def ST_FlipCoordinates(geom: Column) -> Column:
    return _acc.st_flip_coordinates(geom)


def ST_Azimuth(a: Column, b: Column) -> Column:
    return _acc.st_azimuth(_px(a), _py(a), _px(b), _py(b))


# --- measures --------------------------------------------------------------

def ST_Area(geom: Column) -> Column:
    return _m.st_area(geom)


def ST_Length(geom: Column) -> Column:
    return _m.st_perimeter(geom)


def ST_Perimeter(geom: Column) -> Column:
    return _m.st_perimeter(geom)


def ST_Centroid(geom: Column) -> Column:
    cx, cy = _m.st_centroid(geom)
    return F.array(cx, cy)


def ST_Distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two POINT geometries."""
    dx, dy = _px(a) - _px(b), _py(a) - _py(b)
    return F.sqrt(dx * dx + dy * dy)


def ST_DistanceSphere(a: Column, b: Column) -> Column:
    return _m.st_distance_sphere(_px(a), _py(a), _px(b), _py(b))


def ST_DistanceSpheroid(a: Column, b: Column) -> Column:
    return _m.st_distance_spheroid(_px(a), _py(a), _px(b), _py(b))


def ST_Envelope(geom: Column) -> Column:
    x0, y0, x1, y1 = _st.st_envelope_cols(geom)
    return F.array(x0, y0, x1, y0, x1, y1, x0, y1)


# --- predicates ------------------------------------------------------------

def ST_Contains(polygon: Column, point: Column) -> Column:
    return _st.st_contains_point(polygon, _px(point), _py(point))


def ST_Within(point: Column, polygon: Column) -> Column:
    return _st.st_contains_point(polygon, _px(point), _py(point))


def ST_Covers(polygon: Column, point: Column) -> Column:
    return _st.st_covers_point(polygon, _px(point), _py(point))


def ST_Intersects(a: Column, b: Column) -> Column:
    return _st.st_intersects_polygons(a, b)


def ST_DWithin(a: Column, b: Column, distance: float) -> Column:
    return _st.st_dwithin(_px(a), _py(a), _px(b), _py(b), distance)


def ST_IsValid(geom: Column) -> Column:
    return _st.st_is_valid(geom)


# --- transformers ----------------------------------------------------------

def ST_Buffer(geom: Column, distance) -> Column:
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    return _st.st_buffer(geom, d)


def ST_Simplify(geom: Column, tolerance: float) -> Column:
    return _st.st_simplify(geom, float(tolerance))


def ST_ConvexHull(geom: Column) -> Column:
    return _st.st_convex_hull(geom)


def ST_MakeValid(geom: Column) -> Column:
    return _st.st_make_valid(geom)


def ST_Reverse(geom: Column) -> Column:
    return _st.st_reverse(geom)


def ST_HausdorffDistance(a: Column, b: Column) -> Column:
    return _st.st_hausdorff_distance(a, b)


def ST_FrechetDistance(a: Column, b: Column) -> Column:
    return _st.st_frechet_distance(a, b)


# --- aggregates --------------------------------------------------------------

def ST_Envelope_Aggr(geom: Column) -> Column:
    """Aggregate envelope of a geometry group as a rect ring — a true
    agg Column (compose inside ``groupBy().agg(...)``): four min/max
    aggregates over per-row envelope bounds, all codegen."""
    x0, y0, x1, y1 = _st.st_envelope_cols(geom)
    gx0, gy0 = F.min(x0), F.min(y0)
    gx1, gy1 = F.max(x1), F.max(y1)
    return F.array(gx0, gy0, gx1, gy0, gx1, gy1, gx0, gy1)


def ST_Collect_Aggr(geom: Column) -> Column:
    """Aggregate collection (GEOMETRYCOLLECTION analog): the group's
    rings as a deterministic sorted LIST."""
    return F.array_sort(F.collect_list(geom))
