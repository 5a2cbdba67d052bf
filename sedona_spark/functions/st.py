"""ST_* column functions.

Mirrors the needed subset of the reference's ~340-function catalog
(``spark/common/src/main/scala/org/apache/sedona/sql/UDF/Catalog.scala``):
predicates (``Predicates.scala``), measures (``Functions.scala``),
constructors. Design rule: anything expressible as Column arithmetic stays
JVM-side (whole-stage codegen); only general-polygon exact tests cross into
Python, as ONE Arrow-batched ternary classifier (:func:`pip_class`) from
which all boundary-sensitive predicates derive as cheap Column comparisons —
the same CONTAINS/COVERS/INTERSECTS split the reference encodes in
``SpatialPredicateEvaluators.java:25-80``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sedona_spark.geometry import kernels, wkb

# ---------------------------------------------------------------------------
# Pure-Column predicates & measures (JVM-side, codegen'd)
# ---------------------------------------------------------------------------


def st_distance_sq(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Squared planar distance (avoid sqrt on the hot path; compare against
    r² — same trick as comparing JTS distance to a literal)."""
    dx = x1 - x2
    dy = y1 - y2
    return dx * dx + dy * dy


def st_dwithin(x1: Column, y1: Column, x2: Column, y2: Column, r: float) -> Column:
    """Planar ST_DWithin(point, point, r) — inclusive, matching the
    reference's distance-join <= semantics (``JoinQuery.java:433-533``)."""
    return st_distance_sq(x1, y1, x2, y2) <= F.lit(float(r) * float(r))


def env_contains_point(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, px: Column, py: Column
) -> Column:
    return (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)


def env_intersects(
    axmin: Column, aymin: Column, axmax: Column, aymax: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
) -> Column:
    return (axmin <= bxmax) & (bxmin <= axmax) & (aymin <= bymax) & (bymin <= aymax)


def st_envelope_cols(ring: Column) -> list[Column]:
    """Envelope of a packed ring ``array<double>`` as four Columns — pure
    SQL (aggregate over the array), no Python. Analog of ``ST_Envelope``."""
    xs = F.filter(F.transform(ring, lambda v, i: F.when(i % 2 == 0, v)), lambda v: v.isNotNull())
    ys = F.filter(F.transform(ring, lambda v, i: F.when(i % 2 == 1, v)), lambda v: v.isNotNull())
    return [
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    ]


# ---------------------------------------------------------------------------
# Arrow-batched exact predicates (the only Python on the hot path)
# ---------------------------------------------------------------------------


@F.pandas_udf(ByteType())
def _pip_class_udf(ring: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    res = kernels.point_in_polygon_batch(
        ring.to_numpy(), px.to_numpy(), py.to_numpy()
    )
    return pd.Series(res)


def pip_class(ring: Column, px: Column, py: Column) -> Column:
    """Ternary point-vs-polygon classification: 0 out / 1 boundary / 2 in."""
    return _pip_class_udf(ring, px, py)


def st_contains_point(ring: Column, px: Column, py: Column) -> Column:
    """ST_Contains(polygon, point): interior only (boundary excluded)."""
    return pip_class(ring, px, py) == F.lit(2)


def st_covers_point(ring: Column, px: Column, py: Column) -> Column:
    """ST_Covers(polygon, point) ≡ ST_Intersects for point RHS: boundary in."""
    return pip_class(ring, px, py) >= F.lit(1)


@F.pandas_udf(BooleanType())
def _poly_intersects_udf(ring_a: pd.Series, ring_b: pd.Series) -> pd.Series:
    res = kernels.polygons_intersect_batch(ring_a.to_numpy(), ring_b.to_numpy())
    return pd.Series(res)


def st_intersects_polygons(ring_a: Column, ring_b: Column) -> Column:
    """Exact polygon×polygon INTERSECTS (touch counts)."""
    return _poly_intersects_udf(ring_a, ring_b)


# --- multi-ring geometries (Polygon-with-holes / MultiPolygon) --------------


@F.pandas_udf(ByteType())
def _pip_rings_udf(geom: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    res = kernels.point_in_rings_batch(
        geom.to_numpy(), px.to_numpy(), py.to_numpy()
    )
    return pd.Series(res)


def pip_class_multi(geom: Column, px: Column, py: Column) -> Column:
    """Ternary point vs MULTI-RING geometry (``array<array<double>>``):
    even-odd over all rings — holes and MultiPolygon handled exactly
    (JTS Polygon/MultiPolygon PIP parity; single-ring input ≡ pip_class)."""
    return _pip_rings_udf(geom, px, py)


# --- linestrings -------------------------------------------------------------


@F.pandas_udf(BooleanType())
def _line_rings_udf(line: pd.Series, geom: pd.Series) -> pd.Series:
    res = kernels.linestring_intersects_rings_batch(
        line.to_numpy(), geom.to_numpy()
    )
    return pd.Series(res)


def st_intersects_line_polygon(line: Column, geom: Column) -> Column:
    """Exact LineString × (multi)polygon INTERSECTS. ``line`` is a packed
    open polyline ``array<double>``; ``geom`` is ``array<array<double>>``."""
    return _line_rings_udf(line, geom)


@F.pandas_udf(BooleanType())
def _line_line_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    res = kernels.linestrings_intersect_batch(a.to_numpy(), b.to_numpy())
    return pd.Series(res)


def st_intersects_lines(a: Column, b: Column) -> Column:
    """Exact LineString × LineString INTERSECTS (touch counts)."""
    return _line_line_udf(a, b)


# --- full polygon-pair predicate family (Predicates.java:25-106) -------------


_FLAGS_TYPE = StructType(
    [
        StructField("intersects", BooleanType()),
        StructField("ii", BooleanType()),
        StructField("a_in_b", BooleanType()),
        StructField("b_in_a", BooleanType()),
        StructField("a_bnd_ii", BooleanType()),
        StructField("b_bnd_ii", BooleanType()),
        StructField("bb_dim1", BooleanType()),
        StructField("bb_touch", BooleanType()),
    ]
)


@F.pandas_udf(_FLAGS_TYPE)
def _pair_flags_udf(ring_a: pd.Series, ring_b: pd.Series) -> pd.DataFrame:
    f = kernels.polygon_pair_flags_batch(ring_a.to_numpy(), ring_b.to_numpy())
    return pd.DataFrame(f)


def st_relate_flags(ring_a: Column, ring_b: Column) -> Column:
    """ONE Arrow-batched kernel call returning the four primitive flags
    (intersects / interiors-intersect / A⊆B / B⊆A) from which every DE-9IM
    areal predicate derives as a Column expression — the same
    evaluate-once-derive-many split as ``SpatialPredicateEvaluators.java``.
    Exact for arbitrary SIMPLE polygon pairs (convex or concave single
    rings — see ``kernels.polygon_pair_flags_batch``)."""
    return _pair_flags_udf(ring_a, ring_b)


def st_predicates_from_flags(flags: Column) -> dict[str, Column]:
    """Derived areal predicates (mirrors ``Predicates.java:25-106``):
    ST_Intersects / Disjoint / Touches / Overlaps / Equals / Within /
    Contains / Covers / CoveredBy / Crosses (area×area crosses ≡ false)."""
    its = flags["intersects"]
    ii = flags["ii"]
    a_in_b = flags["a_in_b"]
    b_in_a = flags["b_in_a"]
    return {
        "intersects": its,
        "disjoint": ~its,
        "touches": its & ~ii,
        "overlaps": ii & ~a_in_b & ~b_in_a,
        "st_equals": a_in_b & b_in_a,
        "within": a_in_b,
        "contains": b_in_a,
        "covers": b_in_a,
        "covered_by": a_in_b,
        "crosses": F.lit(False),
    }


def st_relate(flags: Column) -> Column:
    """DE-9IM matrix STRING for an areal×areal pair from the kernel flags
    (``SpatialPredicate.java:26-36``, ``Predicates.scala`` ST_Relate).

    Cell derivations for positive-area simple polygons:
    II=2 iff interiors meet; IB/BI=1 iff the opposing boundary enters the
    interior (a boundary piece inside an open set has dimension 1); IE=F
    iff A ⊆ B else 2 (same for EI/EB mirrored); BB=1 for a collinear
    overlap span, 0 for point contact, F otherwise; BE=F iff A ⊆ B (∂A ⊆ B
    ⇔ A ⊆ B for simple rings); EE=2 always."""
    def dim(cond: Column, yes: str, no: str) -> Column:
        return F.when(cond, F.lit(yes)).otherwise(F.lit(no))

    return F.concat(
        dim(flags["ii"], "2", "F"),
        dim(flags["b_bnd_ii"], "1", "F"),
        dim(flags["a_in_b"], "F", "2"),
        dim(flags["a_bnd_ii"], "1", "F"),
        F.when(flags["bb_dim1"], F.lit("1"))
        .when(flags["bb_touch"], F.lit("0"))
        .otherwise(F.lit("F")),
        dim(flags["a_in_b"], "F", "1"),
        dim(flags["b_in_a"], "F", "2"),
        dim(flags["b_in_a"], "F", "1"),
        F.lit("2"),
    )


def st_relate_match(relate_str: Column, pattern: str) -> Column:
    """ST_RelateMatch: does a DE-9IM string satisfy an intersection-matrix
    pattern (``*`` any, ``T`` = 0/1/2, ``F``, or an exact dimension)."""
    conds = []
    for i, p in enumerate(pattern):
        c = F.substring(relate_str, i + 1, 1)
        if p == "*":
            continue
        if p == "T":
            conds.append(c != "F")
        else:
            conds.append(c == p)
    out = F.lit(True)
    for cc in conds:
        out = out & cc
    return out


def st_ordering_equals(ring_a: Column, ring_b: Column) -> Column:
    """ST_OrderingEquals: identical vertex sequence (same start, same
    order) — plain array equality on the packed rings, pure codegen."""
    return ring_a == ring_b


# --- editors: ST_Simplify / ST_ConvexHull (constructor tier) -----------------


@F.pandas_udf(ArrayType(DoubleType()))
def _simplify_udf(path: pd.Series, tol: pd.Series) -> pd.Series:
    out = []
    for p, t in zip(path, tol):
        out.append(
            kernels.simplify_dp(
                np.asarray(p, dtype=np.float64).reshape(-1, 2), float(t)
            ).ravel()
        )
    return pd.Series(out)


def st_simplify(path: Column, tol: float) -> Column:
    """ST_Simplify (Douglas-Peucker, endpoints kept): packed polyline/ring →
    simplified packed array. Per-geometry recursion like the reference's
    JTS ``DouglasPeuckerSimplifier`` — constructor tier, not a join refine."""
    return _simplify_udf(path, F.lit(float(tol)))


@F.pandas_udf(ArrayType(DoubleType()))
def _hull_udf(pts: pd.Series) -> pd.Series:
    out = []
    for p in pts:
        out.append(
            kernels.convex_hull(
                np.asarray(p, dtype=np.float64).reshape(-1, 2)
            ).ravel()
        )
    return pd.Series(out)


def st_convex_hull(pts: Column) -> Column:
    """ST_ConvexHull of a packed coordinate array → CCW hull ring."""
    return _hull_udf(pts)


# ---------------------------------------------------------------------------
# WKB interop (constructors / output, cf. Catalog.scala constructor block)
# ---------------------------------------------------------------------------


@F.pandas_udf(ArrayType(DoubleType()))
def st_geom_from_wkt(wkt_s: pd.Series) -> pd.Series:
    """ST_GeomFromWKT for POINT / LINESTRING / POLYGON (shell ring) → packed
    ``array<double>``. Number extraction is vectorized pandas string ops;
    the residual per-row float conversion is the same per-geometry parse the
    reference's WKTReader does."""
    stripped = wkt_s.str.strip()
    inner = stripped.str.extract(r"\(+\s*(.*?)\s*\)+")[0]
    # a ')' INSIDE the text means interior rings / MULTI* parts — the
    # capture above would silently truncate to the first ring, so reject
    # those rows as null instead of returning a wrong geometry (ADVICE r2)
    multi = stripped.str.contains(r"\)\s*,\s*\(", regex=True).fillna(False)
    inner = inner.mask(multi)
    toks = inner.str.replace(",", " ", regex=False).str.split()
    return toks.apply(
        lambda v: np.array([float(t) for t in v]) if isinstance(v, list) else None
    )


@F.pandas_udf(BinaryType())
def st_point_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    # numpy-vectorized byte assembly (no per-row struct.pack)
    return pd.Series(wkb.wkb_points_batch(x.to_numpy(), y.to_numpy()))


@F.pandas_udf(BinaryType())
def st_polygon_wkb(ring: pd.Series) -> pd.Series:
    return pd.Series([wkb.wkb_polygon(r) for r in ring])


@F.pandas_udf(StringType())
def st_astext(buf: pd.Series) -> pd.Series:
    return pd.Series([wkb.wkt(b) for b in buf])


# --- full geometry model (holes + MULTI*), ring-list interop (r4) -----------
# WKT/WKB ↔ canonical ring list (array<array<double>>: shells CCW, holes
# CW). The ring list feeds every existing multi-ring kernel unchanged
# (pip_class_multi, st_rings_area below). Reference surface:
# python/sedona/spark/sql/st_constructors.py (31 defs),
# GeometrySerializer.java:36-72.


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def st_geom_rings_from_wkt(wkt_s: pd.Series) -> pd.Series:
    """ST_GeomFromWKT, full model: POLYGON with holes and MULTIPOLYGON →
    canonical ring list (even-odd semantics). POINT/LINESTRING payloads
    come back as a single pseudo-ring; malformed input → null."""
    out = []
    for s in wkt_s:
        kind, rings = (None, None) if s is None else wkb.parse_wkt_rings(s)
        out.append(None if kind is None else [r.ravel() for r in rings])
    return pd.Series(out)


@F.pandas_udf(StringType())
def st_rings_as_wkt(rings: pd.Series) -> pd.Series:
    """ST_AsText for ring lists: reconstructs POLYGON / MULTIPOLYGON
    grouping from ring orientation + containment (``wkb.group_rings``)."""
    return pd.Series([
        None if r is None else wkb.rings_to_wkt([
            np.asarray(q, dtype=np.float64).reshape(-1, 2) for q in r
        ])
        for r in rings
    ])


@F.pandas_udf(BinaryType())
def st_rings_as_wkb(rings: pd.Series) -> pd.Series:
    """ST_AsBinary for ring lists → ISO WKB POLYGON/MULTIPOLYGON."""
    return pd.Series([
        None if r is None else wkb.wkb_from_rings([
            np.asarray(q, dtype=np.float64).reshape(-1, 2) for q in r
        ])
        for r in rings
    ])


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def st_geom_rings_from_wkb(buf: pd.Series) -> pd.Series:
    """ST_GeomFromWKB, full model (POLYGON holes + MULTIPOLYGON kept)."""
    out = []
    for b in buf:
        if b is None:
            out.append(None)
            continue
        try:
            _, rings = wkb.parse_wkb_rings(bytes(b))
        except ValueError:
            out.append(None)
            continue
        out.append([r.ravel() for r in rings])
    return pd.Series(out)


_RINGS_STATS_TYPE = StructType([
    StructField("area", DoubleType()),
    StructField("n_rings", LongType()),
    StructField("nv", LongType()),
    StructField("n_holes", LongType()),
])


@F.pandas_udf(_RINGS_STATS_TYPE)
def _rings_stats_udf(rings: pd.Series) -> pd.DataFrame:
    areas, nr, nv, nh = [], [], [], []
    for r in rings:
        if r is None:
            areas.append(None)
            nr.append(0)
            nv.append(0)
            nh.append(0)
            continue
        rs = [
            wkb._dedup_closed(np.asarray(q, dtype=np.float64).reshape(-1, 2))
            for q in r
        ]
        signed = [wkb._signed_area(q) for q in rs]
        # canonical orientation ⇒ net area = plain signed sum (shell + /
        # hole −), correct across MultiPolygon parts too
        areas.append(sum(signed))
        nr.append(len(rs))
        nv.append(sum(len(q) for q in rs))
        nh.append(sum(1 for s in signed if s < 0.0))
    return pd.DataFrame(
        {"area": areas, "n_rings": nr, "nv": nv, "n_holes": nh}
    )


def st_rings_stats(rings: Column) -> Column:
    """(net area incl. holes, n_rings, total nv) of a canonical ring list."""
    return _rings_stats_udf(rings)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _make_valid_udf(ring: pd.Series) -> pd.Series:
    out = []
    for r in ring:
        if r is None:
            out.append(None)
            continue
        out.append([
            p.ravel()
            for p in kernels.make_valid(np.asarray(r, dtype=np.float64))
        ])
    return pd.Series(out)


def st_make_valid(ring: Column) -> Column:
    """ST_MakeValid (reference ``Catalog.scala:114``, JTS MakeValid): the
    even-odd interior of a possibly self-intersecting ring as a LIST of
    simple rings (``kernels.make_valid`` planar face tracing). Valid
    input passes through as a one-ring list."""
    return _make_valid_udf(ring)


def st_collect(*geoms: Column) -> Column:
    """ST_Collect (``Catalog.scala:195``): combine per-row geometries into
    one multi-geometry ring list — pure Column (array of the ring args)."""
    return F.array(*geoms)


# --- editor tail (r4): Reverse/Force orientation, LineMerge, Snap, Split ---


def st_reverse(ring: Column) -> Column:
    """ST_Reverse of a packed ring/linestring — pure Column index flip
    (codegen; reference ``Catalog.scala`` editors block)."""
    n = (F.size(ring) / 2).cast("int")
    idx = F.sequence(F.lit(0), n - 1)
    return F.flatten(
        F.transform(
            idx,
            lambda i: F.array(
                F.element_at(ring, ((n - 1 - i) * 2 + 1).cast("int")),
                F.element_at(ring, ((n - 1 - i) * 2 + 2).cast("int")),
            ),
        )
    )


def _signed_area2(ring: Column) -> Column:
    from sedona_spark.functions.st_measures import _edge_fold

    return _edge_fold(ring, lambda ax, ay, bx, by: ax * by - bx * ay)


def st_force_ccw(ring: Column) -> Column:
    """ST_ForcePolygonCCW analog: reverse iff currently clockwise."""
    return F.when(_signed_area2(ring) >= 0, ring).otherwise(st_reverse(ring))


def st_force_cw(ring: Column) -> Column:
    """ST_ForcePolygonCW analog."""
    return F.when(_signed_area2(ring) <= 0, ring).otherwise(st_reverse(ring))


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _line_merge_udf(lines: pd.Series) -> pd.Series:
    out = []
    for ls in lines:
        if ls is None:
            out.append(None)
            continue
        merged = kernels.line_merge([
            np.asarray(s, dtype=np.float64).reshape(-1, 2) for s in ls
        ])
        out.append([m.ravel() for m in merged])
    return pd.Series(out)


def st_line_merge(lines: Column) -> Column:
    """ST_LineMerge (``Catalog.scala:130``): sew a collection of
    linestrings (``array<array<double>>``) into maximal chains."""
    return _line_merge_udf(lines)


@F.pandas_udf(ArrayType(DoubleType()))
def _snap_udf(ring: pd.Series, ref: pd.Series, tol: pd.Series) -> pd.Series:
    out = []
    for r, rf, t in zip(ring, ref, tol):
        if r is None or rf is None:
            out.append(None)
            continue
        out.append(kernels.snap_ring(
            np.asarray(r, dtype=np.float64),
            np.asarray(rf, dtype=np.float64),
            float(t),
        ).ravel())
    return pd.Series(out)


def st_snap(ring: Column, ref: Column, tol) -> Column:
    """ST_Snap (``Catalog.scala:137``): vertices of ``ring`` within
    ``tol`` of a ``ref`` vertex move onto it."""
    tol = tol if isinstance(tol, Column) else F.lit(float(tol))
    return _snap_udf(ring, ref, tol)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _split_line_udf(
    ring: pd.Series, x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series
) -> pd.Series:
    out = []
    for r, a, b, c, d in zip(ring, x0, y0, x1, y1):
        if r is None:
            out.append(None)
            continue
        pieces = kernels.split_by_line(
            np.asarray(r, dtype=np.float64),
            (float(a), float(b)), (float(c), float(d)),
        )
        out.append([p.ravel() for p in pieces])
    return pd.Series(out)


def st_split_line(ring: Column, x0, y0, x1, y1) -> Column:
    """ST_Split of a ring by the straight blade through (x0,y0)→(x1,y1):
    canonical rings per side (``kernels.split_by_line``)."""
    as_col = lambda v: v if isinstance(v, Column) else F.lit(float(v))
    return _split_line_udf(ring, as_col(x0), as_col(y0), as_col(x1), as_col(y1))


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _buffer_line_udf(path: pd.Series, r: pd.Series, qs: pd.Series) -> pd.Series:
    out = []
    for p, rr, q in zip(path, r, qs):
        if p is None:
            out.append(None)
            continue
        rings = kernels.buffer_polyline(
            np.asarray(p, dtype=np.float64), float(rr), int(q)
        )
        out.append([x.ravel() for x in rings])
    return pd.Series(out)


def st_buffer_line(path: Column, r, quad_segs: int = 8) -> Column:
    """ST_Buffer of a LINESTRING (round caps/joins): capsule union →
    dissolved canonical rings (``kernels.buffer_polyline``); JTS
    quadrantSegments contract via inscribed 4q-gons. Completes the
    buffer family: point (pure Column), convex ring, and now lines."""
    r = r if isinstance(r, Column) else F.lit(float(r))
    return _buffer_line_udf(path, r, F.lit(int(quad_segs)))


@F.pandas_udf(BooleanType())
def _pip_sphere_udf(geom: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    out = np.zeros(len(geom), dtype=bool)
    lon_v = lon.to_numpy(dtype=np.float64)
    lat_v = lat.to_numpy(dtype=np.float64)
    # vectorize per DISTINCT geometry: joined batches repeat few zones
    # over many points — one winding pass per zone, not per row
    keys = geom.map(lambda g: None if g is None else bytes(
        np.asarray(g, dtype=np.float64).tobytes()))
    for _, idx in keys.groupby(keys).groups.items():
        ii = np.asarray(idx)
        g = geom.iloc[ii[0]]
        if g is None:
            continue
        out[ii] = kernels.point_in_spherical_polygon_batch(
            np.asarray(g, dtype=np.float64), lon_v[ii], lat_v[ii]
        )
    return pd.Series(out)


def st_contains_sphere(geom: Column, lon: Column, lat: Column) -> Column:
    """GEOGRAPHY-tier ST_Contains (r4): point vs polygon whose edges are
    GREAT-CIRCLE arcs on the sphere — winding-angle kernel
    (``kernels.point_in_spherical_polygon_batch``), correct across the
    antimeridian and for polar caps where planar PIP is wrong. Contract:
    simple ring smaller than a hemisphere. Reference seam:
    ``GeographyUDT.scala`` (the reference's geography type; its geodesic
    predicates route through S2's winding/crossing machinery)."""
    return _pip_sphere_udf(geom, lon, lat)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def st_geom_rings_from_geojson(gj: pd.Series) -> pd.Series:
    """ST_GeomFromGeoJSON (RFC 7946, full model incl. holes + Multi*) →
    canonical ring list; malformed input → null."""
    out = []
    for s in gj:
        kind, rings = (None, None) if s is None else wkb.parse_geojson_geometry(s)
        out.append(None if kind is None else [r.ravel() for r in rings])
    return pd.Series(out)


@F.pandas_udf(StringType())
def st_rings_as_geojson(rings: pd.Series) -> pd.Series:
    """ST_AsGeoJSON for ring lists (Polygon/MultiPolygon grouping
    reconstructed; RFC 7946 winding + closed rings)."""
    return pd.Series([
        None if r is None else wkb.rings_to_geojson([
            np.asarray(q, dtype=np.float64).reshape(-1, 2) for q in r
        ])
        for r in rings
    ])


@F.pandas_udf(DoubleType())
def _hausdorff_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        None if x is None or y is None else kernels.hausdorff_distance(
            np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        )
        for x, y in zip(a, b)
    ])


@F.pandas_udf(DoubleType())
def _frechet_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        None if x is None or y is None else kernels.frechet_distance(
            np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        )
        for x, y in zip(a, b)
    ])


def st_hausdorff_distance(a: Column, b: Column) -> Column:
    """ST_HausdorffDistance (JTS DiscreteHausdorffDistance: vertices vs
    full segments, symmetric max) over packed coordinate arrays."""
    return _hausdorff_udf(a, b)


def st_frechet_distance(a: Column, b: Column) -> Column:
    """ST_FrechetDistance (discrete Fréchet, Eiter–Mannila DP — the
    order-aware 'dog-leash' metric)."""
    return _frechet_udf(a, b)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _node_udf(lines: pd.Series) -> pd.Series:
    out = []
    for ls in lines:
        if ls is None:
            out.append(None)
            continue
        segs = kernels.node_segments([
            np.asarray(s, dtype=np.float64).reshape(-1, 2) for s in ls
        ])
        out.append([s.ravel() for s in segs])
    return pd.Series(out)


def st_node(lines: Column) -> Column:
    """ST_Node: split the input linework at every crossing → non-crossing
    segments (JTS noding; the Polygonize/MakeValid building block)."""
    return _node_udf(lines)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _polygonize_udf(lines: pd.Series) -> pd.Series:
    out = []
    for ls in lines:
        if ls is None:
            out.append(None)
            continue
        faces = kernels.polygonize_segments([
            np.asarray(s, dtype=np.float64).reshape(-1, 2) for s in ls
        ])
        out.append([f.ravel() for f in faces])
    return pd.Series(out)


def st_polygonize(lines: Column) -> Column:
    """ST_Polygonize (JTS Polygonizer): bounded faces of the input
    linework's arrangement as CCW rings (node + angular face walk)."""
    return _polygonize_udf(lines)


def st_collect_aggr(ring: Column) -> Column:
    """ST_Collect as an AGGREGATE: gather one ring per row into a ring
    list (deterministic only under an upstream sort; pair with
    sort_array for oracle-stable output)."""
    return F.collect_list(ring)


# --- ST_Buffer / ST_Intersection (overlay tier, r3) --------------------------


@F.pandas_udf(ArrayType(DoubleType()))
def _buffer_ring_udf(ring: pd.Series, r: pd.Series, qs: pd.Series) -> pd.Series:
    out = []
    for p, rr, q in zip(ring, r, qs):
        out.append(kernels.buffer_ring(
            np.asarray(p, dtype=np.float64), float(rr), int(q)
        ).ravel())
    return pd.Series(out)


def st_buffer(ring: Column, r: Column, quad_segs: int = 8) -> Column:
    """ST_Buffer of a CONVEX packed ring: outward edge offsets joined by
    arcs segmented per JTS quadrantSegments (reference ``Functions.java``
    buffer; the distance-join rewrite of ``DistanceJoinExec.scala:30-42``
    leans on it). Per-geometry kernel — constructor tier, not join refine.
    For POINT buffers use the pure-Column ``st_measures.st_buffer_point``."""
    return _buffer_ring_udf(ring, r, F.lit(int(quad_segs)))


@F.pandas_udf(ArrayType(DoubleType()))
def _clip_convex_udf(subject: pd.Series, clip: pd.Series) -> pd.Series:
    out = []
    for s, c in zip(subject, clip):
        out.append(kernels.clip_convex(
            np.asarray(s, dtype=np.float64), np.asarray(c, dtype=np.float64)
        ).ravel())
    return pd.Series(out)


def st_intersection(subject: Column, clip: Column) -> Column:
    """ST_Intersection returning GEOMETRY (packed ring) for a simple
    subject clipped by a CONVEX ring — Sutherland–Hodgman
    (``kernels.clip_convex``). Empty array = disjoint. Covers the
    rect/diamond/hull overlay family; general concave×concave overlay
    remains a documented seam (reference: JTS OverlayNG via
    ``Functions.java`` ST_Intersection)."""
    return _clip_convex_udf(subject, clip)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _difference_udf(subject: pd.Series, clip: pd.Series) -> pd.Series:
    out = []
    for s, c in zip(subject, clip):
        out.append([
            p.ravel()
            for p in kernels.difference_convex(
                np.asarray(s, dtype=np.float64), np.asarray(c, dtype=np.float64)
            )
        ])
    return pd.Series(out)


def st_difference(subject: Column, clip: Column) -> Column:
    """ST_Difference returning GEOMETRY: ``subject \\ clip`` for a CONVEX
    clip ring as a LIST of disjoint packed rings (MultiPolygon parts —
    pair with ``posexplode``). Half-plane decomposition
    (``kernels.difference_convex``): pieces tile the difference exactly,
    no overlap. Reference: JTS OverlayNG difference via ``Functions.java``
    ST_Difference."""
    return _difference_udf(subject, clip)


def st_union_tiled(a: Column, b: Column) -> Column:
    """ST_Union returning GEOMETRY as an exact disjoint TILING: ``b``
    itself plus the half-plane decomposition of ``a \\ b`` (``b`` must be
    CONVEX; ``a`` any simple ring). The parts cover a∪b exactly with zero
    overlap — same coverage/area semantics as JTS ST_Union's dissolved
    polygon, represented as touching MultiPolygon parts (the
    boundary-traced single-ring output remains a documented seam)."""
    return F.concat(F.array(b), _difference_udf(a, b))


_RING_STATS_TYPE = StructType(
    [StructField("area", DoubleType()), StructField("nv", LongType())]
)


@F.pandas_udf(_RING_STATS_TYPE)
def _ring_stats_udf(ring: pd.Series) -> pd.DataFrame:
    areas, nvs = [], []
    for p in ring:
        a = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        if len(a) >= 2 and (a[0] == a[-1]).all():
            a = a[:-1]
        if len(a) < 3:
            areas.append(0.0)
            nvs.append(len(a))
            continue
        q = np.roll(a, -1, axis=0)
        areas.append(0.5 * abs(float((a[:, 0] * q[:, 1] - q[:, 0] * a[:, 1]).sum())))
        nvs.append(len(a))
    return pd.DataFrame({"area": areas, "nv": nvs})


def st_ring_stats(ring: Column) -> Column:
    """(area, nv) of a packed ring, computed numpy-side. Use this on rings
    PRODUCED by a Python UDF (st_buffer / st_intersection): Spark 4.1
    cannot place a Python-UDF result inside a higher-order-function lambda
    (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so the Column
    shoelace fold of ``st_measures.st_area`` is not applicable there."""
    return _ring_stats_udf(ring)


# --- Z / M coordinates (ST_PointZ/M family, Catalog.scala:66-71) -------------


def st_point_z(x: Column, y: Column, z: Column) -> Column:
    """ST_PointZ: packed [x, y, z]."""
    return F.array(x, y, z)


def st_point_zm(x: Column, y: Column, z: Column, m: Column) -> Column:
    """ST_PointM with Z: packed [x, y, z, m]."""
    return F.array(x, y, z, m)


def st_x(p: Column) -> Column:
    return F.get(p, 0)


def st_y(p: Column) -> Column:
    return F.get(p, 1)


def st_z(p: Column) -> Column:
    """ST_Z — null when the point has no Z (F.get is bounds-safe under
    ANSI mode, unlike element_at)."""
    return F.get(p, 2)


def st_m(p: Column) -> Column:
    return F.get(p, 3)


def st_has_z(p: Column) -> Column:
    return F.size(p) >= 3


def st_has_m(p: Column) -> Column:
    return F.size(p) >= 4


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _subdivide_udf(ring: pd.Series, nx: pd.Series, ny: pd.Series) -> pd.Series:
    out = []
    for p, gx, gy in zip(ring, nx, ny):
        a = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        x0, y0 = a.min(axis=0)
        x1, y1 = a.max(axis=0)
        gx, gy = int(gx), int(gy)
        xs = np.linspace(x0, x1, gx + 1)
        ys = np.linspace(y0, y1, gy + 1)
        parts = []
        for i in range(gx):
            for j in range(gy):
                cell = np.array(
                    [xs[i], ys[j], xs[i + 1], ys[j],
                     xs[i + 1], ys[j + 1], xs[i], ys[j + 1]]
                )
                piece = kernels.clip_convex(
                    np.asarray(p, dtype=np.float64), cell
                )
                if len(piece) >= 3:
                    parts.append(piece.ravel())
        out.append(parts)
    return pd.Series(out)


def st_subdivide(ring: Column, nx: int, ny: int) -> Column:
    """ST_SubDivide analog (``Catalog.scala`` generator block,
    ST_SubDivideExplode): split a CONVEX ring by an nx×ny grid over its
    envelope into clipped pieces (``array<array<double>>`` — pair with
    ``posexplode`` for the Explode form). The reference subdivides until a
    max-vertex bound; the grid form is the deterministic batch analog."""
    return _subdivide_udf(ring, F.lit(int(nx)), F.lit(int(ny)))


# --- linear referencing (ST_LineInterpolatePoint / LocatePoint / Substring /
#     ClosestPoint — Functions.java via JTS LengthIndexedLine/DistanceOp) ---


@F.pandas_udf(ArrayType(DoubleType()))
def _line_interpolate_udf(line: pd.Series, frac: pd.Series) -> pd.Series:
    out = []
    for ln, fr in zip(line, frac):
        out.append(
            kernels.polyline_interpolate(
                np.asarray(ln, dtype=np.float64), float(fr)
            )
        )
    return pd.Series(out)


def st_line_interpolate_point(line: Column, frac) -> Column:
    """ST_LineInterpolatePoint: [x, y] at ``frac`` of total length."""
    frac = frac if isinstance(frac, Column) else F.lit(float(frac))
    return _line_interpolate_udf(line, frac)


_LOCATE_TYPE = StructType(
    [
        StructField("frac", DoubleType()),
        StructField("cx", DoubleType()),
        StructField("cy", DoubleType()),
    ]
)


@F.pandas_udf(_LOCATE_TYPE)
def _line_locate_udf(line: pd.Series, px: pd.Series, py: pd.Series) -> pd.DataFrame:
    fr, xs, ys = [], [], []
    for ln, x, y in zip(line, px, py):
        f, foot = kernels.polyline_locate(
            np.asarray(ln, dtype=np.float64), float(x), float(y)
        )
        fr.append(f)
        xs.append(float(foot[0]))
        ys.append(float(foot[1]))
    return pd.DataFrame({"frac": fr, "cx": xs, "cy": ys})


def st_line_locate_point(line: Column, px: Column, py: Column) -> Column:
    """ST_LineLocatePoint + ST_ClosestPoint in one pass: struct(frac, cx,
    cy) — the fraction along ``line`` of the closest point and that point
    itself (ties resolved to the lowest fraction, JTS semantics)."""
    return _line_locate_udf(line, px, py)


@F.pandas_udf(ArrayType(DoubleType()))
def _line_substring_udf(line: pd.Series, f0: pd.Series, f1: pd.Series) -> pd.Series:
    out = []
    for ln, a, b in zip(line, f0, f1):
        out.append(
            kernels.polyline_substring(
                np.asarray(ln, dtype=np.float64), float(a), float(b)
            ).ravel()
        )
    return pd.Series(out)


def st_line_substring(line: Column, f0, f1) -> Column:
    """ST_LineSubstring: packed sub-polyline between two fractions."""
    f0 = f0 if isinstance(f0, Column) else F.lit(float(f0))
    f1 = f1 if isinstance(f1, Column) else F.lit(float(f1))
    return _line_substring_udf(line, f0, f1)


_PATH_STATS_TYPE = StructType(
    [StructField("length", DoubleType()), StructField("nv", LongType())]
)


@F.pandas_udf(_PATH_STATS_TYPE)
def _path_stats_udf(path: pd.Series) -> pd.DataFrame:
    lens, nvs = [], []
    for p in path:
        a = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        d = a[1:] - a[:-1]
        lens.append(float(np.hypot(d[:, 0], d[:, 1]).sum()))
        nvs.append(len(a))
    return pd.DataFrame({"length": lens, "nv": nvs})


def st_path_stats(path: Column) -> Column:
    """(open-polyline length, vertex count) for a packed path — UDF twin
    of the Column ``st_measures.st_perimeter`` fold for paths that were
    PRODUCED by a Python UDF (HOF folds cannot wrap a UDF result in
    Spark 4.1, same constraint as ``st_ring_stats``)."""
    return _path_stats_udf(path)


# --- validity / MBC / symmetric difference (constructor tier) ----------------


@F.pandas_udf(BooleanType())
def _is_valid_udf(ring: pd.Series) -> pd.Series:
    out = []
    for r in ring:
        out.append(bool(kernels.ring_is_simple(np.asarray(r, dtype=np.float64))))
    return pd.Series(out)


def st_is_valid(ring: Column) -> Column:
    """ST_IsValid for a single-ring polygon shell: SIMPLE ring test (no
    self-intersection, no repeated vertices; JTS IsValidOp shell tier)."""
    return _is_valid_udf(ring)


_MBC_TYPE = StructType(
    [
        StructField("cx", DoubleType()),
        StructField("cy", DoubleType()),
        StructField("radius", DoubleType()),
    ]
)


@F.pandas_udf(_MBC_TYPE)
def _mbc_udf(pts: pd.Series) -> pd.DataFrame:
    xs, ys, rs = [], [], []
    for p in pts:
        cx, cy, r = kernels.min_bounding_circle(np.asarray(p, dtype=np.float64))
        xs.append(cx)
        ys.append(cy)
        rs.append(r)
    return pd.DataFrame({"cx": xs, "cy": ys, "radius": rs})


def st_minimum_bounding_circle(pts: Column) -> Column:
    """ST_MinimumBoundingCircle / ST_MinimumBoundingRadius: struct(cx, cy,
    radius) of the exact smallest enclosing circle (Welzl)."""
    return _mbc_udf(pts)


def st_sym_difference(a: Column, b: Column) -> Column:
    """ST_SymDifference as a disjoint tiling: pieces of a\\b plus pieces of
    b\\a (both via the convex half-plane decomposition — each ring must be
    convex for the side it clips). MultiPolygon parts list."""
    return F.concat(_difference_udf(a, b), _difference_udf(b, a))


# --- GENERAL (concave-capable) overlay: triangulate + convex piece algebra --


def _pieces_udf_factory(kernel_fn):
    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ra, rb in zip(a, b):
            out.append([
                p.ravel()
                for p in kernel_fn(
                    np.asarray(ra, dtype=np.float64),
                    np.asarray(rb, dtype=np.float64),
                )
            ])
        return pd.Series(out)

    return _udf


_clip_general_udf = _pieces_udf_factory(kernels.clip_general)
_difference_general_udf = _pieces_udf_factory(kernels.difference_general)
_union_general_udf = _pieces_udf_factory(kernels.union_general)


def st_intersection_general(a: Column, b: Column) -> Column:
    """ST_Intersection for ARBITRARY simple rings (concave×concave) as an
    exact disjoint tiling (ear-clip triangulation + convex×convex clips;
    JTS OverlayNG parity on area/coverage, MultiPolygon-parts output)."""
    return _clip_general_udf(a, b)


def st_difference_general(a: Column, b: Column) -> Column:
    """ST_Difference for ARBITRARY simple rings as an exact disjoint
    tiling."""
    return _difference_general_udf(a, b)


def st_union_general(a: Column, b: Column) -> Column:
    """ST_Union for ARBITRARY simple rings as an exact disjoint tiling."""
    return _union_general_udf(a, b)


def _dissolved_udf_factory(kernel_fn):
    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ra, rb in zip(a, b):
            pieces = kernel_fn(
                np.asarray(ra, dtype=np.float64),
                np.asarray(rb, dtype=np.float64),
            )
            out.append([r.ravel() for r in kernels.dissolve_tiles(pieces)])
        return pd.Series(out)

    return _udf


_difference_poly_udf = _dissolved_udf_factory(kernels.difference_general)
_union_poly_udf = _dissolved_udf_factory(kernels.union_general)
_intersection_poly_udf = _dissolved_udf_factory(kernels.clip_general)


def st_difference_poly(a: Column, b: Column) -> Column:
    """ST_Difference returning the CANONICAL polygon form (VERDICT r3 #9):
    the exact disjoint tiling of a \\ b dissolved into boundary rings —
    shells CCW, holes CW (``kernels.dissolve_tiles``) — so a clip strictly
    inside the subject yields the polygon WITH its hole, matching the JTS
    OverlayNG output shape instead of a tile list. Feeds st_rings_stats /
    st_rings_as_wkt directly."""
    return _difference_poly_udf(a, b)


def st_union_poly(a: Column, b: Column) -> Column:
    """ST_Union in canonical polygon form (dissolved boundary rings)."""
    return _union_poly_udf(a, b)


def st_intersection_poly(a: Column, b: Column) -> Column:
    """ST_Intersection in canonical polygon form (dissolved rings)."""
    return _intersection_poly_udf(a, b)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _triangulate_udf(ring: pd.Series) -> pd.Series:
    out = []
    for r in ring:
        out.append([
            t.ravel()
            for t in kernels.triangulate(np.asarray(r, dtype=np.float64))
        ])
    return pd.Series(out)


def st_triangulate(ring: Column) -> Column:
    """ST_Triangulate generator (JTS polygon triangulation; cf. the
    reference's ST_SubDivide/Delaunay generator family): ear-clipping
    triangles of a simple ring — always n−2 triangles, exact area
    tiling. Pair with ``posexplode``."""
    return _triangulate_udf(ring)


# --- distance geometry: ST_ShortestLine / ST_MaxDistance ---------------------


_SHORTLINE_TYPE = StructType(
    [
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("y2", DoubleType()),
        StructField("dist", DoubleType()),
    ]
)


@F.pandas_udf(_SHORTLINE_TYPE)
def _shortest_line_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    rows = []
    for ra, rb in zip(a, b):
        rows.append(
            kernels.polygon_shortest_line(
                np.asarray(ra, dtype=np.float64), np.asarray(rb, dtype=np.float64)
            )
        )
    return pd.DataFrame(rows, columns=["x1", "y1", "x2", "y2", "dist"])


def st_shortest_line(a: Column, b: Column) -> Column:
    """ST_ShortestLine + ST_Distance(poly, poly): struct(x1, y1, x2, y2,
    dist) — nearest boundary points of two rings (JTS DistanceOp)."""
    return _shortest_line_udf(a, b)


@F.pandas_udf(DoubleType())
def _max_distance_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for ra, rb in zip(a, b):
        out.append(
            kernels.polygon_max_distance(
                np.asarray(ra, dtype=np.float64), np.asarray(rb, dtype=np.float64)
            )
        )
    return pd.Series(out)


def st_max_distance(a: Column, b: Column) -> Column:
    """ST_MaxDistance / ST_LongestLine length between two rings."""
    return _max_distance_udf(a, b)


# --- affine family (ST_Affine / Translate / Scale / Rotate) ------------------
# Pure Column: gather x/y by index parity — stays in whole-stage codegen.


def _aff_c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


def st_affine(ring: Column, a, b, c, d, ex=0.0, ey=0.0) -> Column:
    """ST_Affine on a packed ring: (x, y) → (a·x + b·y + ex, c·x + d·y +
    ey). Coefficients may be floats or per-row Columns. Pure Column
    (transform + index gather), no Python."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 1)
    a, b, c, d, ex, ey = (_aff_c(v) for v in (a, b, c, d, ex, ey))

    def comp(i):
        x = F.get(ring, (i / 2).cast("int") * 2)
        y = F.get(ring, (i / 2).cast("int") * 2 + 1)
        return F.when(i % 2 == 0, a * x + b * y + ex).otherwise(c * x + d * y + ey)

    return F.transform(idx, comp)


def st_translate(ring: Column, dx, dy) -> Column:
    """ST_Translate."""
    return st_affine(ring, 1.0, 0.0, 0.0, 1.0, dx, dy)


def st_scale(ring: Column, sx, sy) -> Column:
    """ST_Scale about the origin."""
    return st_affine(ring, sx, 0.0, 0.0, sy)


def st_rotate(ring: Column, theta: float) -> Column:
    """ST_Rotate about the origin by ``theta`` radians (CCW)."""
    import math as _m

    ct, st_ = _m.cos(theta), _m.sin(theta)
    return st_affine(ring, ct, -st_, st_, ct)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _voronoi_udf(sites: pd.Series, env: pd.Series) -> pd.Series:
    out = []
    for s, e in zip(sites, env):
        out.append([
            c.ravel()
            for c in kernels.voronoi_cells(
                np.asarray(s, dtype=np.float64), np.asarray(e, dtype=np.float64)
            )
        ])
    return pd.Series(out)


def st_voronoi_polygons(sites: Column, envelope: Column) -> Column:
    """ST_VoronoiPolygons (JTS VoronoiDiagramBuilder): envelope-clipped
    Voronoi cell rings, one per site IN SITE ORDER (pair with
    ``posexplode`` to keep the site index). Cells tile the envelope
    exactly."""
    return _voronoi_udf(sites, envelope)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _delaunay_udf(pts: pd.Series) -> pd.Series:
    out = []
    for p in pts:
        out.append([
            t.ravel()
            for t in kernels.delaunay_triangles(np.asarray(p, dtype=np.float64))
        ])
    return pd.Series(out)


def st_delaunay_triangles(pts: Column) -> Column:
    """ST_DelaunayTriangles (JTS DelaunayTriangulationBuilder): CCW
    triangles tiling the convex hull of a packed point set (Bowyer–Watson
    with exact infinite-vertex boundary tests). Pair with ``posexplode``."""
    return _delaunay_udf(pts)


@F.pandas_udf(ArrayType(DoubleType()))
def _concave_hull_udf(pts: pd.Series, ratio: pd.Series) -> pd.Series:
    out = []
    for p, r in zip(pts, ratio):
        out.append(
            kernels.concave_hull(np.asarray(p, dtype=np.float64), float(r))
        )
    return pd.Series(out)


def st_concave_hull(pts: Column, length_ratio: float = 1.5) -> Column:
    """ST_ConcaveHull (χ-shape over Delaunay, the JTS ConcaveHull
    construction): packed boundary ring of the point set with boundary
    edges longer than ``length_ratio``×mean-edge eroded (regularity
    preserved — always a simple polygon containing every point)."""
    return _concave_hull_udf(pts, F.lit(float(length_ratio)))


_MEDIAN_TYPE = StructType(
    [StructField("mx", DoubleType()), StructField("my", DoubleType())]
)


@F.pandas_udf(_MEDIAN_TYPE)
def _geometric_median_udf(pts: pd.Series) -> pd.DataFrame:
    xs, ys = [], []
    for p in pts:
        mx, my = kernels.geometric_median(np.asarray(p, dtype=np.float64))
        xs.append(mx)
        ys.append(my)
    return pd.DataFrame({"mx": xs, "my": ys})


def st_geometric_median(pts: Column) -> Column:
    """ST_GeometricMedian (Weiszfeld): struct(mx, my) minimizing total
    distance to the packed point set."""
    return _geometric_median_udf(pts)


@F.pandas_udf(ArrayType(DoubleType()))
def _segmentize_udf(line: pd.Series, max_len: pd.Series) -> pd.Series:
    out = []
    for ln, m in zip(line, max_len):
        out.append(
            kernels.segmentize(np.asarray(ln, dtype=np.float64), float(m))
        )
    return pd.Series(out)


def st_segmentize(line: Column, max_len) -> Column:
    """ST_Segmentize: densify so no segment exceeds ``max_len``."""
    max_len = max_len if isinstance(max_len, Column) else F.lit(float(max_len))
    return _segmentize_udf(line, max_len)


# --- r5 catalog-tail additions: proximity max / geohash decode ---------------


_LONGLINE_TYPE = StructType(
    [
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("y2", DoubleType()),
        StructField("dist", DoubleType()),
    ]
)


@F.pandas_udf(_LONGLINE_TYPE)
def _longest_line_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """ST_LongestLine / ST_MaxDistance: the farthest vertex pair of two
    packed rings. Exact — the maximum of the distance function over two
    polygon boundaries is attained at a vertex of each (the boundary is a
    union of segments, and point-to-segment distance is maximized at a
    segment endpoint). O(n·m) vertex-pair scan per pair, vectorized.
    Reference: ``Functions.java`` ST_MaxDistance / ST_LongestLine (JTS)."""
    rows = []
    for pa, pb in zip(a, b):
        va = np.asarray(pa, dtype=np.float64).reshape(-1, 2)
        vb = np.asarray(pb, dtype=np.float64).reshape(-1, 2)
        d2 = ((va[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2)
        i, j = np.unravel_index(int(np.argmax(d2)), d2.shape)
        rows.append((va[i, 0], va[i, 1], vb[j, 0], vb[j, 1],
                     float(np.sqrt(d2[i, j]))))
    return pd.DataFrame(rows, columns=["x1", "y1", "x2", "y2", "dist"])


def st_longest_line(a: Column, b: Column) -> Column:
    """ST_LongestLine: struct(x1, y1, x2, y2, dist) — the farthest
    boundary-vertex pair; ``.dist`` is ST_MaxDistance."""
    return _longest_line_udf(a, b)


@F.pandas_udf(ArrayType(DoubleType()))
def _geohash_ring_udf(h: pd.Series) -> pd.Series:
    from sedona_spark.functions.geohash import geohash_bbox_ring

    return geohash_bbox_ring(h)


@F.pandas_udf(ArrayType(DoubleType()))
def _geohash_point_udf(h: pd.Series) -> pd.Series:
    from sedona_spark.functions.geohash import geohash_center

    return geohash_center(h)


def st_geom_from_geohash(h: Column) -> Column:
    """ST_GeomFromGeoHash: the cell bbox of a geohash as a packed CCW
    rect ring (inverse of ST_GeoHash; ``Functions.java`` via
    ``GeoHashDecoder``)."""
    return _geohash_ring_udf(h)


def st_point_from_geohash(h: Column) -> Column:
    """ST_PointFromGeoHash: the cell center [lon, lat]."""
    return _geohash_point_udf(h)


@F.pandas_udf(IntegerType())
def _srid_udf(ring: pd.Series) -> pd.Series:
    """ST_SRID: the column model carries one CRS — EPSG:4326 lon/lat
    (reference default behavior; transforms are the explicit
    ST_Transform* family). Arrow UDF because the name is a Spark 4.1
    native-preview builtin only this path may replace."""
    return pd.Series(np.full(len(ring), 4326, dtype=np.int32))


@F.pandas_udf(ArrayType(DoubleType()))
def _set_srid_udf(ring: pd.Series, srid: pd.Series) -> pd.Series:
    """ST_SetSRID: identity on the single-CRS ring model (the SRID tag
    lives in the writer sidecars, e.g. GeoParquet metadata)."""
    return ring


# --- r5 shape-metric tier (Catalog.scala: ST_OrientedEnvelope /
# ST_MinimumClearance(Line) / ST_SimplifyVW / ST_LabelPoint /
# ST_PointOnSurface / ST_MaximumInscribedCircle / ST_IsValidReason /
# ST_GeneratePoints — JTS-backed in the reference, numpy kernels here) ----


_OENV_TYPE = StructType(
    [
        StructField("ring", ArrayType(DoubleType())),
        StructField("width", DoubleType()),
        StructField("height", DoubleType()),
        StructField("area", DoubleType()),
    ]
)


@F.pandas_udf(_OENV_TYPE)
def _oriented_envelope_udf(ring: pd.Series) -> pd.DataFrame:
    rows = []
    for r in ring:
        rg, w, h, a = kernels.oriented_envelope(
            np.asarray(r, dtype=np.float64).reshape(-1, 2)
        )
        rows.append((list(rg), w, h, a))
    return pd.DataFrame(rows, columns=["ring", "width", "height", "area"])


def st_oriented_envelope(ring: Column) -> Column:
    """ST_OrientedEnvelope: struct(ring, width, height, area) — the
    minimum-area rotated rectangle (rotating calipers)."""
    return _oriented_envelope_udf(ring)


_CLEAR_TYPE = StructType(
    [
        StructField("dist", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("y2", DoubleType()),
    ]
)


@F.pandas_udf(_CLEAR_TYPE)
def _min_clearance_udf(ring: pd.Series) -> pd.DataFrame:
    rows = [kernels.minimum_clearance(np.asarray(r, dtype=np.float64))
            for r in ring]
    return pd.DataFrame(rows, columns=["dist", "x1", "y1", "x2", "y2"])


def st_minimum_clearance(ring: Column) -> Column:
    """ST_MinimumClearance: ``.dist`` is the clearance;
    (x1,y1)-(x2,y2) is ST_MinimumClearanceLine."""
    return _min_clearance_udf(ring)


@F.pandas_udf(ArrayType(DoubleType()))
def _simplify_vw_udf(ring: pd.Series, min_area: pd.Series) -> pd.Series:
    return pd.Series([
        kernels.simplify_vw(np.asarray(r, dtype=np.float64),
                            float(a)).ravel().tolist()
        for r, a in zip(ring, min_area)
    ])


def st_simplify_vw(ring: Column, min_area) -> Column:
    """ST_SimplifyVW: Visvalingam–Whyatt with an effective-area floor."""
    min_area = (min_area if isinstance(min_area, Column)
                else F.lit(float(min_area)))
    return _simplify_vw_udf(ring, min_area)


_MIC_TYPE = StructType(
    [
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("radius", DoubleType()),
    ]
)


@F.pandas_udf(_MIC_TYPE)
def _polylabel_udf(g: pd.Series) -> pd.DataFrame:
    rows = []
    for rl in g:
        x, y, d = kernels.polylabel(
            [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rl]
        )
        rows.append((x, y, d))
    return pd.DataFrame(rows, columns=["x", "y", "radius"])


def st_maximum_inscribed_circle(g: Column) -> Column:
    """ST_MaximumInscribedCircle over a ring list: struct(x, y, radius).
    (x, y) doubles as ST_LabelPoint / a guaranteed-interior
    ST_PointOnSurface."""
    return _polylabel_udf(g)


@F.pandas_udf(StringType())
def _is_valid_reason_udf(ring: pd.Series) -> pd.Series:
    out = []
    for r in ring:
        w = kernels.self_intersection_witness(
            np.asarray(r, dtype=np.float64)
        )
        if w is None:
            out.append("Valid Geometry")
        else:
            out.append(f"Self-intersection at or near ({w[0]:.10g} "
                       f"{w[1]:.10g})")
    return pd.Series(out)


def st_is_valid_reason(ring: Column) -> Column:
    """ST_IsValidReason: 'Valid Geometry' or the JTS-style
    self-intersection message with the witness coordinate."""
    return _is_valid_reason_udf(ring)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _generate_points_udf(
    g: pd.Series, n: pd.Series, seed: pd.Series
) -> pd.Series:
    out = []
    for rl, k, s in zip(g, n, seed):
        pts = kernels.generate_points_in_rings(
            [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rl],
            int(k), int(s),
        )
        out.append([list(p) for p in pts])
    return pd.Series(out)


def st_generate_points(g: Column, n, seed) -> Column:
    """ST_GeneratePoints with a deterministic seed: integer-lattice
    candidates over the shell bbox, PIP-rejected — reproducible across
    partitions and engines."""
    n = n if isinstance(n, Column) else F.lit(int(n))
    seed = seed if isinstance(seed, Column) else F.lit(int(seed))
    return _generate_points_udf(g, n, seed)


# --- GML / KML markup tier (Catalog.scala ST_AsGML/AsKML/GeomFromGML/
# GeomFromKML; geometry/markup.py does the string work) ----------------------


@F.pandas_udf(StringType())
def _as_gml_udf(g: pd.Series) -> pd.Series:
    from sedona_spark.geometry import markup

    return pd.Series([
        None if rl is None else markup.rings_to_gml(
            [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rl]
        )
        for rl in g
    ])


@F.pandas_udf(StringType())
def _as_kml_udf(g: pd.Series) -> pd.Series:
    from sedona_spark.geometry import markup

    return pd.Series([
        None if rl is None else markup.rings_to_kml(
            [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rl]
        )
        for rl in g
    ])


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _from_markup_udf(s: pd.Series) -> pd.Series:
    from sedona_spark.geometry import markup

    return pd.Series([
        None if t is None
        else [r.ravel() for r in markup.parse_markup_rings(t)]
        for t in s
    ])


def st_as_gml(g: Column) -> Column:
    """ST_AsGML: GML2 Polygon markup (JTS GMLWriter layout)."""
    return _as_gml_udf(g)


def st_as_kml(g: Column) -> Column:
    """ST_AsKML: KML 2.2 Polygon markup."""
    return _as_kml_udf(g)


def st_geom_from_markup(s: Column) -> Column:
    """ST_GeomFromGML / ST_GeomFromKML: one parser accepts GML2
    ``coordinates``, GML3 ``posList``, and KML Polygon markup."""
    return _from_markup_udf(s)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _skeleton_udf(ring: pd.Series) -> pd.Series:
    """ST_StraightSkeleton / ST_ApproximateMedialAxis (convex subset —
    identical for convex input; reference delegates the general case to
    SFCGAL): array of skeleton segments (x1, y1, x2, y2) per ring.
    See ``kernels.straight_skeleton``."""
    out = []
    for r in ring:
        segs = kernels.straight_skeleton(np.asarray(r, dtype=np.float64))
        out.append([s for s in segs])
    return pd.Series(out)


def st_straight_skeleton(ring: Column) -> Column:
    """Exact straight skeleton of a convex polygon ring (== its medial
    axis). Reference: Catalog.scala ST_StraightSkeleton /
    ST_ApproximateMedialAxis (SFCGAL-backed there)."""
    return _skeleton_udf(ring)


@F.pandas_udf(ArrayType(DoubleType()))
def _simplify_hull_udf(
    ring: pd.Series, frac: pd.Series, outer: pd.Series
) -> pd.Series:
    """ST_SimplifyPolygonHull (JTS PolygonHullSimplifier): outer hull
    fills reflex vertices (result contains input), inner hull cuts convex
    vertices (result contained by input); smallest-triangle-first with a
    boundary-crossing guard. See ``kernels.simplify_polygon_hull``."""
    out = []
    for r, f, o in zip(ring, frac, outer):
        res = kernels.simplify_polygon_hull(
            np.asarray(r, dtype=np.float64), float(f), bool(o)
        )
        out.append(res.ravel())
    return pd.Series(out)


@F.pandas_udf(ArrayType(StringType()))
def _geohash_neighbors_udf(
    lon: pd.Series, lat: pd.Series, precision: pd.Series
) -> pd.Series:
    """ST_GeoHashNeighbors: sorted 8-neighborhood of the point's geohash
    cell (lon wraps, lat clamps) at a RUNTIME precision — numpy twin of
    the Column k-ring in functions/geohash.py."""
    from sedona_spark.functions.geohash import np_geohash_neighbors

    out = []
    # group by precision so the bit layout is computed once per value
    import numpy as _np

    lon_a = lon.to_numpy()
    lat_a = lat.to_numpy()
    prec_a = precision.to_numpy()
    res: list[list[str] | None] = [None] * len(lon_a)
    for p in _np.unique(prec_a):
        ix = _np.flatnonzero(prec_a == p)
        vals = np_geohash_neighbors(lon_a[ix], lat_a[ix], int(p))
        for j, v in zip(ix, vals):
            res[j] = v
    out = res
    return pd.Series(out)
